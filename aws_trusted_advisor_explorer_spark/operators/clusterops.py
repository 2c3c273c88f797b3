"""Embedding clustering (extension scope per BASELINE.json): KMeans
over the ``embeddings`` table as pure dual-dialect SQL — the trainer
for a learned-centroid IVF index (operators/similarity.py ships the
sign-LSH-bucketed IVF; a KMeans codebook is the classic upgrade), and
a corpus-organization primitive in its own right (topic-ish sharding,
coarse blocking for embedding dedup).

Cross-engine exactness strategy (the hard part — double SUMS are
order-dependent, so a naive avg()/sum() would hash-differ between
Spark and DuckDB):

- distances and centroid sums accumulate in INTEGER space: each double
  term is scaled and rounded to a bigint ONCE (deterministic given
  identical IEEE inputs), then summed exactly — addition order can't
  change an integer sum;
- centroid coordinates come back to double via a single bigint→double
  cast and one division — each a deterministic IEEE op;
- squared-L2 terms ``(v-c)^2`` are per-element products of identical
  doubles, so their bits match before the scale-and-round.

Assignment ties (equidistant centroids) break on centroid id, so the
labeling is fully deterministic.

Iteration count is UNROLLED (KMEANS_ITERS stages of assign→update
CTEs) rather than looped: at 2–3 iterations the SQL stays readable,
the whole plan is one Catalyst job, and the DuckDB oracle is the same
template. A production run that needs convergence loops the assign/
update pair imperatively like operators/dedup.dedup_clusters_df does
for label propagation — same per-round plan, driver-side stopping
rule.

Scale posture (100 TB): ``elems`` is a zero-shuffle projection
(posexplode of each row's own array); each assign stage joins elems to
a K×DIM centroid relation — a few-KB dimension, broadcast — and
aggregates (vec_id, cid) partials map-side; each update stage is one
hash aggregate on (cid, pos), K×DIM output rows. Nothing quadratic,
no window over data (the per-vec argmin row_number partitions on
vec_id). At 1000 executors the only exchange is the (vec_id, cid)
partial-agg combine.
"""

from __future__ import annotations

from aws_trusted_advisor_explorer_spark.functions.dual import Dialect

KMEANS_K = 8
KMEANS_DIM = 64        # embeddings.embedding is fixed 64-dim (TESTDATA.md)
KMEANS_ITERS = 2
_ESCALE = 1_000_000_000          # element scale: val * 1e9 -> bigint
_DSCALE = 1_000_000_000_000      # distance-term scale: (v-c)^2 * 1e12


def _assign(elems: str, cents: str, out_prefix: str) -> tuple[str, str]:
    """(assign, argmin) CTE pair: scaled-integer squared-L2 per
    (vec, centroid), then the deterministic per-vec argmin."""
    a, m = f"{out_prefix}a", f"{out_prefix}m"
    assign = f"""{a} AS (
  SELECT e.vec_id, c.cid,
    cast(sum(cast(round((e.val - c.val) * (e.val - c.val) * {_DSCALE})
                  as bigint)) as bigint) AS dist
  FROM {elems} e JOIN {cents} c ON c.pos = e.pos
  GROUP BY e.vec_id, c.cid
)"""
    argmin = f"""{m} AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM {a}
  ) r WHERE rk = 1
)"""
    return assign, argmin


def _update(elems: str, members: str, out: str) -> str:
    """Centroid update CTE: per-(cid, pos) exact integer mean, one
    bigint→double cast + one division back to coordinate space."""
    return f"""{out} AS (
  SELECT m.cid, e.pos,
    cast(cast(sum(cast(round(e.val * {_ESCALE}) as bigint)) as bigint)
         as double) / (cast(count(*) as bigint) * {_ESCALE}) AS val
  FROM {elems} e JOIN {members} m ON m.vec_id = e.vec_id
  GROUP BY m.cid, e.pos
)"""


def kmeans_assign(d: Dialect) -> str:
    """KMeans cluster assignment after KMEANS_ITERS unrolled Lloyd
    iterations, K = KMEANS_K, init = the K lowest vec_ids (simple and
    deterministic; KMeans|| is the production init, orthogonal to the
    per-iteration plan shape this operator demonstrates). Output one
    row per vector: (vec_id, cluster_id, dist_scaled) where
    dist_scaled is the integer-scaled squared L2 to the final winning
    centroid (scale 1e12)."""
    seq = (f"sequence(1, {KMEANS_DIM})" if d.name == "spark"
           else f"range(1, {KMEANS_DIM} + 1)")
    parts = [f"""dims AS (SELECT {d.explode(seq)} AS pos),
elems AS (
  SELECT vec_id, pos, cast({d.elem('embedding', 'pos')} as double) AS val
  FROM embeddings CROSS JOIN dims
),
c0 AS (SELECT vec_id AS cid, pos, val FROM elems WHERE vec_id < {KMEANS_K})"""]
    cents = "c0"
    members = None
    for i in range(1, KMEANS_ITERS + 1):
        assign, argmin = _assign("elems", cents, f"i{i}")
        parts += [assign, argmin]
        members = f"i{i}m"
        if i < KMEANS_ITERS:
            cents = f"c{i}"
            parts.append(_update("elems", members, cents))
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT vec_id, cid AS cluster_id, dist AS dist_scaled
FROM {members}"""


def kmeans_report(d: Dialect) -> str:
    """Clustering acceptance report over :func:`kmeans_assign`:
    per-cluster population and mean squared-L2 (double mean of exact
    integer sums — deterministic) plus the spread between the nearest
    and farthest member. This is what you check before shipping the
    codebook as an IVF index (empty/lopsided clusters, fat tails)."""
    base = kmeans_assign(d)
    return f"""WITH asg AS (
{base}
)
SELECT cluster_id,
  cast(count(*) as bigint) AS n_vecs,
  cast(sum(dist_scaled) as bigint) / cast(count(*) as bigint)
    AS mean_dist_scaled,
  min(dist_scaled) AS min_dist_scaled,
  max(dist_scaled) AS max_dist_scaled
FROM asg GROUP BY cluster_id"""


COSINE_SEM_THRESHOLD = 0.4   # == dedup.COSINE_DUP_THRESHOLD (same corpus)
IVF_TOP_K = 3
IVF_QUERY_MOD = 100          # == similarity.QUERY_MOD


def _member_cte(d: Dialect) -> str:
    """CTE suffix joining the final KMeans assignment back to the raw
    vectors with a precomputed L2 norm: ``mv(vec_id, cluster_id,
    embedding, nrm)``. Reuses :func:`kmeans_assign` verbatim as the
    assignment subquery so every consumer sees the identical
    deterministic labeling."""
    base = kmeans_assign(d)
    norm = f"sqrt({d.dot('embedding', 'embedding')})"
    return f"""asg AS (
{base}
),
mv AS (
  SELECT a.vec_id, a.cluster_id, e.embedding, {norm} AS nrm
  FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id
)"""


def semdedup_pairs(d: Dialect) -> str:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pairs found by clustering first and comparing
    cosines ONLY within a cluster — the published fix for embedding
    dedup's quadratic blow-up. Pairs with cosine >=
    COSINE_SEM_THRESHOLD, deterministic (cluster, vec_a < vec_b) order.

    vs operators/dedup.dedup_embedding_cosine (label-blocked): the
    block key here is LEARNED (the KMeans codebook), so it needs no
    metadata column and the blocks track the actual embedding
    geometry — this is the shape you run when labels don't exist.

    Scale posture (100 TB): the pair join is an equi-join on
    cluster_id, so candidate count is Σ|c|² over clusters, never N².
    In production K grows with N (K ≈ N/5k keeps clusters ~constant
    size), the codebook is trained on a sample, and assignment is one
    broadcast-join pass — exactly the kmeans_assign plan. Hot/lopsided
    clusters (the skew risk) are visible in kmeans_report before the
    pair join runs; AQE skew-split handles the residue."""
    cos = f"{d.dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)"
    return f"""WITH {_member_cte(d)}
SELECT a.cluster_id,
  a.vec_id AS vec_a, b.vec_id AS vec_b,
  {cos} AS cosine
FROM mv a JOIN mv b
  ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
WHERE {cos} >= {COSINE_SEM_THRESHOLD}"""


def semdedup_prune_report(d: Dialect) -> str:
    """SemDeDup pruning outcome per cluster: keep the LOWEST vec_id of
    every above-threshold pair (a vector is dropped iff some
    lower-id cluster-mate sits within the cosine threshold — the
    deterministic one-pass rule; transitive chains collapse to their
    minimum). Output (cluster_id, n_vecs, n_dropped, n_kept) — the
    acceptance report before shipping the pruned corpus."""
    pairs = semdedup_pairs(d)
    return f"""WITH pr AS (
{pairs}
),
drops AS (SELECT DISTINCT vec_b AS vec_id FROM pr),
base AS (
  SELECT a.cluster_id, a.vec_id,
    CASE WHEN dr.vec_id IS NULL THEN 0 ELSE 1 END AS dropped
  FROM ({kmeans_assign(d)}) a
  LEFT JOIN drops dr ON dr.vec_id = a.vec_id
)
SELECT cluster_id,
  cast(count(*) as bigint) AS n_vecs,
  cast(sum(dropped) as bigint) AS n_dropped,
  cast(count(*) - sum(dropped) as bigint) AS n_kept
FROM base GROUP BY cluster_id"""


def knn_ivf_kmeans(d: Dialect) -> str:
    """IVF top-k with a LEARNED coarse quantizer: the KMeans codebook
    (kmeans_assign) replaces similarity.knn_ivf's sign-LSH planes as
    the partitioner — the FAISS IVFFlat shape. Queries (vec_id %
    IVF_QUERY_MOD = 0) probe exactly their own cell; candidates are
    the co-assigned corpus vectors; exact cosine rank within the cell.

    Scale posture (100 TB): identical to similarity.knn_ivf_df's
    partition-pruned layout — write the corpus partitioned BY
    cluster_id and a probe touches 1/K of the data; the codebook
    (K×DIM doubles) broadcasts everywhere. Learned cells track data
    density, so cell populations are far more even than hash buckets
    on clustered data — better tail latency than LSH at equal K."""
    cos = f"{d.dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)"
    return f"""WITH {_member_cte(d)},
q AS (SELECT * FROM mv WHERE vec_id % {IVF_QUERY_MOD} = 0),
c AS (SELECT * FROM mv WHERE vec_id % {IVF_QUERY_MOD} <> 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM q JOIN c ON q.cluster_id = c.cluster_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {IVF_TOP_K}"""


BUILDERS = {
    "kmeans_assign": kmeans_assign,
    "kmeans_report": kmeans_report,
    "semdedup_pairs": semdedup_pairs,
    "semdedup_prune_report": semdedup_prune_report,
    "knn_ivf_kmeans": knn_ivf_kmeans,
}
