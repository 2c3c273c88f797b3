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


BUILDERS = {
    "kmeans_assign": kmeans_assign,
    "kmeans_report": kmeans_report,
}
