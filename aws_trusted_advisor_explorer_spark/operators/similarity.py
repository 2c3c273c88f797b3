"""Similarity search over the ``embeddings`` table (extension scope
per BASELINE.json): brute-force cosine top-k as the exact baseline and
a sign-LSH (random hyperplane) bucketed variant as the scale path.

Dual-dialect SQL (functions/dual.py). Cosine uses the fixed-order
fold, so Spark and the DuckDB oracle produce bit-identical doubles and
therefore identical rankings.

Scale posture (100 TB): the query set is small relative to the corpus
-> in Spark the brute-force plan is a broadcast nested-loop of queries
against a single scan of the corpus (no shuffle of the big side); the
LSH variant turns that into an equi-join on the bucket id, pruning the
corpus to one bucket per query. The hyperplanes are derived from pure
integer arithmetic (functions/dual.hyperplane_weight) so both engines
— and every executor, with no broadcast of plane data — agree on them.
"""

from __future__ import annotations

from aws_trusted_advisor_explorer_spark.functions.dual import (
    Dialect, hyperplane_weight,
)

TOP_K = 3
QUERY_MOD = 100  # vec_id % 100 == 0 -> query set (~1% of vectors)
N_PLANES = 8
DIM = 64


def _norm(d: Dialect) -> str:
    return f"sqrt({d.dot('embedding', 'embedding')})"


def knn_bruteforce(d: Dialect) -> str:
    """Exact top-k: query set x corpus cosine (norms precomputed per
    vector), row_number ranking with a deterministic
    (cosine DESC, neighbor id ASC) tiebreak."""
    cos = f"{d.dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)"
    return f"""WITH v AS (SELECT vec_id, embedding, {_norm(d)} AS nrm FROM embeddings),
q AS (SELECT vec_id, embedding, nrm FROM v WHERE vec_id % {QUERY_MOD} = 0),
c AS (SELECT vec_id, embedding, nrm FROM v WHERE vec_id % {QUERY_MOD} <> 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    {cos} AS cosine
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {TOP_K}"""


def _bucket_expr(d: Dialect, emb: str) -> str:
    """Sign-LSH bucket id: bit j = (dot(v, plane_j) > 0)."""
    bits = []
    for j in range(N_PLANES):
        # dot with the deterministic plane: fold over the dimension index
        idx_dot = d.fold(
            d.transform(
                ("sequence(1, " + str(DIM) + ")") if d.name == "spark"
                else f"range(1, {DIM + 1})",
                "i",
                f"cast({d.elem(emb, 'i')} as double) * {hyperplane_weight(j, 'i')}"),
            "cast(0 as double)", "s", "v", "s + v")
        bits.append(f"(CASE WHEN {idx_dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def knn_lsh(d: Dialect) -> str:
    """ANN top-k: candidates restricted to the query's sign-LSH bucket
    (equi-join on bucket id), then exact cosine rank within the bucket.
    May return fewer than k (or zero) neighbors for sparse buckets —
    the accepted ANN recall trade; identical in both engines."""
    cos = f"{d.dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)"
    bucket = _bucket_expr(d, "embedding")
    return f"""WITH h AS (SELECT vec_id, embedding, {_norm(d)} AS nrm,
  {bucket} AS bucket FROM embeddings),
q AS (SELECT vec_id, embedding, nrm, bucket FROM h WHERE vec_id % {QUERY_MOD} = 0),
c AS (SELECT vec_id, embedding, nrm, bucket FROM h WHERE vec_id % {QUERY_MOD} <> 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    {cos} AS cosine
  FROM q JOIN c ON q.bucket = c.bucket
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {TOP_K}"""


BUILDERS = {
    "knn_bruteforce": knn_bruteforce,
    "knn_lsh": knn_lsh,
}
