"""Deduplication operators over ``documents`` / ``embeddings``
(extension scope per BASELINE.json): exact, MinHash+LSH, SimHash,
n-gram Jaccard, and embedding-cosine near-dup.

All dual-dialect SQL (functions/dual.py) — the Spark plan and the
DuckDB oracle are the same template, and every hash is the
cross-engine polynomial hash, so candidate sets match bit-for-bit.

Scale posture (100 TB): the only quadratic danger is pair generation.
- exact dedup: hash-shuffle on the text key — linear.
- MinHash: explode shingles (shuffle by doc), 16-perm signature in ONE
  groupBy (map-side partial agg), then the band equi-join — the LSH
  trick that replaces the O(n^2) all-pairs join; Jaccard is verified
  only on candidates.
- SimHash: one groupBy for the 32-bit signature, byte-band equi-join
  (4 bands) as the candidate filter, popcount verify.
- n-gram Jaccard: exact variant joins on shared shingles — correct but
  shuffle-heavy at scale; keep for oracle truth, use MinHash at 100 TB.
- embedding cosine: blocks on the ``label`` column (at scale: a coarse
  KMeans/LSH bucket id) before the pairwise cosine.
"""

from __future__ import annotations

from aws_trusted_advisor_explorer_spark.functions.dual import (
    Dialect, P_MOD, minhash_params,
)

N_PERM = 16
N_BANDS = 4  # 4 rows per band
# poly_hash values are < 1e9+7 (~30 bits), so the signature can only use
# the low bits — 28 bits, 4 bands of 7 (any hamming<=3 pair shares >=1 band)
SIMHASH_BITS = 28
SIMHASH_BAND_BITS = 7
SIMHASH_MAX_HAMMING = 3
JACCARD_THRESHOLD = 0.5
COSINE_DUP_THRESHOLD = 0.4


def _shingle_cte(d: Dialect) -> str:
    """Distinct 3-gram shingle hashes per doc: sh(doc_id, hv) + counts."""
    toks = d.tokens("text")
    shingles = d.shingles("toks", 3)
    return f"""WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
e AS (SELECT doc_id, {d.explode(shingles)} AS shingle FROM t),
sh AS (SELECT DISTINCT doc_id, {d.poly_hash('shingle')} AS hv FROM e),
nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""


def dedup_exact_groups(d: Dialect) -> str:
    """Exact duplicate groups (hash-groupBy on the raw text): one row
    per duplicated text, keeper = min doc_id. Dialect-invariant SQL."""
    return """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents
GROUP BY text
HAVING count(*) > 1"""


def dedup_exact_flags(d: Dialect) -> str:
    """Per-document exact-dup verdict via a window min — the streaming-
    friendly form (no second join back). Dialect-invariant SQL."""
    return """SELECT doc_id,
  CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY text) THEN 0 ELSE 1 END AS is_dup
FROM documents"""


def dedup_minhash_lsh(d: Dialect) -> str:
    """MinHash(16 perms) -> 4-band LSH candidate join -> exact Jaccard
    verify on candidates only. Output: (doc_a, doc_b, jaccard)."""
    params = minhash_params(N_PERM)
    mins = ",\n    ".join(
        f"min(({a} * hv + {b}) % {P_MOD}) AS m{j}"
        for j, (a, b) in enumerate(params))
    rows_per_band = N_PERM // N_BANDS
    band_selects = []
    for band in range(N_BANDS):
        cols = [f"cast(m{band * rows_per_band + r} as string)"
                for r in range(rows_per_band)]
        sig = "concat_ws(':', " + ", ".join(cols) + ")"
        band_selects.append(
            f"SELECT doc_id, {band} AS band, {sig} AS band_sig FROM mh")
    bands = "\nUNION ALL\n".join(band_selects)
    return f"""{_shingle_cte(d)},
mh AS (
  SELECT doc_id,
    {mins}
  FROM sh GROUP BY doc_id
),
bands AS (
{bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
common AS (
  SELECT c.ia, c.ib, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.ia
  JOIN sh b ON b.doc_id = c.ib AND b.hv = a.hv
  GROUP BY c.ia, c.ib
)
SELECT cm.ia AS doc_a, cm.ib AS doc_b,
  cast(cm.n_common as double) / (na.n + nb.n - cm.n_common) AS jaccard
FROM common cm
JOIN nsh na ON na.doc_id = cm.ia
JOIN nsh nb ON nb.doc_id = cm.ib
WHERE cast(cm.n_common as double) / (na.n + nb.n - cm.n_common) >= {JACCARD_THRESHOLD}"""


def dedup_ngram_jaccard(d: Dialect) -> str:
    """Exact n-gram Jaccard near-dup pairs via the shared-shingle join
    (ground truth for the MinHash variant; shuffle-heavy at 100 TB —
    see module doc)."""
    return f"""{_shingle_cte(d)},
common AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS n_common
  FROM sh a JOIN sh b ON a.hv = b.hv AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT cm.ia AS doc_a, cm.ib AS doc_b,
  cast(cm.n_common as double) / (na.n + nb.n - cm.n_common) AS jaccard
FROM common cm
JOIN nsh na ON na.doc_id = cm.ia
JOIN nsh nb ON nb.doc_id = cm.ib
WHERE cast(cm.n_common as double) / (na.n + nb.n - cm.n_common) >= {JACCARD_THRESHOLD}"""


def dedup_simhash(d: Dialect) -> str:
    """28-bit frequency-weighted SimHash (Charikar) over 3-gram shingle
    hashes — shingle weighting keeps the bits decorrelated where a
    small shared unigram vocabulary would collapse them. Candidates
    share at least one of 4 exact 7-bit bands (pigeonhole: any pair
    within hamming 3 shares a clean band); verify popcount(xor) <= 3.
    Output: (doc_a, doc_b, hamming)."""
    toks = d.tokens("text")
    shingles = d.shingles("toks", 3)
    bit_sums = ",\n    ".join(
        f"sum(CASE WHEN {d.bit('hv', i)} = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS))
    assemble = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN cast({1 << i} as bigint) ELSE 0 END)"
        for i in range(SIMHASH_BITS))
    mask = (1 << SIMHASH_BAND_BITS) - 1
    band_joins = "\nUNION ALL\n".join(
        f"SELECT a.doc_id AS ia, b.doc_id AS ib, a.sh AS sha, b.sh AS shb "
        f"FROM s a JOIN s b "
        f"ON {d.bitslice('a.sh', k * SIMHASH_BAND_BITS, mask)} = "
        f"{d.bitslice('b.sh', k * SIMHASH_BAND_BITS, mask)} "
        f"AND a.doc_id < b.doc_id"
        for k in range(SIMHASH_BITS // SIMHASH_BAND_BITS))
    hamming = f"bit_count({d.xor('sha', 'shb')})"
    return f"""WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
e AS (SELECT doc_id, {d.explode(shingles)} AS tok FROM t),
th AS (SELECT doc_id, {d.poly_hash('tok')} AS hv
       FROM e),
bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM th GROUP BY doc_id
),
s AS (SELECT doc_id, {assemble} AS sh FROM bits),
cand AS (
  SELECT DISTINCT ia, ib, sha, shb FROM (
{band_joins}
  ) u
)
SELECT ia AS doc_a, ib AS doc_b, cast({hamming} as bigint) AS hamming
FROM cand
WHERE {hamming} <= {SIMHASH_MAX_HAMMING}"""


def dedup_embedding_cosine(d: Dialect) -> str:
    """Embedding-cosine near-dup pairs, blocked by the cluster label
    (at 100 TB the block key is a coarse KMeans/LSH bucket, same plan
    shape). Cosine is the fixed-order fold — cross-engine exact; norms
    are precomputed per vector, not per pair."""
    cos = d.dot("a.embedding", "b.embedding")
    nrm = d.dot("embedding", "embedding")
    return f"""WITH v AS (
  SELECT vec_id, label, embedding, sqrt({nrm}) AS nrm FROM embeddings
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    {cos} / (a.nrm * b.nrm) AS cosine
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= {COSINE_DUP_THRESHOLD}"""


BUILDERS = {
    "dedup_exact_groups": dedup_exact_groups,
    "dedup_exact_flags": dedup_exact_flags,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}
