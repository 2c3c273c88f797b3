"""Data-quality plane: column profiling, expectation suites, and
incremental aggregate maintenance over the ``documents`` corpus —
the pre-training validation gates (the Deequ/Great-Expectations shape,
re-expressed as declarative dual-dialect SQL; extension scope per
BASELINE.json, no reference analog at /root/reference).

Scale posture (100 TB): every operator here is one map-side-combining
aggregate pass (profilers/expectations) or an aggregate-sized outer
join (incremental refresh) — nothing shuffles corpus rows on a wide
key, and every output is column-/group-cardinality sized.
"""

from __future__ import annotations

from aws_trusted_advisor_explorer_spark.functions.dual import Dialect

# documents columns the profiler targets; WIDE columns get their
# distinct count keyed on a content hash so exchanges never carry
# large values
_DOC_COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")
_WIDE_COLUMNS = frozenset({"text"})

PROFILE_VALUE_TRUNC = 40  # min/max rendered as strings, truncated

ALLOWED_LANGS = ("en", "de", "fr", "es", "zh")


def docs_column_profile(d: Dialect, table: str = "documents") -> str:
    """Per-column corpus profile (the df.describe()/Deequ profiler):
    row count, non-null count, exact distinct count, min/max rendered
    as (truncated) strings for a uniform report schema. ONE aggregate
    over ONE scan: all five columns' stats land in a single one-row
    aggregate, unpivoted to the report rows by exploding an array of
    structs over that row (a UNION-ALL-per-column form — or a
    multiply-referenced one-row CTE — re-scans the corpus once per
    column under BOTH engines' CTE inlining; measured 5 Scan nodes
    pre-rewrite). The distinct counts share the scan via the engines'
    multi-distinct expansion, and the wide ``text`` column's distinct
    is keyed on md5(text) so the exchange never carries document
    bodies (same count, same hash-key rule as exact dedup; min/max
    need no such guard — partial aggregation moves one value per
    partition). Content here is ASCII so string min/max agree across
    engines (binary collation both sides)."""
    aggs = ["cast(count(*) as bigint) AS n_rows"]
    entries = []
    for col in _DOC_COLUMNS:
        dkey = f"md5({col})" if col in _WIDE_COLUMNS else col
        aggs += [
            f"cast(count({col}) as bigint) AS nn_{col}",
            f"cast(count(DISTINCT {dkey}) as bigint) AS nd_{col}",
            f"substr(cast(min({col}) as string), 1, {PROFILE_VALUE_TRUNC})"
            f" AS mn_{col}",
            f"substr(cast(max({col}) as string), 1, {PROFILE_VALUE_TRUNC})"
            f" AS mx_{col}",
        ]
        entries.append(d.struct_(
            ("column_name", f"'{col}'"), ("n_nonnull", f"nn_{col}"),
            ("n_distinct", f"nd_{col}"), ("min_value", f"mn_{col}"),
            ("max_value", f"mx_{col}")))
    cols = ",\n    ".join(aggs)
    return f"""WITH a AS (
  SELECT {cols}
  FROM {table}
),
x AS (SELECT n_rows, {d.explode(d.arr_lit(entries))} AS s FROM a)
SELECT s.column_name AS column_name, n_rows,
  s.n_nonnull AS n_nonnull, s.n_distinct AS n_distinct,
  s.min_value AS min_value, s.max_value AS max_value
FROM x"""


def docs_expectations_report(d: Dialect, table: str = "documents") -> str:
    """Expectation-suite run (the pre-training data contract): each
    named expectation reports its violation count and verdict in ONE
    aggregate pass — uniqueness via count-minus-distinct, the rest as
    CASE-counts — unpivoted by exploding an array of structs over the
    one-row aggregate (a UNION ALL per expectation re-evaluated the
    aggregate CTE once per reference under BOTH engines' CTE inlining
    — measured 5 Scan nodes pre-rewrite). Adding an expectation adds
    a column to the inner aggregate and an array entry — never
    another scan.

    Expectations: doc_id non-null, doc_id unique, text non-empty,
    lang within the allowed set, n_chars consistent with length(text).
    """
    langs = ", ".join(f"'{x}'" for x in ALLOWED_LANGS)
    checks = f"""a AS (
  SELECT cast(count(*) as bigint) AS n_rows,
    cast(count(*) - count(doc_id) as bigint) AS v_null_id,
    cast(count(doc_id) - count(DISTINCT doc_id) as bigint) AS v_dup_id,
    cast(count(CASE WHEN length(text) = 0 OR text IS NULL THEN 1 END)
         as bigint) AS v_empty_text,
    cast(count(CASE WHEN lang IS NULL OR lang NOT IN ({langs}) THEN 1 END)
         as bigint) AS v_bad_lang,
    cast(count(CASE WHEN n_chars IS DISTINCT FROM length(text) THEN 1 END)
         as bigint) AS v_chars_drift
  FROM {table}
)"""
    rows = [
        ("doc_id_not_null", "v_null_id"),
        ("doc_id_unique", "v_dup_id"),
        ("text_nonempty", "v_empty_text"),
        ("lang_allowed", "v_bad_lang"),
        ("n_chars_consistent", "v_chars_drift"),
    ]
    entries = [d.struct_(("expectation", f"'{name}'"), ("nv", col))
               for name, col in rows]
    return f"""WITH {checks},
x AS (SELECT n_rows, {d.explode(d.arr_lit(entries))} AS s FROM a)
SELECT s.expectation AS expectation, n_rows, s.nv AS n_violations,
  s.nv = 0 AS passed
FROM x"""


REFRESH_MOD = 20   # doc_id % 20 == REFRESH_REM -> the delta batch
REFRESH_REM = 3


MAD_K = 5        # flag docs beyond K·MAD from the median
MAD_TOP_K = 50   # review-queue size


def docs_length_mad_outliers(d: Dialect) -> str:
    """Robust LENGTH-outlier detection (the median/MAD rule — the
    column-profile family's anomaly arm: mean/stddev profiles are
    themselves dragged by the outliers they should flag, median/MAD
    are not): exact median of n_chars and exact MAD (median absolute
    deviation), both by rank selection over COMPACTED value
    histograms (the events_value_quantiles index rule — no
    interpolation, no approx drift; deviations re-compact before the
    second rank pass), then the {MAD_TOP_K} most-deviant docs beyond
    {MAD_K}·MAD — truncation bugs, concatenation blowups, and
    mis-parsed documents surface here before they skew training
    mixes. All integers; ties deterministic (abs_dev DESC, doc_id).

    Scale posture (100 TB): two histogram aggregates (map-side-
    combining, bounded by the value DOMAIN, never corpus rows), two
    prefix windows over those compacted relations (allowlisted), the
    1-row median/MAD relations broadcast back onto the scan (the
    docs_bm25_topk corpus-stats shape), final leaderboard is
    ORDER BY + LIMIT → TakeOrdered."""
    def rank_sel(src: str, alias: str) -> str:
        # min value whose cumulative multiplicity reaches the median
        # index (lower median at even n — the value_quantiles rule)
        return f"""(
  SELECT min(CASE WHEN cum >= cast(floor((n - 1) * 0.5) as bigint) + 1
             THEN v END) AS {alias}
  FROM (
    SELECT v, sum(m) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      sum(m) OVER () AS n
    FROM {src}
  ) cdf0
)"""
    return f"""WITH h AS (
  SELECT cast(n_chars as bigint) AS v, cast(count(*) as bigint) AS m
  FROM documents GROUP BY n_chars
),
med AS (SELECT med FROM {rank_sel('h', 'med')} m0),
dh AS (
  SELECT abs(h.v - med.med) AS v, cast(sum(h.m) as bigint) AS m
  FROM h CROSS JOIN med GROUP BY abs(h.v - med.med)
),
mad AS (SELECT mad FROM {rank_sel('dh', 'mad')} m1)
SELECT doc_id, cast(n_chars as bigint) AS n_chars,
  abs(cast(n_chars as bigint) - med.med) AS abs_dev,
  med.med AS median_chars, mad.mad AS mad_chars
FROM documents CROSS JOIN med CROSS JOIN mad
WHERE abs(cast(n_chars as bigint) - med.med) > {MAD_K} * mad.mad
ORDER BY abs_dev DESC, doc_id LIMIT {MAD_TOP_K}"""


def docs_agg_refresh(d: Dialect) -> str:
    """Incremental AGGREGATE maintenance (materialized-view refresh):
    a stored per-source rollup (docs + token totals over the previous
    snapshot) is brought current by merging a delta batch's partial
    aggregate — new = stored + delta in ONE full-outer equi-join on
    the group key, never a rescan of the old snapshot. The audit
    column proves the refreshed totals equal a direct recompute over
    the full corpus (the IVM correctness check, asserted true by
    pytest and carried in-row so drift is visible in production).

    Delta batch = ``doc_id % {REFRESH_MOD} = {REFRESH_REM}``
    (deterministic synthetic arrivals); stored snapshot = the rest.

    Scale posture (100 TB): the stored rollup IS group-cardinality
    sized (a table you keep, not a scan you redo); only the delta
    batch is scanned and partially aggregated (map-side combine), and
    the merge join is rollup-sized. Exact bigint sums are associative,
    so stored+delta is bit-equal to the full recompute by
    construction.
    """
    tok_n = f"cast({d.arr_len(d.tokens('text'))} as bigint)"
    agg = (f"cast(count(*) as bigint) AS n_docs, "
           f"cast(sum({tok_n}) as bigint) AS n_tokens")

    # null-safe group-key equality: a NULL source forms a real rollup
    # group in every aggregate here, but plain `=` never matches NULL
    # — the merge would emit two unmerged half-rows and the final join
    # would silently DROP the NULL-source totals (the exact drift the
    # audit column exists to surface). Spark spells it <=>; DuckDB
    # IS NOT DISTINCT FROM. Both remain hash-join keys.
    def nse(a: str, b: str) -> str:
        if d.name == "spark":
            return f"{a} <=> {b}"
        return f"{a} IS NOT DISTINCT FROM {b}"

    return f"""WITH stored AS (
  SELECT source, {agg} FROM documents
  WHERE doc_id % {REFRESH_MOD} <> {REFRESH_REM}
  GROUP BY source
),
delta AS (
  SELECT source, {agg} FROM documents
  WHERE doc_id % {REFRESH_MOD} = {REFRESH_REM}
  GROUP BY source
),
full_rc AS (
  SELECT source, {agg} FROM documents GROUP BY source
),
merged AS (
  SELECT coalesce(s.source, dl.source) AS source,
    coalesce(s.n_docs, 0) + coalesce(dl.n_docs, 0) AS n_docs,
    coalesce(s.n_tokens, 0) + coalesce(dl.n_tokens, 0) AS n_tokens,
    coalesce(s.n_docs, 0) AS n_docs_stored,
    coalesce(dl.n_docs, 0) AS n_docs_delta
  FROM stored s FULL OUTER JOIN delta dl ON {nse('dl.source', 's.source')}
)
SELECT m.source, m.n_docs, m.n_tokens, m.n_docs_stored, m.n_docs_delta,
  (m.n_docs = f.n_docs AND m.n_tokens = f.n_tokens) AS matches_recompute
FROM merged m JOIN full_rc f ON {nse('f.source', 'm.source')}"""


BUILDERS = {
    "docs_column_profile": docs_column_profile,
    "docs_expectations_report": docs_expectations_report,
    "docs_agg_refresh": docs_agg_refresh,
    "docs_length_mad_outliers": docs_length_mad_outliers,
}
