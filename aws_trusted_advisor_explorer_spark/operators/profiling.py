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
    as (truncated) strings for a uniform report schema. One aggregate
    pass per column over a single scan stage — Catalyst/DuckDB fuse
    the UNION ALL branches' scans; distinct counts are the only
    shuffles, each keyed on its own column — and the wide ``text``
    column's distinct is keyed on md5(text) so the exchange never
    carries document bodies (same count, same hash-key rule as exact
    dedup; min/max need no such guard — partial aggregation moves one
    value per partition). Content here is ASCII so string min/max
    agree across engines (binary collation both sides)."""
    branches = []
    for col in _DOC_COLUMNS:
        dkey = f"md5({col})" if col in _WIDE_COLUMNS else col
        branches.append(f"""SELECT '{col}' AS column_name,
  cast(count(*) as bigint) AS n_rows,
  cast(count({col}) as bigint) AS n_nonnull,
  cast(count(DISTINCT {dkey}) as bigint) AS n_distinct,
  substr(cast(min({col}) as string), 1, {PROFILE_VALUE_TRUNC}) AS min_value,
  substr(cast(max({col}) as string), 1, {PROFILE_VALUE_TRUNC}) AS max_value
FROM {table}""")
    return "\nUNION ALL\n".join(branches)


def docs_expectations_report(d: Dialect, table: str = "documents") -> str:
    """Expectation-suite run (the pre-training data contract): each
    named expectation reports its violation count and verdict in ONE
    aggregate pass — uniqueness via count-minus-distinct, the rest as
    CASE-counts. Adding an expectation adds a column to the inner
    aggregate and a row to the report (constant-size) — never another
    scan.

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
    union = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS expectation, n_rows, {col} AS n_violations, "
        f"{col} = 0 AS passed FROM a"
        for name, col in rows)
    return f"WITH {checks}\n{union}"


REFRESH_MOD = 20   # doc_id % 20 == REFRESH_REM -> the delta batch
REFRESH_REM = 3


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
  FROM stored s FULL OUTER JOIN delta dl ON dl.source = s.source
)
SELECT m.source, m.n_docs, m.n_tokens, m.n_docs_stored, m.n_docs_delta,
  (m.n_docs = f.n_docs AND m.n_tokens = f.n_tokens) AS matches_recompute
FROM merged m JOIN full_rc f ON f.source = m.source"""


BUILDERS = {
    "docs_column_profile": docs_column_profile,
    "docs_expectations_report": docs_expectations_report,
    "docs_agg_refresh": docs_agg_refresh,
}
