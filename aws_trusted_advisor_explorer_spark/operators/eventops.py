"""Event-stream analytics over the ``events`` table: tumbling-window
aggregation, gap-based sessionization, and per-user top-k — the batch
forms; streaming/structured.py runs the same windowed aggregate as a
Structured Streaming job and is tested equal to the batch plan.

Dual-dialect SQL (functions/dual.py). Determinism notes:
- ``sum(double)`` is order-dependent under parallel aggregation, so
  money-style sums go through decimal(18,2) (exact, associative) and
  only the query boundary casts back to double. The driver data's
  ``value`` column is 2-dp, so the decimal cast is lossless.
- session gaps use integer epoch-microseconds, never float seconds.

Scale posture: both windowing queries shuffle once on their natural
key (window/user); the sessionization window function requires a sort
within user partitions — at 100 TB that is a range-partitioned sort,
which Spark's window exec already does; no driver-side state.
"""

from __future__ import annotations

from aws_trusted_advisor_explorer_spark.functions.dual import Dialect

SESSION_GAP_US = 1_800_000_000  # 30 min
TOP_K = 3


def events_hourly_by_type(d: Dialect) -> str:
    """Tumbling 1-hour window counts + exact value sums per event type."""
    return """SELECT date_trunc('hour', ts) AS hour, event_type,
  count(*) AS n_events,
  cast(sum(cast(value as decimal(18,2))) as double) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type"""


def events_sessionize(d: Dialect) -> str:
    """Gap-based sessionization (30-min inactivity): per-user session
    count, event count, and mean session length."""
    ep = d.epoch_us("ts")
    return f"""WITH e AS (
  SELECT user_id, event_id, {ep} AS us FROM events
),
g AS (
  SELECT user_id, us,
    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
              > {SESSION_GAP_US}
         OR lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
    THEN 1 ELSE 0 END AS is_new_session
  FROM e
)
SELECT user_id,
  cast(sum(is_new_session) as bigint) AS n_sessions,
  count(*) AS n_events,
  cast(count(*) as double) / sum(is_new_session) AS events_per_session
FROM g
GROUP BY user_id"""


def events_user_topk(d: Dialect) -> str:
    """Per-user top-k events by value (row_number, deterministic
    (value DESC, event_id) tiebreak)."""
    return f"""WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
  FROM events
)
SELECT user_id, rank, event_id, event_type, value
FROM ranked WHERE rank <= {TOP_K}"""


def events_value_quantiles(d: Dialect) -> str:
    """Per-event-type exact p50/p95 of ``value`` plus distinct users,
    computed by rank selection (row_number over a value sort) so both
    engines pick the identical element — no interpolation, no approx
    drift. At 100 TB swap in ``approx_percentile``/HLL
    (``approx_count_distinct``): one pass, mergeable sketches, no
    per-key sort — the exact form stays as the small-scale oracle."""
    return """WITH r AS (
  SELECT event_type, value, user_id,
    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
  max(n) AS n_events,
  cast(count(DISTINCT user_id) as bigint) AS n_users,
  max(CASE WHEN rn = cast(floor((n - 1) * 0.5) as bigint) + 1 THEN value END) AS p50_value,
  max(CASE WHEN rn = cast(floor((n - 1) * 0.95) as bigint) + 1 THEN value END) AS p95_value
FROM r
GROUP BY event_type"""


def events_asof_join(d: Dialect) -> str:
    """Backward as-of join: for every ``click`` event, the value of the
    same user's latest prior-or-equal ``view`` event.

    Implemented as ONE pass — union the two event roles and carry the
    last non-null view value forward with an IGNORE NULLS window —
    instead of the O(rows_l x rows_r) range-join formulation. At
    100 TB this is one shuffle on user + an in-partition sort; the
    range-join form would explode on active users."""
    over = ("PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
    asof = d.last_ignore_nulls(
        "CASE WHEN event_type = 'view' THEN value END", over)
    return f"""WITH u AS (
  SELECT user_id, event_id, ts, value, event_type,
    {asof} AS asof_view_value
  FROM events
  WHERE event_type IN ('view', 'click')
)
SELECT user_id, event_id AS click_id, value AS click_value, asof_view_value
FROM u
WHERE event_type = 'click'"""


def events_rollup(d: Dialect) -> str:
    """Hierarchical rollup (the hypertable-rollup shape): daily counts
    and exact decimal value sums per event type, plus per-type and
    grand totals from GROUP BY ROLLUP — subtotal rows carry NULL
    grouping columns identically in both engines."""
    return """WITH e AS (
  SELECT event_type, date_trunc('day', ts) AS day, value FROM events
)
SELECT event_type, day,
  count(*) AS n_events,
  cast(sum(cast(value as decimal(18,2))) as double) AS total_value
FROM e
GROUP BY ROLLUP(event_type, day)"""


def events_value_quantiles_approx_df(spark):
    """The 100 TB form of events_value_quantiles: mergeable sketches
    (approx_percentile / HLL approx_count_distinct) — one pass, no
    per-key sort, constant memory. Not oracle-gated (sketch internals
    are engine-specific); tests bound its error against the exact
    rank-selection query instead."""
    from pyspark.sql import functions as F

    return (spark.table("events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.approx_count_distinct("user_id").alias("n_users_approx"),
                 F.percentile_approx("value", 0.5).alias("p50_value"),
                 F.percentile_approx("value", 0.95).alias("p95_value")))


def events_props_json(d: Dialect) -> str:
    """Semi-structured extraction: parse the ``props`` JSON payload
    (``{{"k": N}}``), type the field, aggregate per event_type — the
    standard lakehouse pattern for late-typed event properties. JSON
    parsing is a per-row projection fused into the scan (zero extra
    shuffles beyond the groupBy); at 100 TB prefer landing hot JSON
    fields as real columns, with this as the long-tail fallback."""
    k = f"cast({d.json_str('props', '$.k')} as bigint)"
    return f"""WITH e AS (SELECT event_type, {k} AS k FROM events)
SELECT event_type,
  count(*) AS n_events,
  count(k) AS n_with_k,
  cast(sum(k) as bigint) AS sum_k,
  min(k) AS min_k,
  max(k) AS max_k
FROM e GROUP BY event_type"""


BUILDERS = {
    "events_hourly_by_type": events_hourly_by_type,
    "events_props_json": events_props_json,
    "events_sessionize": events_sessionize,
    "events_user_topk": events_user_topk,
    "events_value_quantiles": events_value_quantiles,
    "events_asof_join": events_asof_join,
    "events_rollup": events_rollup,
}
