#!/usr/bin/env python
"""sf0.2 stretch points for events_scd2_history (round-8 verdict
stretch ask #7): the SCD2 gaps-and-islands window stack is the newest
heavyweight, so pin its growth claim with TWO different 2x-events
variants that stress different parts of the plan:

- "2x users": the copy offsets user_id past the original population
  (event_ids offset too, timestamps unchanged) — twice the window
  PARTITIONS, per-user work unchanged. The one user_id exchange
  carries 2x rows; wall ~2x is the linear claim.
- "2x events/user": the copy keeps the SAME user_ids and shifts
  timestamps past the original horizon (a second epoch per user) —
  user count unchanged, per-user event count AND run count double, so
  this is the variant that grows the lead() relation (runs-per-user)
  and the per-partition sort. Wall ~2x is the claim; super-linear
  growth here would mean the stacked windows degrade with run depth.

Both variants re-assert correctness: the history row count must grow
with runs (2x users => exactly 2x rows; 2x events/user => ~2x rows,
one extra run per user joining the epochs at most), and every user's
intervals stay non-overlapping with exactly one open run (spot
re-check of the pytest invariant at stretch scale).

Writes one JSON line to stdout (redirect to
bench_results/scd2_stretch.json); scripts/gen_scaling.py folds it
into SCALING.md when present.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST_USERS = "/tmp/spark_graft_sf0.2_scd2_users"
DST_DEPTH = "/tmp/spark_graft_sf0.2_scd2_depth"
KEY = "events_scd2_history"


def build_variant(dst: str, sql_copy: str) -> None:
    import duckdb

    # rebuild unconditionally (the stage_multifile rule): a crashed or
    # assertion-failed previous run leaves a possibly-partial
    # events.parquet behind, and reuse would silently measure it
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings", "documents"):
        os.symlink(os.path.join(SRC, f"{t}.parquet"),
                   os.path.join(dst, f"{t}.parquet"))
    evts = os.path.join(dst, "events.parquet")
    duckdb.connect().sql(
        f"COPY (SELECT * FROM '{SRC}/events.parquet' "
        f"UNION ALL {sql_copy}) TO '{evts}' (FORMAT PARQUET)")


def main() -> None:
    import __spark_entry__ as ent
    from aws_trusted_advisor_explorer_spark.session import get_spark

    # 2x users: user_id + (max+1), event_id offset, timestamps as-is
    build_variant(DST_USERS, f"""
        SELECT event_id + (SELECT max(event_id) + 1
                           FROM '{SRC}/events.parquet') AS event_id,
               ts,
               user_id + (SELECT max(user_id) + 1
                          FROM '{SRC}/events.parquet') AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet'""")
    # 2x events/user: SAME user_ids, second disjoint epoch
    build_variant(DST_DEPTH, f"""
        SELECT event_id + (SELECT max(event_id) + 1
                           FROM '{SRC}/events.parquet') AS event_id,
               ts + ((SELECT max(ts) - min(ts)
                      FROM '{SRC}/events.parquet') + INTERVAL 1 DAY) AS ts,
               user_id, event_type, value, props
        FROM '{SRC}/events.parquet'""")

    spark = get_spark("scd2_stretch")
    qs = ent.queries()
    result: dict = {"key": KEY, "variants": {}}
    variants = (("sf0.1", SRC), ("2x_users", DST_USERS),
                ("2x_events_per_user", DST_DEPTH))
    # warm ALL variants before timing ANY: the session's first
    # executions pay codegen/JIT once, and a per-variant warm right
    # before its own timing still left the FIRST variant absorbing
    # session-level one-time costs (measured: baseline slower than 2x)
    for _ in range(2):
        for _, sf_dir in variants:
            qs[KEY](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
    for label, sf_dir in variants:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs[KEY](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        df = qs[KEY](spark, sf_dir)
        df.createOrReplaceTempView("scd2_out")
        stats = spark.sql("""
            SELECT count(*) AS n_rows,
              count(DISTINCT user_id) AS n_users,
              sum(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END)
                AS n_open,
              max(CASE WHEN valid_to_us IS NOT NULL
                        AND valid_to_us < valid_from_us
                       THEN 1 ELSE 0 END) AS bad_interval
            FROM scd2_out""").first()
        assert stats.n_open == stats.n_users, (label, stats)
        assert stats.bad_interval == 0, label
        result["variants"][label] = {
            "sec": round(best, 4), "rows": int(stats.n_rows),
            "users": int(stats.n_users)}
    base = result["variants"]["sf0.1"]
    for label in ("2x_users", "2x_events_per_user"):
        v = result["variants"][label]
        v["growth"] = round(v["sec"] / base["sec"], 2)
        v["row_growth"] = round(v["rows"] / base["rows"], 2)
    # 2x users doubles partitions exactly
    assert result["variants"]["2x_users"]["users"] == 2 * base["users"]
    assert result["variants"]["2x_users"]["rows"] == 2 * base["rows"]
    # 2x depth keeps the population, doubles runs (±1 epoch-joining run)
    assert result["variants"]["2x_events_per_user"]["users"] == base["users"]
    print(json.dumps(result))
    spark.stop()
    shutil.rmtree(DST_USERS, ignore_errors=True)
    shutil.rmtree(DST_DEPTH, ignore_errors=True)


if __name__ == "__main__":
    main()
