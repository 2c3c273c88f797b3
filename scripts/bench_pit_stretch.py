#!/usr/bin/env python
"""sf0.2 stretch points for the training-example pair (r9):
events_pit_features (backward feature frames) and
events_training_labels (forward label frames) share the one-exchange
window rails, so both are pinned with the two 2x-events variants the
SCD2 stretch established:

- "2x users": copy offsets user_id past the original population —
  twice the window partitions, per-user frame work unchanged; wall
  ~2x is the linear claim, and the feature/label row count doubles
  exactly (purchases double).
- "2x events/user": same user_ids, a second epoch shifted a full 31
  days past the original span — STRICTLY beyond the 30-day label
  horizon and the 7-day lookback, so no frame crosses epochs and the
  variant isolates per-partition depth (the in-partition sort and
  frame scan see 2x rows per user while per-purchase frame work is
  unchanged). This is the variant that would expose super-linear
  degradation in the value-range frames.

Both variants re-assert invariants at stretch scale: one output row
per purchase, label_repeat binary, and (2x users) exact row doubling.

Writes one JSON line to stdout (redirect to
bench_results/pit_stretch.json); scripts/gen_scaling.py folds it into
SCALING.md when present.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST_USERS = "/tmp/spark_graft_sf0.2_pit_users"
DST_DEPTH = "/tmp/spark_graft_sf0.2_pit_depth"
KEYS = ("events_pit_features", "events_training_labels")


def build_variant(dst: str, sql_copy: str) -> None:
    import duckdb

    # rebuild unconditionally (the stage_multifile rule)
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

    build_variant(DST_USERS, f"""
        SELECT event_id + (SELECT max(event_id) + 1
                           FROM '{SRC}/events.parquet') AS event_id,
               ts,
               user_id + (SELECT max(user_id) + 1
                          FROM '{SRC}/events.parquet') AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet'""")
    # 31-day gap: past LABEL_HORIZON_US (30 d) and PIT_LONG_US (7 d),
    # so no backward or forward frame crosses the epoch boundary
    build_variant(DST_DEPTH, f"""
        SELECT event_id + (SELECT max(event_id) + 1
                           FROM '{SRC}/events.parquet') AS event_id,
               ts + ((SELECT max(ts) - min(ts)
                      FROM '{SRC}/events.parquet') + INTERVAL 31 DAY) AS ts,
               user_id, event_type, value, props
        FROM '{SRC}/events.parquet'""")

    spark = get_spark("pit_stretch")
    qs = ent.queries()
    result: dict = {"keys": list(KEYS), "variants": {}}
    variants = (("sf0.1", SRC), ("2x_users", DST_USERS),
                ("2x_events_per_user", DST_DEPTH))
    # warm ALL variants before timing ANY (the scd2_stretch rule)
    for _ in range(2):
        for _, sf_dir in variants:
            for key in KEYS:
                qs[key](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
    for label, sf_dir in variants:
        entry: dict = {}
        for key in KEYS:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[key](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            df = qs[key](spark, sf_dir)
            df.createOrReplaceTempView("pit_out")
            n_purch = spark.sql(
                "SELECT count(*) AS n FROM events "
                "WHERE event_type = 'purchase'").first().n
            stats = spark.sql("SELECT count(*) AS n FROM pit_out").first()
            assert stats.n == n_purch, (label, key, stats.n, n_purch)
            if key == "events_training_labels":
                bad = spark.sql(
                    "SELECT count(*) AS n FROM pit_out "
                    "WHERE label_repeat NOT IN (0, 1)").first().n
                assert bad == 0, (label, key)
            entry[key] = {"sec": round(best, 4), "rows": int(stats.n)}
        result["variants"][label] = entry
    base = result["variants"]["sf0.1"]
    for label in ("2x_users", "2x_events_per_user"):
        for key in KEYS:
            v = result["variants"][label][key]
            v["growth"] = round(v["sec"] / base[key]["sec"], 2)
            v["row_growth"] = round(v["rows"] / base[key]["rows"], 2)
        # purchases double exactly in both variants
        assert result["variants"][label][KEYS[0]]["rows"] \
            == 2 * base[KEYS[0]]["rows"], label
    print(json.dumps(result))
    spark.stop()
    shutil.rmtree(DST_USERS, ignore_errors=True)
    shutil.rmtree(DST_DEPTH, ignore_errors=True)


if __name__ == "__main__":
    main()
