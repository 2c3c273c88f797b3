#!/usr/bin/env python
"""Measured evidence for the streaming plane (r8-r9): micro-batch
throughput and state behavior of four representative twins — one
stateless (dedup_stream), one windowed-aggregate
(hourly_counts_stream), one custom-stateful (sessionize_stream), and
the watermarked stream-stream join (purchase_click_join_stream, with
its per-batch state-eviction series) — drained over a MULTI-FILE
staging of the sf0.1 corpus with
maxFilesPerTrigger=1, so every number comes from real micro-batch
boundaries, not a single-batch drain.

For each twin: wall seconds, input rows/s, number of micro-batches
(asserted > 1 from the query's own progress events), and a
correctness cross-check against the batch form (the same equality the
pytest twins pin, re-asserted here so the throughput claim can't
drift from a broken query). Writes bench_results/STREAMING.md with
the measured table; prose is computed from the measurements.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE = "/tmp/spark_graft_stream_stage"
N_FILES = 8  # micro-batches per drain (maxFilesPerTrigger=1)


def stage_multifile() -> str:
    """Split the events/documents parquet into N_FILES chronological
    part files each (the landed layout: files arrive in time order)."""
    import pandas as pd

    shutil.rmtree(STAGE, ignore_errors=True)
    os.makedirs(STAGE)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        os.symlink(os.path.join(SF_DIR, f"{t}.parquet"),
                   os.path.join(STAGE, f"{t}.parquet"))
    for table, sort_cols in (("events", ["ts", "event_id"]),
                             ("documents", ["doc_id"])):
        pdf = (pd.read_parquet(f"{SF_DIR}/{table}.parquet")
               .sort_values(sort_cols).reset_index(drop=True))
        tdir = os.path.join(STAGE, f"{table}.parquet")
        os.makedirs(tdir)
        n = len(pdf)
        for i in range(N_FILES):
            chunk = pdf.iloc[i * n // N_FILES:(i + 1) * n // N_FILES]
            if table == "events":
                chunk = chunk.astype({"ts": "datetime64[us]"})
            p = os.path.join(tdir, f"part-{i:05d}.parquet")
            chunk.to_parquet(p)
            os.utime(p, (1_700_000_000 + i * 60,) * 2)
    return STAGE


def drain(spark, stream_df, name: str, output_mode: str):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    t0 = time.perf_counter()
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    n_batches = sum(1 for p in q.recentProgress
                    if p["numInputRows"] > 0)
    rows_in = sum(p["numInputRows"] for p in q.recentProgress)
    # per-batch state-store row totals (first state operator) for the
    # stateful twins — the eviction/plateau evidence
    state = [p["stateOperators"][0]["numRowsTotal"]
             for p in q.recentProgress
             if p.get("stateOperators") and p["numInputRows"] > 0]
    return wall, n_batches, rows_in, state


def main() -> None:
    from pyspark.sql import functions as F

    from aws_trusted_advisor_explorer_spark.session import (
        get_spark, load_tables,
    )
    from aws_trusted_advisor_explorer_spark.streaming import structured

    stage = stage_multifile()
    spark = get_spark("bench_streaming")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    load_tables(spark, stage)  # batch views over the SAME staged files

    rows = []

    # stateless: content-hash first-seen dedup over documents
    wall, nb, rin, _ = drain(
        spark, structured.dedup_stream(spark, stage), "st_dedup", "append")
    got = spark.table("st_dedup").count()
    # count(DISTINCT) excludes NULL; dropDuplicates keeps the NULL-hash
    # (NULL-text) group as one survivor — add it back explicitly
    want = spark.sql(
        "SELECT count(DISTINCT sha2(text, 256)) "
        " + max(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS n "
        "FROM documents").first().n
    assert nb > 1, "dedup_stream ran a single batch"
    assert got == want, (got, want)
    rows.append(("`dedup_stream` (stateless first-seen dedup)",
                 "documents", rin, nb, wall))

    # windowed aggregate: tumbling hourly counts
    wall, nb, rin, _ = drain(
        spark, structured.hourly_counts_stream(spark, stage),
        "st_hourly", "complete")
    got = spark.table("st_hourly").agg(
        F.sum("n_events").alias("n")).first().n
    want = spark.sql("SELECT count(*) AS n FROM events").first().n
    assert nb > 1, "hourly_counts_stream ran a single batch"
    assert got == want, (got, want)
    rows.append(("`hourly_counts_stream` (watermarked tumbling agg)",
                 "events", rin, nb, wall))

    # custom stateful: per-user gap sessionization
    wall, nb, rin, _ = drain(
        spark, structured.sessionize_stream(spark, stage),
        "st_sess", "update")
    final = (spark.table("st_sess").groupBy("user_id")
             .agg(F.max("n_events").alias("n_events")))
    got = final.agg(F.sum("n_events").alias("n")).first().n
    assert nb > 1, "sessionize_stream ran a single batch"
    assert got == want, (got, want)
    rows.append(("`sessionize_stream` (applyInPandasWithState)",
                 "events", rin, nb, wall))

    # stream-stream join: the twin whose 100 TB story is state
    # EVICTION — both sides watermarked (12h) with a two-sided
    # event-time bound (6h window), so buffered rows become droppable
    # once the watermark passes; over a 30-day corpus split into 8
    # chronological batches the join-state series must PLATEAU at the
    # retention bound, not grow with the stream
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import eventops

    wall, nb, rin, state = drain(
        spark, structured.purchase_click_join_stream(spark, stage),
        "st_pairjoin", "append")
    assert nb > 1, "purchase_click_join_stream ran a single batch"
    assert len(state) == nb, (len(state), nb)
    bat = spark.sql(eventops.events_purchase_click_pairs(SPARK)) \
        .agg(F.count("*").alias("n"),
             F.sum("us_before_purchase").alias("s")).first()
    strm = spark.table("st_pairjoin").agg(
        F.count("*").alias("n"),
        F.sum("us_before_purchase").alias("s")).first()
    assert (strm.n, strm.s) == (bat.n, bat.s), ((strm.n, strm.s),
                                                (bat.n, bat.s))
    sides_total = spark.sql(
        "SELECT count(*) AS n FROM events "
        "WHERE event_type IN ('click', 'purchase')").first().n
    # eviction proof: buffered state never approaches all-rows-ever,
    # and the tail of the series is flat (plateau), not monotone
    assert max(state) < sides_total // 2, (max(state), sides_total)
    tail = state[len(state) // 2:]
    assert max(tail) - min(tail) <= max(tail) // 4, state
    rows.append(("`purchase_click_join_stream` (watermarked "
                 "stream-stream join)", "events", rin, nb, wall))

    # online point-in-time features (r9): state payload is the rolling
    # 7-day per-user buffer — numRowsTotal is one row per user; the
    # payload bound is the corpus's own max 7-day per-user event count
    wall, nb, rin, pit_state = drain(
        spark, structured.pit_features_stream(spark, stage),
        "st_pit", "update")
    assert nb > 1, "pit_features_stream ran a single batch"
    got = spark.table("st_pit")
    want_df = spark.sql(eventops.events_pit_features(SPARK))
    gs = got.agg(F.count("*").alias("n"),
                 F.sum("n_events_7d").alias("s")).first()
    ws = want_df.agg(F.count("*").alias("n"),
                     F.sum("n_events_7d").alias("s")).first()
    assert (gs.n, gs.s) == (ws.n, ws.s), ((gs.n, gs.s), (ws.n, ws.s))
    n_users = spark.sql(
        "SELECT count(DISTINCT user_id) AS n FROM events").first().n
    # EQUALITY, not <=: the generated prose prints "plateau at X (=
    # the corpus's Y active users, one row each)" — every user has at
    # least one event by construction (n_users is computed from the
    # same drained table), so the final state row count must BE the
    # user count or the artifact would state a false identity
    assert max(pit_state) == n_users, (max(pit_state), n_users)
    max_buf = spark.sql(f"""
        SELECT max(n) AS m FROM (
          SELECT count(*) OVER (PARTITION BY user_id
            ORDER BY unix_micros(cast(ts as timestamp))
            RANGE BETWEEN {eventops.PIT_LONG_US} PRECEDING
            AND CURRENT ROW) AS n
          FROM events)""").first().m
    rows.append(("`pit_features_stream` (stateful point-in-time "
                 "features)", "events", rin, nb, wall))

    out = ["""# STREAMING — measured micro-batch evidence (r8-r9)

`scripts/bench_streaming.py`: five representative twins — stateless,
windowed-aggregate, custom-stateful, stream-stream join, and the
online feature buffer — drained over
an %d-file chronological staging of the sf0.1 corpus with
`maxFilesPerTrigger=1` — every run crosses REAL micro-batch
boundaries (batch counts below come from the query's own progress
events, and each drain re-asserts the batch-equality its pytest twin
pins). Wall includes source listing, state store access, and the
memory sink.

| twin | source | input rows | micro-batches | wall | rows/s |
|---|---|---|---|---|---|""" % N_FILES]
    for name, src, rin, nb, wall in rows:
        out.append(f"| {name} | {src} | {rin} | {nb} | {wall:.2f}s "
                   f"| {int(rin / wall)} |")
    builtin = rows[1][4]
    stateful = rows[2][4]
    out.append(f"""
Reading: on the SAME {rows[1][2]}-event source, the custom-stateful
rung (`applyInPandasWithState`, per-user Arrow state) pays
{stateful / builtin:.2f}x the built-in windowed aggregate's wall —
the state store + Python round-trip price, which is why the plane
keeps built-in/stateless forms for everything they can express and
reserves custom state for what they can't (sessions, SCD2, funnels,
disorder audits). The stateless dedup row's wall is per-batch
overhead, not work ({rows[0][2]} rows over {N_FILES} triggers — each
trigger's listing/commit costs ~0.1-0.5s); all four amortize at
production batch sizes. These are LOCAL single-JVM anchors — the
scale lever is partition parallelism within each batch (state is
hash-partitioned by key), not batch count.

## Stream-stream join state EVICTION (r9)

`purchase_click_join_stream` is the twin whose 100 TB story depends
on watermark state eviction: both sides carry a 12 h watermark and
the join condition bounds event time in BOTH directions (6 h
attribution window), so Spark drops a buffered click once the
watermark passes its time + window and an unmatched purchase once the
watermark passes its time. Per-batch join-state rows
(`stateOperators[0].numRowsTotal` from the query's own progress
events) over the {N_FILES} chronological batches of the 30-day
corpus ({sides_total} click/purchase rows total):

| batch | state rows |
|---|---|""")
    for i, s in enumerate(state):
        out.append(f"| {i + 1} | {s} |")
    out.append(f"""
The series PLATEAUS (peak {max(state)} rows = {100 * max(state)
// sides_total}% of all click/purchase rows ever seen; tail spread
{max(state[len(state) // 2:]) - min(state[len(state) // 2:])} rows)
instead of growing with the stream — the two-sided event-time bound
is doing the eviction, which is what makes at-ingest attribution
viable against an unbounded stream. The drain re-asserts the pair
set equal to the batch join (count + exact lag-sum checksum).

## Point-in-time feature state (r9)

`pit_features_stream` keeps one state row per user whose payload is
the rolling 7-DAY event buffer, evicted by event time as the user's
high-water mark advances. Measured over the same {N_FILES}-batch
drain: state rows plateau at {max(pit_state)} (= the corpus's
{n_users} active users, one row each, never event-count-shaped), and
the payload bound is the corpus's own max 7-day per-user burst —
{max_buf} events (the batch window's RANGE frame measures it) — so
state is O(users x 7-day activity), independent of stream length.
The drain re-asserts feature equality with the batch
`events_pit_features` (count + exact n_events_7d checksum).""")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results", "STREAMING.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}")
    for name, src, rin, nb, wall in rows:
        print(f"  {name}: {rin} rows, {nb} batches, {wall:.2f}s")
    spark.stop()
    shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
