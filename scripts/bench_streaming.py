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

    # delayed-label emission (r10): the twin whose state story is the
    # pending-anchor queue. The corpus spans ~30 days and the
    # production horizon IS 30 days — at that setting almost no
    # horizon closes inside the corpus by construction — so the drain
    # measures at a 3-day horizon on BOTH forms (the state rule is
    # horizon-relative; the bound story is unchanged).
    H_US = 3 * 86_400_000_000
    emitted: list = []  # (batch_id, purchase_id, n_fwd, ttn)

    def _collect(bdf, bid):
        emitted.extend(
            (int(bid), int(r.purchase_id), int(r.n_purchases_30d_fwd),
             None if r.time_to_next_us is None else int(r.time_to_next_us))
            for r in bdf.select("purchase_id", "n_purchases_30d_fwd",
                                "time_to_next_us").collect())

    lab_q = (structured.training_labels_stream(spark, stage,
                                               horizon_us=H_US)
             .writeStream.foreachBatch(_collect).outputMode("update")
             .trigger(availableNow=True).start())
    t0 = time.perf_counter()
    lab_q.awaitTermination(600)
    lab_wall = time.perf_counter() - t0
    lab_prog = sorted((p for p in lab_q.recentProgress
                       if p["numInputRows"] > 0),
                      key=lambda p: p["batchId"])
    lab_nb = len(lab_prog)
    lab_rin = sum(p["numInputRows"] for p in lab_prog)
    lab_state = [p["stateOperators"][0]["numRowsTotal"] for p in lab_prog]
    assert lab_nb > 1, "training_labels_stream ran a single batch"

    # batch-equality on the closed-horizon subset (the pytest twin's
    # rule, re-asserted at the measured horizon): every emitted label
    # equals its batch row; nothing emitted twice
    bat_lab = spark.sql(
        eventops.events_training_labels(SPARK, horizon_us=H_US))
    em_ids = [pid for _, pid, _, _ in emitted]
    assert len(set(em_ids)) == len(em_ids), "duplicate emission"
    em_df = spark.createDataFrame(
        [(pid, fwd, ttn) for _, pid, fwd, ttn in emitted],
        "purchase_id long, s_fwd long, s_ttn long")
    j = (bat_lab.join(em_df, "purchase_id")
         .agg(F.count("*").alias("n"),
              F.sum((F.col("n_purchases_30d_fwd") == F.col("s_fwd"))
                    .cast("long")).alias("eq_fwd"),
              F.sum((F.coalesce(F.col("time_to_next_us"), F.lit(-1))
                     == F.coalesce(F.col("s_ttn"), F.lit(-1)))
                    .cast("long")).alias("eq_ttn")).first())
    assert j.n == len(em_ids) == j.eq_fwd == j.eq_ttn, \
        (j.n, len(em_ids), j.eq_fwd, j.eq_ttn)

    # pending-anchor bound: anchors never emitted == purchases whose
    # user high-water mark never passes anchor + horizon (exactly the
    # open-horizon set, computed by the batch engine)
    open_h = spark.sql(f"""
        WITH e AS (SELECT user_id, event_id, event_type,
                          unix_micros(cast(ts as timestamp)) AS us
                   FROM events),
        m AS (SELECT user_id, max(us) AS mx FROM e GROUP BY user_id)
        SELECT count(*) AS n FROM e JOIN m ON m.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND m.mx <= e.us + {H_US}
        """).first().n
    n_purch = spark.sql("SELECT count(*) AS n FROM events "
                        "WHERE event_type = 'purchase'").first().n
    assert n_purch - len(em_ids) == open_h, (n_purch, len(em_ids), open_h)

    # per-batch arrival/emission/pending series + emission delay: the
    # chronological staging means the global (ts, event_id) order is
    # the concatenation of the batches, so cumulative numInputRows
    # boundaries assign each purchase its arrival batch
    ev_sorted = spark.sql(
        "SELECT event_id, event_type FROM events "
        "ORDER BY unix_micros(cast(ts as timestamp)), event_id").toPandas()
    arrival, lo = {}, 0
    arr_n = []
    for p in lab_prog:
        chunk = ev_sorted.iloc[lo:lo + p["numInputRows"]]
        pids = chunk.loc[chunk.event_type == "purchase", "event_id"]
        for eid in pids:
            arrival[int(eid)] = p["batchId"]
        arr_n.append(len(pids))
        lo += p["numInputRows"]
    em_n = [sum(1 for b, *_ in emitted if b == p["batchId"])
            for p in lab_prog]
    pend_series = []
    cum = 0
    for a, e in zip(arr_n, em_n):
        cum += a - e
        pend_series.append(cum)
    assert pend_series[-1] == open_h, (pend_series, open_h)
    delays = sorted(b - arrival[pid] for b, pid, _, _ in emitted)
    d_min, d_max = delays[0], delays[-1]
    d_med = delays[len(delays) // 2]
    n_users = spark.sql(
        "SELECT count(DISTINCT user_id) AS n FROM events").first().n
    assert max(lab_state) == n_users, (max(lab_state), n_users)
    rows.append(("`training_labels_stream` (delayed-label emission, "
                 "3-day horizon)", "events", lab_rin, lab_nb, lab_wall))

    # --- the three stateful twins with equality pytests but no
    # measured state series (r10 verdict task 7): scd2 (state = one
    # open-run record per user), transition matrix (one string per
    # user — the smallest state any twin carries), and the
    # length-3-path miner (a 2-type tail per user). Each series must
    # PLATEAU at the corpus's user count — per-user state, never
    # event-count-shaped — and each drain re-asserts its rollup
    # equality with the batch form.
    per_user: list = []

    wall, nb, rin, st = drain(
        spark, structured.scd2_stream(spark, stage), "st_scd2", "update")
    assert nb > 1, "scd2_stream ran a single batch"
    assert max(st) == n_users, (max(st), n_users)
    # rollup checksum vs the batch gaps-and-islands relation: final
    # (user, run) snapshot row count and exact n_events mass
    # a run's n_events grows monotonically across its re-emitted
    # snapshots, so max() per (user, run) IS the final snapshot — no
    # sink-order assumption needed
    final = spark.sql("""
        SELECT user_id, run_no, max(n_events) AS n_events
        FROM st_scd2 GROUP BY user_id, run_no""")
    bat = spark.sql(eventops.events_scd2_history(SPARK)) \
        .agg(F.count("*").alias("n"),
             F.sum("n_events").alias("s")).first()
    gs = final.agg(F.count("*").alias("n"),
                   F.sum("n_events").alias("s")).first()
    assert (gs.n, gs.s) == (bat.n, bat.s), ((gs.n, gs.s), (bat.n, bat.s))
    rows.append(("`scd2_stream` (stateful SCD2 history)",
                 "events", rin, nb, wall))
    per_user.append(("scd2_stream", "one open-run record", st))

    wall, nb, rin, st = drain(
        spark, structured.transition_matrix_stream(spark, stage),
        "st_trans", "update")
    assert nb > 1, "transition_matrix_stream ran a single batch"
    assert max(st) == n_users, (max(st), n_users)
    # summed per-batch emissions == the batch matrix counts
    mism = spark.sql(f"""
        WITH got AS (SELECT prev_type, next_type, sum(n) AS n
                     FROM st_trans GROUP BY prev_type, next_type),
        want AS (SELECT prev_type, next_type, n FROM (
          {eventops.events_transition_matrix(SPARK)}))
        SELECT count(*) AS bad FROM got FULL OUTER JOIN want
          USING (prev_type, next_type)
        WHERE got.n IS NULL OR want.n IS NULL OR got.n <> want.n
        """).first().bad
    assert mism == 0, mism
    rows.append(("`transition_matrix_stream` (stateful 2-gram miner)",
                 "events", rin, nb, wall))
    per_user.append(("transition_matrix_stream", "one last-type string",
                     st))

    wall, nb, rin, st = drain(
        spark, structured.top_paths_stream(spark, stage),
        "st_paths", "update")
    assert nb > 1, "top_paths_stream ran a single batch"
    assert max(st) == n_users, (max(st), n_users)
    # summed per-batch path emissions == the batch sliding grams
    mism = spark.sql("""
        WITH o AS (SELECT concat_ws(' ', event_type,
                     lead(event_type, 1) OVER w,
                     lead(event_type, 2) OVER w) AS path,
                     lead(event_type, 2) OVER w AS t2
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY
                     unix_micros(cast(ts as timestamp)), event_id)),
        want AS (SELECT path, count(*) AS n FROM o
                 WHERE t2 IS NOT NULL GROUP BY path),
        got AS (SELECT path, sum(n) AS n FROM st_paths GROUP BY path)
        SELECT count(*) AS bad FROM got FULL OUTER JOIN want USING (path)
        WHERE got.n IS NULL OR want.n IS NULL OR got.n <> want.n
        """).first().bad
    assert mism == 0, mism
    rows.append(("`top_paths_stream` (stateful length-3 path miner)",
                 "events", rin, nb, wall))
    per_user.append(("top_paths_stream", "a 2-type tail", st))

    out = ["""# STREAMING — measured micro-batch evidence (r8-r13)

`scripts/bench_streaming.py`: nine representative twins — stateless,
windowed-aggregate, custom-stateful, stream-stream join, the
online feature buffer, the delayed-label emitter, and the three
per-user stateful miners (SCD2 / transition matrix / path) — drained over
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
`events_pit_features` (count + exact n_events_7d checksum).

## Delayed-label emission (r10)

`training_labels_stream` is the twin whose state story is the
PENDING-ANCHOR queue: a forward-horizon label is unknowable when its
anchor arrives and ships only when the user's event-time high-water
mark passes anchor + horizon. Measured at a 3-day horizon on both
forms (the corpus spans ~30 days and the production horizon is 30
days — at that setting nearly every horizon stays open inside the
corpus by construction; the state rule is horizon-relative, so the
bound story is unchanged). The drain re-asserts every emitted label
equal to the batch `events_training_labels` row at the same horizon
(exact n_purchases_30d_fwd + time_to_next_us match, no duplicate
emissions) and that the never-emitted remainder is EXACTLY the
batch-computed open-horizon set.

| batch | state rows (users) | purchases arrived | labels emitted | pending anchors |
|---|---|---|---|---|""")
    for i, (s, a, e, pnd) in enumerate(
            zip(lab_state, arr_n, em_n, pend_series)):
        out.append(f"| {i + 1} | {s} | {a} | {e} | {pnd} |")
    out.append(f"""
Reading: pending anchors are bounded by OPEN horizons, never stream
length — the final pending count {pend_series[-1]} equals the batch
engine's count of purchases whose user high-water mark never passes
anchor + horizon ({open_h} of {n_purch} purchases), and the
mid-stream pending level sits at roughly one horizon's worth of
arrivals (~{max(pend_series[1:-1]) if lab_nb > 2 else pend_series[0]}
rows vs ~{arr_n[0]} arrivals/batch with each batch covering ~30/{N_FILES}
days of event time). Emission delay per label — batches between the
anchor's arrival and its label shipping — is min {d_min} / median
{d_med} / max {d_max}: the 3-day horizon closes within the next
~3.75-day batch for most anchors, and the max is the per-user lag
(a label ships only when ITS user's high-water mark advances, not
the global one). State rows (numRowsTotal) plateau at {n_users} —
one per user, the pit twin's shape; the pending queue lives inside
those rows' payloads.""")

    out.append(f"""
## Per-user stateful twins: state plateaus (r11)

The three stateful twins that previously had equality pytests but no
measured state series — `scd2_stream` (state payload: one open-run
record), `transition_matrix_stream` (one last-type string — the
smallest state any twin carries), `top_paths_stream` (a 2-type path
tail). Per-batch `numRowsTotal` over the same {N_FILES}-batch
chronological drain; each series must plateau at the corpus's
{n_users} users and each drain re-asserts its batch rollup equality
(SCD2 run count + exact n_events mass; transition counts equal per
(prev, next) cell; path counts equal per gram).

| batch | scd2 | transition | top_paths |
|---|---|---|---|""")
    # zip to the SHORTEST series: a stream whose progress log yields
    # fewer state samples (a batch missing stateOperators, or
    # numInputRows==0 filtering differently per query) must degrade to
    # a shorter table, not crash the report writer after the hour-long
    # drain (r11 advice)
    for i in range(min(len(series) for _, _, series in per_user)):
        out.append("| {} | {} | {} | {} |".format(
            i + 1, *(series[i] for _, _, series in per_user)))
    out.append(f"""
All three series reach {n_users} and stay flat — state is one row
per ACTIVE USER with an O(1) payload (vs the pit twin's bounded
7-day buffer payload), independent of stream length; at production
scale the state store shards by user hash across executors.""")
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
