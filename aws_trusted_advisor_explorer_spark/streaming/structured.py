"""Structured Streaming forms of the event analytics.

The reference pipeline is schedule-driven batch with no streaming
surface (SURVEY.md §2.7); this module is extension scope: the same
tumbling-window aggregate as operators/eventops.events_hourly_by_type,
expressed as an incremental streaming job, plus a stateful per-user
session counter via ``applyInPandasWithState``.

Correctness strategy: a stream over a *finite* parquet directory run
with ``trigger(availableNow=True)`` must produce exactly the batch
answer — tests/test_streaming.py asserts stream == batch, which chains
to the DuckDB oracle through the batch operator's own parity test.

Scale posture: watermark + append output keeps state bounded (late
data beyond 2h is dropped); the window aggregate shuffles once on
(window, event_type); ``applyInPandasWithState`` partitions by user —
the same key the batch sessionization shuffles on. maxFilesPerTrigger
bounds per-micro-batch input at scale.
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

SESSION_GAP_US = 1_800_000_000  # mirrors operators/eventops.SESSION_GAP_US

# Frozen models (eval-hash sets, Bloom words, NB token weights) ride the
# stream plan as literals up to this many elements — the widest-codegen
# path for fixture/test-sized models. Larger models ship as a
# SparkContext BROADCAST variable consumed by an Arrow-batched pandas
# UDF (functions/vectorized.make_broadcast_model_udf): a production eval
# set has millions of shingle hashes and an in-plan literal would blow
# up the plan string and driver memory. Both paths compute identical
# verdicts (pinned by tests/test_streaming.py's monkeypatched twins).
MODEL_LITERAL_MAX = 4096
# Past THIS cap the model is never collect()ed: the frozen relation
# stays a DataFrame and ships to the stream as a plain STREAM-STATIC
# equi-join with NO join hint. While the dim fits
# spark.sql.autoBroadcastJoinThreshold Catalyst plans a
# BroadcastHashJoin — note that a broadcast relation IS still built
# driver-side in stock Spark (subject to the 8 GB / 512M-row
# broadcast caps), so this is a bounded driver build, not zero driver
# involvement. Past the threshold each micro-batch plans a shuffled
# join (sort-merge / shuffled-hash): neither side is ever
# materialized on the driver — the only tier that survives a 1e8+-row
# model. At that scale persist/bucket the static side so the per-
# micro-batch exchange reuses it instead of re-shuffling. A production
# eval set (1e8+ shingles) cannot be collect()ed even once, so the
# broadcast-VARIABLE tier above MODEL_LITERAL_MAX is itself capped.
# Tier selection collects at most MODEL_BROADCAST_MAX + 1 model rows
# (``limit(max+1).collect()``), so driver memory is bounded by
# construction, not by hope. All three tiers compute identical
# verdicts (tests/test_streaming.py pins literal == broadcast == join
# on the same corpus, that the join tier's plan carries the stream-
# static join with no Python stage, and that with auto-broadcast
# disabled the join degrades to a shuffled join — the no-driver-
# materialization path — without changing verdicts).
MODEL_BROADCAST_MAX = 2_000_000


def _model_rows_or_none(df, cap: int):
    """Driver-bounded tier probe: the first ``cap + 1`` rows of the
    frozen-model relation, or None when the model exceeds ``cap`` (the
    caller must then use the no-collect join path). One job, never
    more than cap + 1 rows on the driver."""
    rows = df.limit(cap + 1).collect()
    return None if len(rows) > cap else rows


def _nb_sum_kernel(toks, model) -> int:
    """Exact integer token-weight sum with the unseen-token prior —
    the same arithmetic as the map-literal ``aggregate`` expression."""
    from aws_trusted_advisor_explorer_spark.operators.textops import NB_PRIOR

    return sum(model.get(t, NB_PRIOR) for t in toks)


def _lm_total_kernel(v, model) -> int:
    """Exact integer reference-LM surprise total for one document —
    the same add-one-smoothed inverse-probability arithmetic as the
    batch scorer and the map-literal tier. ``v`` is the doc's bigram
    array with its language prepended at [0] (a struct column would
    reach a pandas UDF as a DataFrame, not row dicts); ``model``
    holds the three frozen dims keyed 'lang|bigram' / 'lang|head' /
    'lang'."""
    from aws_trusted_advisor_explorer_spark.operators.textops import LM_SCALE

    lang, total = v[0], 0
    c12, ch, vl = model["c12"], model["ch"], model["vl"]
    vsz = vl.get(lang, 1)
    for bg in v[1:]:
        n1 = ch.get(f"{lang}|{bg.split(' ', 1)[0]}", 0)
        n12 = c12.get(f"{lang}|{bg}", 0)
        total += ((n1 + vsz) * LM_SCALE) // (n12 + 1)
    return total


def _bloom_probe_kernel(probes, model) -> bool:
    """All-k-bits-set membership test over the broadcast (word_idx ->
    bits) filter words; NULL probes (null text) -> False, matching the
    batch operator's CASE. Arrow hands a null array element to the UDF
    as float NaN, not None (pyarrow's pandas conversion), so the null
    check must catch NaN (p != p — IEEE self-inequality, no pandas
    import in this per-row hot path) — `p is None` never fires and
    int(nan) raises."""
    for p in probes:
        if p is None or p != p:
            return False
        p = int(p)
        if not (model.get(p // 63, 0) >> (p % 63)) & 1:
            return False
    return True

def _events_stream_schema(ts_is_nanos: bool) -> StructType:
    """The driver has shipped events.parquet with ``ts`` as both
    TIMESTAMP(NANOS) and timestamp[us] across regenerations, so the
    stream mirrors the batch loader (session.load_tables): inspect the
    footer and branch, instead of hardcoding a unit that silently
    shifts every timestamp 1000x when the layout changes."""
    from pyspark.sql.types import TimestampNTZType

    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", LongType() if ts_is_nanos else TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


def _stage_single_file(path: str) -> str:
    """FileStreamSource requires a directory; the driver testdata is a
    single parquet file -> stage a symlink dir (no data copy).
    Tolerates concurrent stagers (two processes racing to symlink) and
    stale links to deleted/regenerated dataset files: the link is
    re-pointed unless it already resolves to this path."""
    stage = os.path.join("/tmp", "spark_stream_stage",
                         path.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "part-0.parquet")
    for _ in range(2):
        try:
            os.symlink(path, link)
            break
        except FileExistsError:
            if (os.path.exists(link)
                    and os.path.realpath(link) == os.path.realpath(path)):
                break
            try:
                os.remove(link)
            except FileNotFoundError:
                pass
    return stage


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int = 1) -> DataFrame:
    """``readStream`` over the events parquet with the nanos->timestamp
    normalization the batch loader applies (session.load_tables)."""
    from aws_trusted_advisor_explorer_spark.session import (
        _nanos_timestamp_cols,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    ts_is_nanos = "ts" in _nanos_timestamp_cols(path)
    if os.path.isfile(path):
        path = _stage_single_file(path)
    raw = (spark.readStream.schema(_events_stream_schema(ts_is_nanos))
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(path))
    if ts_is_nanos:
        raw = raw.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    return raw


def hourly_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_hourly_by_type: 1-hour tumbling window,
    2-hour watermark, exact decimal value sums."""
    ev = events_stream(spark, sf_dir)
    ev = ev.withColumn("ts_ltz", F.col("ts").cast(TimestampType()))
    agg = (ev.withWatermark("ts_ltz", "2 hours")
           .groupBy(F.window("ts_ltz", "1 hour"), F.col("event_type"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv")))
    return agg.select(
        F.col("window.start").cast("timestamp_ntz").alias("hour"),
        "event_type", "n_events",
        F.col("_tv").cast("double").alias("total_value"))


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         output_mode: str = "complete",
                         timeout_s: int = 300) -> None:
    """Drain a finite stream with availableNow into an in-memory table."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {name} did not finish in {timeout_s}s")


DOCS_STREAM_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("lang", StringType()),
    StructField("text", StringType()),
    StructField("source", StringType()),
])


def documents_stream(spark: SparkSession, sf_dir: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """``readStream`` over the documents parquet (same single-file
    staging trick as events_stream)."""
    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isfile(path):
        path = _stage_single_file(path)
    return (spark.readStream.schema(DOCS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: first-seen-wins ``dropDuplicates`` on a
    content hash — the incremental twin of dedup_exact_flags' keeper
    semantics (which doc survives depends on arrival order; the
    SURVIVING TEXT SET is deterministic and equals the batch answer).

    Scale posture: state is one ~40-byte row per distinct content hash
    (sha2-256 of the text), not per document — exact dedup of an
    unbounded corpus with state linear in the number of DISTINCT
    documents. For time-bounded corpora add ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` so state expires with the
    watermark instead of growing forever."""
    docs = documents_stream(spark, sf_dir)
    return (docs.withColumn("text_hash", F.sha2(F.col("text"), 256))
            .dropDuplicates(["text_hash"])
            .select("doc_id", "lang", "text", "text_hash"))


def quality_gate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the docs_quality_gate curation pass: the same
    length + type-token-ratio filter as the batch gate
    (operators/textops.docs_quality_gate), then first-seen-wins dedup
    on the content hash. Which doc_id survives a duplicate text
    depends on arrival order; the surviving TEXT set is deterministic
    and equals the batch gate's (tested).

    Scale posture: the filter is stateless per-row codegen; dedup
    state is one ~40-byte row per distinct SURVIVING content hash —
    strictly smaller than dedup_stream's state because the quality
    filter runs first."""
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    docs = documents_stream(spark, sf_dir)
    return (docs
            .withColumn("n_tokens", F.expr(f"cast(size({toks}) as bigint)"))
            .withColumn("type_token_ratio",
                        F.expr(f"cast(size(array_distinct({toks})) as double)"
                               f" / size({toks})"))
            .filter("n_tokens >= 10 AND type_token_ratio >= 0.31")
            .withColumn("text_hash", F.sha2(F.col("text"), 256))
            .dropDuplicates(["text_hash"])
            .select("doc_id", "text", "n_tokens", "type_token_ratio",
                    "text_hash"))


def sliding_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_sliding_window: 1-hour windows hopping
    every 30 minutes via ``F.window(ts, windowDuration, slideDuration)``
    with a 2-hour watermark; exact decimal value sums. Window starts
    are emitted as epoch seconds to match the batch/oracle output.

    The batch twin's bucket arithmetic uses FLOOR semantics (the
    double-mod formula, r6 fix) to match F.window's flooring on
    pre-1970 negative epochs — both sides assign any event, either
    epoch sign, to the same two hopping windows (pinned by the
    negative-epoch twin test)."""
    ev = events_stream(spark, sf_dir)
    ev = ev.withColumn("ts_ltz", F.col("ts").cast(TimestampType()))
    agg = (ev.withWatermark("ts_ltz", "2 hours")
           .groupBy(F.window("ts_ltz", "1 hour", "30 minutes"),
                    F.col("event_type"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv")))
    return agg.select(
        F.unix_timestamp(F.col("window.start")).alias("win_start_sec"),
        "event_type", "n_events",
        F.col("_tv").cast("double").alias("total_value"))


SESSION_STATE_SCHEMA = StructType([
    StructField("n_sessions", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
])

SESSION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])


def _session_update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-user gap sessionization. The
    micro-batch's Arrow chunks MUST be concatenated before the one
    (us, event_id) sort — a user spanning multiple chunks (>
    arrow.maxRecordsPerBatch events in one batch) arrives in arbitrary
    chunk order, and per-chunk sorting would replay cross-chunk
    stragglers out of order and miscount sessions (same hazard as
    _paths_update documents). State carries (session count, last event
    time, event count) across batches."""
    (user_id,) = key
    if state.exists:
        n_sessions, last_us, n_events = state.get
    else:
        n_sessions, last_us, n_events = 0, None, 0
    chunks = [pdf for pdf in pdfs]
    if chunks:
        allpdf = (pd.concat(chunks, ignore_index=True)
                  if len(chunks) > 1 else chunks[0])
        for us in allpdf.sort_values(["us", "event_id"])["us"]:
            us = int(us)
            if last_us is None or us - last_us > SESSION_GAP_US:
                n_sessions += 1
            last_us = us
            n_events += 1
    state.update((n_sessions, last_us, n_events))
    yield pd.DataFrame({"user_id": [user_id], "n_sessions": [n_sessions],
                        "n_events": [n_events]})


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState sessionization (streaming twin of
    events_sessionize's n_sessions/n_events columns)."""
    ev = events_stream(spark, sf_dir)
    keyed = ev.select(
        "user_id", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _session_update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


LATEST_STATE_SCHEMA = StructType([
    StructField("last_us", LongType()),
    StructField("last_event_id", LongType()),
    StructField("last_event_type", StringType()),
    StructField("last_value", DoubleType()),
    StructField("n_events", LongType()),
])

LATEST_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("last_us", LongType()),
    StructField("last_event_type", StringType()),
    StructField("last_value", DoubleType()),
    StructField("n_events", LongType()),
])


def _latest_update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Stateful CDC/upsert compaction (streaming twin of
    eventops.events_latest_state): per user, keep the event with the
    highest (us, event_id) total order plus a lifetime event count —
    the snapshot a feature store serves. Late/out-of-order events
    within and across micro-batches resolve identically to the batch
    window because the comparison is on the same total order, not on
    arrival order."""
    (user_id,) = key
    if state.exists:
        last_us, last_eid, last_type, last_val, n_events = state.get
    else:
        last_us, last_eid, last_type, last_val, n_events = (
            None, None, None, None, 0)
    for pdf in pdfs:
        for r in pdf.itertuples():
            us, eid = int(r.us), int(r.event_id)
            if last_us is None or (us, eid) > (last_us, last_eid):
                last_us, last_eid = us, eid
                last_type, last_val = r.event_type, float(r.value)
            n_events += 1
    state.update((last_us, last_eid, last_type, last_val, n_events))
    yield pd.DataFrame({
        "user_id": [user_id], "last_us": [last_us],
        "last_event_type": [last_type], "last_value": [last_val],
        "n_events": [n_events]})


def latest_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState latest-state snapshot (streaming twin of
    eventops.events_latest_state). State per user is O(1) — five
    scalars — so the operator's memory is bounded by the user
    cardinality, not the event volume; at 100 TB this runs keyed on
    user_id with RocksDB state store, the canonical streaming-upsert
    layout."""
    ev = events_stream(spark, sf_dir)
    keyed = ev.select(
        "user_id", "event_id", "event_type", "value",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _latest_update,
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def decontaminate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of corpusops.docs_decontaminated: filter the
    incoming document stream against the benchmark/eval shingle set at
    ingest time — the shape that keeps a continuously-crawled corpus
    clean instead of re-sweeping it.

    The eval dimension is computed ONCE batch-side (the benchmark
    corpus is small by construction) and, up to MODEL_LITERAL_MAX
    hashes, shipped to executors inside the plan as an array literal —
    the stream-side test is then a stateless whole-stage-codegen
    ``arrays_overlap`` over the document's 5-token shingle hashes (no
    Python in the stream, no state, no shuffle). Up to
    MODEL_BROADCAST_MAX the hash SET ships as a broadcast variable
    probed by an Arrow-batched UDF — same verdicts, model never in the
    plan string. PAST that (a production benchmark suite: 1e8+
    shingles, uncollectable), the eval dim is never collect()ed:
    the doc stream explodes to (doc, hv) and stream-static LEFT
    equi-joins the eval DataFrame (auto-broadcast while it fits the
    threshold — a bounded driver-side build; a shuffled join past it,
    where neither side ever materializes whole), and a per-doc
    max(hit) group rebuilds the verdict — the join tier needs ``update`` output mode
    (per-doc aggregation state; each doc's group completes within its
    arrival micro-batch). Shingle hashes use the identical token-hash
    combinator (Dialect.shingle_hvs), so stream and batch agree
    exactly in all three tiers."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.corpusops import (
        BENCH_MOD, CONTAM_NGRAM,
    )

    toks = SD.tokens("text")
    hvs = SD.shingle_hvs(toks, CONTAM_NGRAM)
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_docs.createOrReplaceTempView("__decon_batch_docs")
    # train ONCE: checkpoint the eval aggregate BEFORE the tier probe
    # (limit cannot short-circuit a DISTINCT, so probing the raw plan
    # and then checkpointing would run the training job twice — the
    # lm_score_stream pattern)
    ev_dim = spark.sql(f"""
        SELECT DISTINCT hv FROM (
          SELECT explode({hvs}) AS hv FROM __decon_batch_docs
          WHERE doc_id % {BENCH_MOD} = 0
        )""").localCheckpoint(eager=True)
    ev_rows = _model_rows_or_none(ev_dim, MODEL_BROADCAST_MAX)

    docs = (documents_stream(spark, sf_dir)
            .filter(f"doc_id % {BENCH_MOD} <> 0")
            .withColumn("hvs", F.expr(hvs)))
    if ev_rows is None:
        # no-collect tier: the eval dim stays a DataFrame; verdict
        # via explode -> stream-static equi-join -> per-doc ANY.
        # No join hint: Catalyst broadcasts the dim while it fits
        # autoBroadcastJoinThreshold (a bounded driver-side build);
        # past it each micro-batch plans a shuffled join and the
        # model never materializes anywhere whole — the only shape
        # that survives a 1e8+-shingle eval set. explode_outer keeps
        # shingle-less AND null-text docs (they cannot be
        # contaminated — the batch operator keeps them too). The dim
        # is already checkpointed (train-once, above), so every
        # micro-batch re-joins the materialized relation.
        exploded = docs.select(
            "doc_id", "text", "lang",
            F.explode_outer("hvs").alias("hv"))
        tagged = exploded.join(
            ev_dim.withColumn("__contam", F.lit(1)),
            "hv", "left_outer")
        return (tagged
                .groupBy("doc_id")
                .agg(F.max("__contam").alias("__hit"),
                     F.first("text").alias("text"),
                     F.first("lang").alias("lang"))
                .filter(F.col("__hit").isNull())
                .select("doc_id", "text", "lang"))
    if len(ev_rows) <= MODEL_LITERAL_MAX:
        ev_lit = ", ".join(str(r.hv) for r in ev_rows) or "null"
        # coalesce: null text -> null hvs -> arrays_overlap is NULL;
        # the batch anti-join KEEPS such docs (they never reach the
        # contaminated set), so the literal tier must keep them too
        docs = docs.filter(F.expr(
            f"coalesce(NOT arrays_overlap(hvs, array({ev_lit})), true)"))
    else:
        bc = spark.sparkContext.broadcast(
            frozenset(int(r.hv) for r in ev_rows))

        # row-DROPPING model application must be mapInPandas here: a
        # scalar PythonUDF inside a streaming Filter predicate is not
        # extracted into an Arrow eval node (INTERNAL_ERROR:
        # Unevaluable in InterpretedPredicate), and Catalyst's
        # predicate pushdown re-inlines a projected verdict column
        # straight back into the filter. mapInPandas both probes the
        # broadcast set and drops matching rows in one Arrow stage —
        # the same operator shape the multimodal plane uses.
        def _drop_contaminated(batches):
            model = bc.value
            for pdf in batches:
                # null text -> null hvs -> KEEP (matches the batch
                # anti-join and the other two tiers)
                keep = pdf["hvs"].map(
                    lambda hv: hv is None
                    or not any(int(h) in model for h in hv))
                yield pdf.loc[keep, ["doc_id", "text", "lang"]]

        return docs.mapInPandas(
            _drop_contaminated, schema="doc_id bigint, text string, "
                                       "lang string")
    return docs.select("doc_id", "text", "lang")


def bloom_prefilter_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of dedup.dedup_bloom_prefilter: stateless Bloom
    membership verdict per incoming batch-source document against the
    EXISTING corpus' filter — the ingest-time shape of incremental
    dedup (cheap prefilter on the stream; only bloom_maybe docs pay an
    exact lookup downstream).

    The filter words are built ONCE batch-side with the operator's own
    SQL aggregate and, up to MODEL_LITERAL_MAX words, densified into an
    array literal shipped inside the plan — the stream-side test is
    then {k} codegen'd bit probes over the document's content
    poly-hash (no Python, no state, no shuffle). A wider filter ships
    the sparse (word_idx -> bits) dict as a broadcast variable probed
    by an Arrow-batched UDF over the SAME JVM-computed probe
    positions. A production filter (billions of bits — word count
    past MODEL_BROADCAST_MAX) is never collect()ed: the word
    relation stays a DataFrame and each of the k probes becomes a
    stateless stream-static LEFT equi-join on its word index
    (auto-broadcast while small, shuffled past the threshold)
    (absent word row == zero bits, via coalesce), k fixed-size joins,
    no aggregation state, no Python. The hash arithmetic — and every
    verdict — is identical in all three tiers (pinned by
    tests/test_streaming.py)."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.dedup import (
        BLOOM_BITS, BLOOM_SALTS, INCREMENTAL_BATCH_SOURCE, P_MOD,
    )

    n_words = BLOOM_BITS // 63 + 1
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_docs.createOrReplaceTempView("__bloom_corpus_docs")
    hv = SD.poly_hash("text")
    # one exploded probe ARRAY, not a UNION ALL branch per probe: under
    # CTE inlining each branch would re-run the interpreted per-char
    # corpus poly-hash fold — the exact k-times-the-work shape the
    # batch operator measured and removed (dedup.dedup_bloom_prefilter,
    # 2.0s -> 0.7s at sf0.1)
    probe_arr = ", ".join(
        f"(hv * {a} + {b}) % {P_MOD} % {BLOOM_BITS}"
        for a, b in BLOOM_SALTS)
    words_dim = spark.sql(f"""
        WITH k AS (SELECT {hv} AS hv FROM __bloom_corpus_docs
                   WHERE source <> '{INCREMENTAL_BATCH_SOURCE}'),
        cpos AS (SELECT explode(array({probe_arr})) AS pos FROM k)
        SELECT pos div 63 AS word_idx,
               bit_or(shiftleft(cast(1 as bigint), cast(pos % 63 as int))) AS bits
        FROM cpos GROUP BY pos div 63""")
    docs = documents_stream(spark, sf_dir)
    out = (docs
           .filter(F.col("source") == INCREMENTAL_BATCH_SOURCE)
           .withColumn("hv", F.expr(hv)))
    for i, (a, b) in enumerate(BLOOM_SALTS):
        out = out.withColumn(
            f"p{i}", F.expr(f"(hv * {a} + {b}) % {P_MOD} % {BLOOM_BITS}"))
    if n_words > MODEL_BROADCAST_MAX:
        # no-collect tier: k stateless stream-static equi-joins, one
        # per probe (no hint — Catalyst broadcasts while the word dim
        # fits autoBroadcastJoinThreshold, shuffles past it; the dim
        # is never collect()ed); a word index with no corpus bit has
        # no row, so its bits coalesce to 0 (probe fails, as it must).
        # NULL text -> NULL probe -> NULL join key -> no match -> 0.
        words_dim = words_dim.localCheckpoint(eager=True)
        checks = []
        for i in range(len(BLOOM_SALTS)):
            out = (out
                   .withColumn(f"__w{i}", F.expr(f"p{i} div 63"))
                   .join(words_dim.selectExpr(
                       f"word_idx AS __w{i}", f"bits AS __bits{i}"),
                       f"__w{i}", "left_outer"))
            checks.append(
                f"(coalesce(__bits{i}, 0L) & shiftleft(cast(1 as "
                f"bigint), cast(p{i} % 63 as int))) <> 0")
        # NULL probes make the AND NULL -> coalesce false, matching
        # the batch operator's CASE on null text
        return (out
                .withColumn("bloom_maybe",
                            F.coalesce(F.expr(" AND ".join(checks)),
                                       F.lit(False)))
                .select("doc_id", "bloom_maybe"))
    words = {int(r.word_idx): int(r.bits) for r in words_dim.collect()}
    if n_words <= MODEL_LITERAL_MAX:
        arr_lit = ", ".join(
            f"{words.get(i, 0)}L" for i in range(n_words))
        checks = " AND ".join(
            f"(element_at(__bloom_words, cast(p{i} div 63 as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(p{i} % 63 as int))) <> 0"
            for i in range(len(BLOOM_SALTS)))
        # NULL text -> NULL probes -> the AND is NULL; the batch
        # operator's CASE maps the same row to false, so coalesce to
        # keep verdicts equal
        out = (out
               .withColumn("__bloom_words", F.expr(f"array({arr_lit})"))
               .withColumn("bloom_maybe",
                           F.coalesce(F.expr(f"({checks})"), F.lit(False))))
    else:
        from aws_trusted_advisor_explorer_spark.functions.vectorized import (
            make_broadcast_model_udf,
        )

        bc = spark.sparkContext.broadcast(words)
        probe = make_broadcast_model_udf(
            bc, _bloom_probe_kernel, ret="boolean")
        out = out.withColumn("bloom_maybe", probe(F.array(
            *(F.col(f"p{i}") for i in range(len(BLOOM_SALTS))))))
    return out.select("doc_id", "bloom_maybe")


def purchase_click_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM JOIN twin of eventops.events_purchase_click_pairs:
    the click and purchase streams (two filtered readers of the events
    stream) inner-join on user_id with the 6-hour event-time range
    condition — the canonical Structured Streaming two-stream join.

    Scale posture: both sides carry a watermark and the join condition
    bounds event time in BOTH directions, so Spark can evict join
    state: a buffered click is droppable once the watermark passes its
    time + the window; an unmatched purchase once the watermark passes
    its time. State is bounded by (watermark + window) x arrival rate
    — this is why attribution runs at ingest instead of re-joining
    100 TB of history nightly. Pair set is tested equal to the batch
    join (tests/test_streaming.py)."""
    from aws_trusted_advisor_explorer_spark.operators.eventops import (
        CLICK_ATTR_WINDOW_US,
    )

    ev = events_stream(spark, sf_dir)
    secs = CLICK_ATTR_WINDOW_US // 1_000_000
    clicks = (ev.filter("event_type = 'click'")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("ts").cast(TimestampType()).alias("c_ts"))
              .withWatermark("c_ts", "12 hours"))
    purchases = (ev.filter("event_type = 'purchase'")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("p_user"),
                         F.col("ts").cast(TimestampType()).alias("p_ts"))
                 .withWatermark("p_ts", "12 hours"))
    j = purchases.join(
        clicks,
        F.expr(f"""c_user = p_user
            AND c_ts >= p_ts - interval {secs} seconds
            AND c_ts <= p_ts"""))
    return j.select(
        "purchase_id", F.col("p_user").alias("user_id"), "click_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts"))
        .alias("us_before_purchase"))


FUNNEL_STATE_SCHEMA = StructType([
    StructField("step_reached", LongType()),
    StructField("entry_us", LongType()),
])

FUNNEL_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("step_reached", LongType()),
])


def _funnel_update(key, pdfs, state: GroupState):
    """Stateful funnel progression (streaming twin of
    eventops.events_funnel): per user, advance through FUNNEL_STEPS on
    the first event of the next step STRICTLY AFTER the current step's
    entry time. State is two scalars; the micro-batch's Arrow chunks
    are concatenated BEFORE the one (us, event_id) sort (per-chunk
    sorting would replay cross-chunk stragglers out of order — the
    _paths_update hazard), matching the batch query's total order. ASSUMPTION: per-user arrival order respects event
    time ACROSS micro-batches (true for time-ordered log ingestion and
    for the staged test input) — the state machine never rewinds, so a
    step-k event arriving in an earlier batch than its step-(k-1)
    predecessor would be missed; a fully out-of-order stream needs a
    watermark-buffered variant that sorts within the allowed lateness
    before feeding the same state machine."""
    from aws_trusted_advisor_explorer_spark.operators.eventops import (
        FUNNEL_STEPS,
    )

    (user_id,) = key
    if state.exists:
        step, entry_us = state.get
    else:
        step, entry_us = 0, None
    chunks = [pdf for pdf in pdfs]
    if chunks:
        allpdf = (pd.concat(chunks, ignore_index=True)
                  if len(chunks) > 1 else chunks[0])
        for r in allpdf.sort_values(["us", "event_id"]).itertuples():
            if step >= len(FUNNEL_STEPS):
                break
            want = FUNNEL_STEPS[step]
            if r.event_type != want:
                continue
            us = int(r.us)
            if step == 0:
                # step 0 implies entry_us is None (entry_us is only
                # ever set together with step >= 1 and the machine
                # never rewinds)
                entry_us = us
                step = 1
            elif us > entry_us:
                entry_us = us
                step += 1
    state.update((step, entry_us))
    yield pd.DataFrame({"user_id": [user_id], "step_reached": [step]})


def funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState conversion funnel — O(1) state per user
    (current step + entry time), the live-funnel dashboard operator."""
    from aws_trusted_advisor_explorer_spark.operators.eventops import (
        FUNNEL_STEPS,
    )

    ev = events_stream(spark, sf_dir)
    keyed = (ev.filter(F.col("event_type").isin(*FUNNEL_STEPS))
             .select("user_id", "event_id", "event_type",
                     F.expr("unix_micros(cast(ts as timestamp))").alias("us")))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def sanitize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of textops.text_unicode_sanitize: the unicode
    hygiene pass applied at INGEST — mojibake/zero-width/control
    damage is counted and stripped before a document ever lands, which
    is where a crawl pipeline actually runs it (re-sweeping a landed
    corpus costs a full read). Shares the exact expression fragments
    with the batch builder (textops.sanitize_parts), including the
    planted per-class damage, so stream and batch agree row-for-row.

    Scale posture: stateless whole-stage-codegen projection — no
    state, no shuffle, no Python in the stream."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.textops import (
        MOJIBAKE_PCT, sanitize_parts,
    )

    raw, n_repl, n_zw, n_ctrl, cleaned = sanitize_parts(SD)
    docs = documents_stream(spark, sf_dir)
    return (docs
            .withColumn("raw", F.expr(raw))
            .selectExpr(
                "doc_id",
                "cast(length(raw) as bigint) AS n_chars_raw",
                f"cast({n_repl} as bigint) AS n_replacement",
                f"cast({n_zw} as bigint) AS n_zero_width",
                f"cast({n_ctrl} as bigint) AS n_control",
                f"cast(CASE WHEN ({n_repl}) * 100 >= "
                f"length(raw) * {MOJIBAKE_PCT} AND ({n_repl}) > 0 "
                f"THEN 1 ELSE 0 END as bigint) AS is_mojibake",
                f"{cleaned} AS clean_text"))


def nb_score_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of textops.text_nb_quality_score's SCORING
    phase: train offline, score online. The token-weight model is
    trained ONCE batch-side (textops.nb_weights_sql — the same
    relation the batch query computes) and, up to MODEL_LITERAL_MAX
    tokens, shipped to executors inside the plan as a map literal;
    each incoming document is then scored statelessly as the integer
    mean of its tokens' weights via ``transform`` + ``aggregate`` over
    the map lookup — no state, no shuffle, no Python in the stream. At
    real vocab sizes the weight dict ships as a broadcast variable
    summed by an Arrow-batched UDF (same exact integer arithmetic).
    Past MODEL_BROADCAST_MAX tokens the weight relation is never
    collect()ed: the doc stream explodes to (doc, token) and
    stream-static LEFT equi-joins the weight DataFrame (unseen token
    -> NB_PRIOR via coalesce; auto-broadcast while the vocab dim is
    small, a shuffled join past the threshold), and a per-doc sum/count group rebuilds the
    score — ``update`` output mode (per-doc aggregation state). Every
    verdict is identical across all three tiers, pinned by the
    monkeypatched twin tests."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.textops import (
        NB_PRIOR, nb_weights_sql,
    )

    # prefixed view: never clobber the session-global 'documents'
    # (an operator helper must not silently rebind what every batch
    # query reads — review finding r2)
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_docs.createOrReplaceTempView("__nb_batch_docs")
    # train ONCE: checkpoint before the tier probe (limit cannot
    # short-circuit the training aggregate — the lm_score_stream
    # pattern)
    w_dim = spark.sql(nb_weights_sql(SD, table="__nb_batch_docs")) \
        .localCheckpoint(eager=True)
    w_rows = _model_rows_or_none(w_dim, MODEL_BROADCAST_MAX)

    toks = SD.tokens("text")
    docs = documents_stream(spark, sf_dir)
    docs = (docs
            .withColumn("toks", F.expr(toks))
            .filter("size(toks) > 0"))
    if w_rows is None:
        # no-collect tier: explode to (doc, token), stream-static
        # equi-join the weight dim (no hint — auto-broadcast while it
        # fits, shuffled join past the threshold; never collect()ed;
        # already checkpointed by the train-once step above),
        # per-doc sum/count rebuild. coalesce supplies the
        # unseen-token prior, exactly like the map-literal and kernel
        # tiers.
        exploded = docs.select(
            "doc_id", F.explode("toks").alias("tok"))
        tagged = exploded.join(
            w_dim.select("tok", "weight"),
            "tok", "left_outer")
        per_doc = (tagged
                   .groupBy("doc_id")
                   .agg(F.sum(F.coalesce(
                            F.col("weight"),
                            F.lit(NB_PRIOR)).cast("long")).alias("sum_w"),
                        F.count(F.lit(1)).alias("n_tokens")))
        return per_doc.selectExpr(
            "doc_id",
            "cast(n_tokens as bigint) AS n_tokens",
            "sum_w",
            "cast(sum_w div n_tokens as bigint) AS nb_score",
            f"cast(CASE WHEN sum_w div n_tokens >= {NB_PRIOR} "
            f"THEN 1 ELSE 0 END as bigint) AS keep")
    if len(w_rows) <= MODEL_LITERAL_MAX:
        map_lit = ("map(" + ", ".join(
            f"'{r.tok}', {int(r.weight)}L" for r in w_rows) + ")"
            if w_rows else f"map('', {NB_PRIOR}L)")
        docs = docs.withColumn("sum_w", F.expr(
            f"aggregate(transform(toks, t -> "
            f"coalesce(element_at({map_lit}, t), {NB_PRIOR}L)), "
            f"cast(0 as bigint), (a, b) -> a + b)"))
    else:
        from aws_trusted_advisor_explorer_spark.functions.vectorized import (
            make_broadcast_model_udf,
        )

        bc = spark.sparkContext.broadcast(
            {r.tok: int(r.weight) for r in w_rows})
        sum_w = make_broadcast_model_udf(bc, _nb_sum_kernel, ret="long")
        docs = docs.withColumn("sum_w", sum_w(F.col("toks")))
    return (docs
            .selectExpr(
                "doc_id",
                "cast(size(toks) as bigint) AS n_tokens",
                "sum_w",
                "cast(sum_w div size(toks) as bigint) AS nb_score",
                f"cast(CASE WHEN sum_w div size(toks) >= {NB_PRIOR} "
                f"THEN 1 ELSE 0 END as bigint) AS keep"))


def lm_score_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of textops.text_lm_score_ref: reference LMs
    trained offline, documents scored online. The per-language bigram
    model (textops.lm_model_ctes — the SAME training SQL the batch
    scorer runs, over a prefixed snapshot view) ships by the standard
    three-tier ladder, sized on the dominant c12 relation: up to
    MODEL_LITERAL_MAX bigrams all three dims ride the plan as map
    literals keyed ``lang|bigram`` / ``lang|head`` / ``lang`` (token
    charset is [a-z0-9 ], so '|' never collides) and the score is one
    codegen ``aggregate`` over the doc's shingles; up to
    MODEL_BROADCAST_MAX the dims ship as ONE broadcast variable
    consumed by an Arrow-batched kernel (_lm_total_kernel, same
    integer arithmetic); past that nothing is collect()ed — the doc
    stream explodes to (doc, lang, bigram, head) and stream-static
    LEFT-joins the three dim DataFrames (un-hinted: auto-broadcast
    while small, shuffled past the threshold), with a per-(doc, lang)
    sum/count rebuild — ``update`` output mode. Unseen bigrams, heads,
    and languages coalesce to the batch scorer's exact smoothing in
    every tier."""
    from aws_trusted_advisor_explorer_spark.functions.dual import (
        SPARK as SD, id_hash_pct,
    )
    from aws_trusted_advisor_explorer_spark.operators.textops import (
        LM_REF_PCT, LM_SCALE, lm_model_ctes,
    )

    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_docs.createOrReplaceTempView("__lm_batch_docs")
    ctes = lm_model_ctes(SD, table="__lm_batch_docs")
    # train ONCE: c12 is the corpus-scale aggregate (tokenize + explode
    # + count) — checkpoint it and derive ch/vl relationally from the
    # vocab-sized result (the same aggregates lm_model_ctes defines
    # over c12 in SQL), instead of re-running the training scan three
    # times via three independent spark.sql chains
    c12 = spark.sql(f"WITH {ctes} SELECT lang, bigram, n12 FROM c12") \
        .localCheckpoint(eager=True)
    ch = (c12.selectExpr(
              "lang", f"{SD.elem(SD.split('bigram', ' '), '1')} AS w1h",
              "n12")
          .groupBy("lang", "w1h")
          .agg(F.sum("n12").cast("long").alias("n1")))
    vl = ch.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("v"))
    c12_rows = _model_rows_or_none(c12, MODEL_BROADCAST_MAX)

    is_ref = f"({id_hash_pct(SD, 'doc_id', 'lm')} < {LM_REF_PCT})"
    docs = (documents_stream(spark, sf_dir)
            .withColumn("toks", F.expr(SD.tokens("text")))
            .withColumn("bgs", F.expr(SD.shingles("toks", 2)))
            .filter("size(bgs) > 0"))

    if c12_rows is None:
        # no-collect tier: the three dims stay DataFrames (c12 is
        # already checkpointed; ch/vl checkpoint their vocab-sized
        # derivations so each micro-batch probes frozen relations)
        ch = ch.localCheckpoint(eager=True)
        vl = vl.localCheckpoint(eager=True)
        ex = (docs.select("doc_id", "lang",
                          F.explode("bgs").alias("bigram"))
              .withColumn("w1h", F.expr(
                  SD.elem(SD.split("bigram", " "), "1"))))
        j = (ex.join(c12, ["lang", "bigram"], "left_outer")
             .join(ch, ["lang", "w1h"], "left_outer")
             .join(vl, ["lang"], "left_outer"))
        per = (j.groupBy("doc_id", "lang")
               .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                    F.sum(F.expr(
                        f"((coalesce(n1, 0L) + coalesce(v, 1L)) * "
                        f"{LM_SCALE}) div (coalesce(n12, 0L) + 1L)"))
                    .cast("long").alias("total_nlp_milli")))
        return per.selectExpr(
            "doc_id", "lang", "n_bigrams", "total_nlp_milli",
            "total_nlp_milli div n_bigrams AS score_milli",
            f"{is_ref} AS is_ref")
    if len(c12_rows) <= MODEL_LITERAL_MAX:
        ch_rows, vl_rows = ch.collect(), vl.collect()
        m12 = ("map(" + ", ".join(
            f"'{r.lang}|{r.bigram}', {int(r.n12)}L" for r in c12_rows)
            + ")" if c12_rows else "map('', 0L)")
        mh = ("map(" + ", ".join(
            f"'{r.lang}|{r.w1h}', {int(r.n1)}L" for r in ch_rows)
            + ")" if ch_rows else "map('', 0L)")
        mv = ("map(" + ", ".join(
            f"'{r.lang}', {int(r.v)}L" for r in vl_rows)
            + ")" if vl_rows else "map('', 0L)")
        docs = docs.withColumn("total_nlp_milli", F.expr(
            f"aggregate(bgs, cast(0 as bigint), (a, b) -> a + "
            f"((coalesce(element_at({mh}, concat(lang, '|', "
            f"element_at(split(b, ' '), 1))), 0L) "
            f"+ coalesce(element_at({mv}, lang), 1L)) * {LM_SCALE}) "
            f"div (coalesce(element_at({m12}, concat(lang, '|', b)), "
            f"0L) + 1L))"))
    else:
        from aws_trusted_advisor_explorer_spark.functions.vectorized import (
            make_broadcast_model_udf,
        )

        bc = spark.sparkContext.broadcast({
            "c12": {f"{r.lang}|{r.bigram}": int(r.n12) for r in c12_rows},
            "ch": {f"{r.lang}|{r.w1h}": int(r.n1) for r in ch.collect()},
            "vl": {r.lang: int(r.v) for r in vl.collect()},
        })
        total = make_broadcast_model_udf(bc, _lm_total_kernel, ret="long")
        docs = docs.withColumn(
            "total_nlp_milli",
            total(F.expr("concat(array(lang), bgs)")))
    return docs.selectExpr(
        "doc_id", "lang",
        "cast(size(bgs) as bigint) AS n_bigrams",
        "total_nlp_milli",
        "total_nlp_milli div size(bgs) AS score_milli",
        f"{is_ref} AS is_ref")


def bpe_count_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of textops.text_bpe_tokenize_count: tokenizer
    trained offline, corpus priced online. The merge table is learned
    ONCE batch-side (the same batched iterative trainer the batch
    query runs, over a prefixed snapshot view) and its per-round
    disjoint pair sets ride the stream plan as array literals inside
    the greedy-apply lambda — stateless, shuffle-free, no Python in
    the stream; row-for-row equal to the batch query (pytest). A
    model past textops.BPE_LITERAL_MAX merges would ship as a
    broadcast variable + pandas UDF instead (the batch operator's
    broadcast path shows the mechanics)."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.textops import (
        _bpe_count_parts, _bpe_dict_cte, _round_set_exprs,
        ensure_bpe_merges,
    )

    # prefixed views: never clobber the session-global 'documents'
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_docs.createOrReplaceTempView("__bpe_batch_docs")
    dict_df = spark.sql(
        "WITH " + _bpe_dict_cte(SD, None, table="__bpe_batch_docs") +
        "\nSELECT token, freq, syms FROM w0").localCheckpoint(eager=True)
    dict_df.createOrReplaceTempView("__bpe_stream_dict")
    merges = ensure_bpe_merges(spark, key=("stream", sf_dir),
                               base="__bpe_stream_dict")
    round_sets = _round_set_exprs(SD, merges)
    n_chars, n_bpe = _bpe_count_parts(SD, round_sets)

    docs = documents_stream(spark, sf_dir)
    return (docs
            .withColumn("toks", F.expr(SD.tokens("text")))
            .withColumn("n_token_chars", F.expr(n_chars))
            .withColumn("n_bpe_tokens", F.expr(n_bpe))
            .selectExpr(
                "doc_id",
                "cast(size(toks) as bigint) AS n_tokens",
                "n_token_chars",
                "n_bpe_tokens",
                "CASE WHEN n_bpe_tokens = 0 THEN cast(NULL as double) "
                "ELSE cast(n_token_chars as double) / n_bpe_tokens "
                "END AS chars_per_bpe_token"))


PATHS_STATE_SCHEMA = StructType([
    StructField("tail", StringType()),   # last PATH_N-1 types, space-joined
])

PATHS_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("path", StringType()),
    StructField("n", LongType()),
])


def _paths_update(key, pdfs, state: GroupState):
    """Stateful sliding type-gram emitter (streaming twin of
    eventops.events_top_paths' gram relation): per user, keep only the
    last PATH_N-1 event types as state and emit each completed
    length-PATH_N path with its in-batch count. Same in-order-per-user
    arrival assumption as _funnel_update (documented there); events
    replay in (us, event_id) order within each batch."""
    from aws_trusted_advisor_explorer_spark.operators.eventops import PATH_N

    (user_id,) = key
    tail = state.get[0].split(" ") if state.exists and state.get[0] else []
    counts: dict = {}
    # sort across ALL of this group's chunks: a >maxRecordsPerBatch
    # user spans several Arrow chunks and per-chunk sorting would
    # process cross-chunk stragglers out of order
    pdf = pd.concat(list(pdfs)).sort_values(["us", "event_id"])
    for r in pdf.itertuples():
        tail.append(r.event_type)
        if len(tail) == PATH_N:
            g = " ".join(tail)
            counts[g] = counts.get(g, 0) + 1
            tail = tail[1:]
    state.update((" ".join(tail),))
    if counts:
        yield pd.DataFrame({
            "user_id": [user_id] * len(counts),
            "path": list(counts),
            "n": list(counts.values()),
        })


def top_paths_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState path-gram mining: O(PATH_N-1) state per
    user, each micro-batch emits its completed paths with counts —
    the downstream top-k is a rollup over this relation (the test
    aggregates it and matches the batch gram counts exactly)."""
    ev = events_stream(spark, sf_dir)
    keyed = ev.select(
        "user_id", "event_id", "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _paths_update,
        outputStructType=PATHS_OUTPUT_SCHEMA,
        stateStructType=PATHS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


TRANSITION_STATE_SCHEMA = StructType([
    StructField("last_type", StringType()),  # the one previous event type
])

TRANSITION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("prev_type", StringType()),
    StructField("next_type", StringType()),
    StructField("n", LongType()),
])


def _transition_update(key, pdfs, state: GroupState):
    """Stateful 2-gram transition emitter (streaming twin of
    eventops.events_transition_matrix's count relation): per user, ONE
    string of state — the last event type — and each micro-batch emits
    its completed prev→next transitions with in-batch counts; the
    matrix (and its row-normalized rates) is a rollup over this
    relation, exactly as the length-{3}-path miner's top-k rolls up
    _paths_update. Same in-order-per-user arrival assumption as
    _funnel_update; chunks concatenated BEFORE the one sort (the
    _session_update hazard)."""
    (user_id,) = key
    last = state.get[0] if state.exists else None
    counts: dict = {}
    pdf = pd.concat(list(pdfs)).sort_values(["us", "event_id"])
    for r in pdf.itertuples():
        if last is not None:
            k2 = (last, r.event_type)
            counts[k2] = counts.get(k2, 0) + 1
        last = r.event_type
    state.update((last,))
    if counts:
        yield pd.DataFrame({
            "user_id": [user_id] * len(counts),
            "prev_type": [a for a, _ in counts],
            "next_type": [b for _, b in counts],
            "n": list(counts.values()),
        })


def transition_matrix_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState journey-transition mining: O(1) state per
    user (the last event type — the smallest state any twin carries),
    each micro-batch emits its completed prev→next transitions with
    counts; the matrix report is a rollup over this relation (the test
    aggregates across batches and matches the batch matrix exactly,
    rates re-derived from the summed counts)."""
    ev = events_stream(spark, sf_dir)
    keyed = ev.select(
        "user_id", "event_id", "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _transition_update,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def _emb_stream_schema() -> StructType:
    from pyspark.sql.types import ArrayType, FloatType, IntegerType

    return StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])


def range_search_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join retrieval (the online-query serving shape no
    other twin demonstrates): a stream of query vectors equi-joins the
    STATIC sign-LSH-bucketed corpus on the bucket id, exact cosine
    within the bucket, radius filter — the streaming twin of
    similarity.knn_range_search. The static side is planned once (the
    bucketed corpus is the serving index; at scale it is the
    cluster-partitioned table IVF writes), each micro-batch of queries
    probes only its buckets, and there is no streaming state at all —
    the join is stateless because the static side never changes
    mid-query. Tested row-equal to the batch radius search."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.similarity import (
        QUERY_MOD, RANGE_COS_MIN, _bucket_expr, _norm,
    )

    bucket = _bucket_expr(SD, "embedding")
    nrm = _norm(SD)
    # c_nrm/q_nrm > 0: the zero-norm exclusion every batch cosine form
    # applies (similarity._vec_base) — without it the division NaNs
    static = (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
              .where(F.expr(f"vec_id % {QUERY_MOD} <> 0"))
              .selectExpr("vec_id AS neighbor_id",
                          "embedding AS c_emb",
                          f"{nrm} AS c_nrm",
                          f"{bucket} AS bucket")
              .where("c_nrm > 0"))
    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isfile(path):
        path = _stage_single_file(path)
    queries = (spark.readStream.schema(_emb_stream_schema())
               .option("maxFilesPerTrigger", 1).parquet(path)
               .where(F.expr(f"vec_id % {QUERY_MOD} = 0"))
               .selectExpr("vec_id AS query_id",
                           "embedding AS q_emb",
                           f"{nrm} AS q_nrm",
                           f"{bucket} AS bucket")
               .where("q_nrm > 0"))
    cos = SD.dot("q_emb", "c_emb")
    return (queries.join(static, "bucket")
            .withColumn("cosine", F.expr(f"({cos}) / (q_nrm * c_nrm)"))
            .where(F.col("cosine") >= RANGE_COS_MIN)
            .select("query_id", "neighbor_id", "cosine"))


def interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of eventops.events_interval_join — and the
    demonstration of WHY the bucketized form matters beyond plan
    shape: a stream-static join in Spark must be an equi-join (a
    naive range predicate would be a nested-loop over the static side
    per micro-batch), so mapping both sides to epoch buckets is what
    makes keyless interval attribution STREAMABLE at all. The static
    side is the exploded (incident, bucket) window index (<= 2 rows
    per incident, planned once); each arriving purchase owns exactly
    one bucket, probes it, post-filters the exact [ws, ws+DUR) range
    inside the join stage, and a per-purchase sum/min group rebuilds
    the attribution — ``update`` output mode. Row-equal to the batch
    operator (and therefore to its naive range-join oracle)."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.eventops import (
        INCIDENT_DUR_US, INTERVAL_BUCKET_US,
    )
    from aws_trusted_advisor_explorer_spark.session import (
        _nanos_timestamp_cols,
    )

    eus = SD.epoch_us("ts")
    # the static side needs the same TIMESTAMP(NANOS) normalization as
    # the batch loader / events_stream: under nanosAsLong a nanos file
    # reads ts as LONG and epoch_us would misread nanos as seconds,
    # silently desyncing the bucket keys from the stream side. Set the
    # conf HERE, not only in events_stream (called later) — on a fresh
    # session the static read below would otherwise reject the nanos
    # file outright ("Illegal Parquet type")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    static = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        static = static.withColumn(c, F.expr(
            f"CAST(timestamp_micros({c} DIV 1000) AS TIMESTAMP_NTZ)"))
    static = (static
              .where("event_type = 'error'")
              .selectExpr("event_id AS incident_id", f"{eus} AS ws")
              .selectExpr(
                  "incident_id", "ws",
                  f"explode(sequence(ws div {INTERVAL_BUCKET_US}, "
                  f"(ws + {INCIDENT_DUR_US} - 1) div "
                  f"{INTERVAL_BUCKET_US})) AS bkt"))
    purchases = (events_stream(spark, sf_dir)
                 .where("event_type = 'purchase'")
                 .selectExpr("event_id AS purchase_id",
                             "value AS purchase_value",
                             f"{eus} AS pu",
                             f"{eus} div {INTERVAL_BUCKET_US} AS bkt"))
    hits = (purchases.join(static, "bkt")
            .where(F.expr(f"pu >= ws AND pu < ws + {INCIDENT_DUR_US}")))
    return (hits.groupBy("purchase_id", "purchase_value")
            .agg(F.count(F.lit(1)).cast("long").alias("n_incidents"),
                 F.min("incident_id").cast("long")
                 .alias("first_incident_id")))


def anomaly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online anomaly detection (train the control chart offline,
    detect online): the per-type hourly count statistics (H hours,
    S = Σn, Q = Σn²) are computed ONCE batch-side from the registered
    ``events`` history and broadcast-joined onto the live stream
    BEFORE the windowed aggregation (stream-static joins must precede
    a complete-mode aggregate); each finished hour window's count then
    scores the same exact integer rational z² = (nH−S)²·1e4/(HQ−S²)
    as the batch events_hourly_anomaly — bit-identical flags, no
    double accumulation. The stats columns ride the groupBy keys
    (constant per type) so z² is a pure post-aggregate projection.

    Precondition: the batch ``events`` view is registered
    (session.load_tables) — the frozen-stats training side, exactly
    like nb_score_stream's weight training."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.eventops import (
        ANOM_MIN_HOURS, ANOM_Z2_MIN, ANOM_Z2_SCALE, anomaly_stats_ctes,
    )

    stats = spark.sql(
        "WITH " + anomaly_stats_ctes(SD) +
        "\nSELECT event_type, h, s, q FROM stats").localCheckpoint(eager=True)

    ev = events_stream(spark, sf_dir)
    ev = ev.withColumn("ts_ltz", F.col("ts").cast(TimestampType()))
    joined = ev.join(F.broadcast(stats), "event_type")
    agg = (joined.withWatermark("ts_ltz", "2 hours")
           .groupBy(F.window("ts_ltz", "1 hour"), "event_type",
                    "h", "s", "q")
           .agg(F.count(F.lit(1)).alias("n")))
    num = "(n * h - s) * (n * h - s)"
    den = "(h * q - s * s)"
    return (agg.selectExpr(
        "cast(window.start as timestamp_ntz) AS hour",
        "event_type", "n AS n_events", "h", "s", "q",
        f"(({num}) * {ANOM_Z2_SCALE}) div ({den}) AS z2_scaled_1e4")
        .where(f"h >= {ANOM_MIN_HOURS} AND {den} > 0 "
               f"AND z2_scaled_1e4 >= {ANOM_Z2_MIN}")
        .select("event_type", "hour", "n_events", "z2_scaled_1e4"))


def chunk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming chunker: the fixed-size overlapping splitter applied
    at INGEST (chunk documents as they land, before the corpus is a
    corpus) — a stateless 1-to-many projection (tokenize → explode of
    per-doc window indexes → slice) sharing the chunk-geometry
    expressions with the batch docs_chunking
    (corpusops.chunk_parts), so stream and batch emit identical
    chunks; tested row-equal."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators.corpusops import (
        chunk_parts,
    )

    n_chunks, start, piece = chunk_parts(SD)
    docs = documents_stream(spark, sf_dir)
    return (docs
            .withColumn("toks", F.expr(SD.tokens("text")))
            .withColumn("k", F.explode(F.expr(
                SD.seq("0", f"({n_chunks}) - 1"))))
            .withColumn("chunk_toks", F.expr(piece))
            .selectExpr(
                "doc_id", "k AS chunk_idx",
                f"cast({start} as bigint) AS start_pos",
                f"cast({SD.arr_len('chunk_toks')} as bigint) AS n_chunk_tokens",
                f"{SD.arr_join('chunk_toks')} AS chunk_text"))


def hll_registers_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the sketch plane's HLL register build
    (operators/sketchops.hll_registers_sql): the register table
    maintained as a NATIVE streaming aggregation —
    ``groupBy(event_type, bucket).agg(max(rho))`` in complete mode.

    This is the canonical "sketch as streaming state" shape: state is
    FIXED at groups x HLL_M integers no matter how long the stream runs
    (no watermark needed — the state cannot grow), and max() merges
    associatively so each micro-batch folds into the registers exactly
    the way the batch merge audit (sketchops.events_hll_merge) proves
    for day slices. A distinct-count estimate at any moment is one
    {HLL_M}-row scan of this state. Tested register-identical to the
    batch build (tests/test_streaming.py)."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK as SD
    from aws_trusted_advisor_explorer_spark.operators import sketchops as SK

    ev = (events_stream(spark, sf_dir)
          .where("user_id IS NOT NULL")
          .selectExpr("event_type", f"{SK._mix(SD, 'user_id')} AS hv")
          .selectExpr("event_type",
                      f"hv % {SK.HLL_M} AS bucket",
                      f"hv div {SK.HLL_M} AS w")
          .selectExpr("event_type", "bucket",
                      f"CASE WHEN w = 0 THEN {SK.HLL_RHO_MAX} "
                      f"ELSE {SK.HLL_W + 1} - length(bin(w)) END AS rho"))
    return ev.groupBy("event_type", "bucket").agg(F.max("rho").alias("rho"))


DISORDER_STATE_SCHEMA = StructType([
    StructField("high_water", LongType()),
    StructField("n_events", LongType()),
    StructField("n_late", LongType()),
    StructField("max_lateness_us", LongType()),
    StructField("max_event_id", LongType()),
    StructField("n_id_regressions", LongType()),
])

DISORDER_OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_events", LongType()),
    StructField("n_late", LongType()),
    StructField("max_lateness_us", LongType()),
    StructField("n_id_regressions", LongType()),
])


def _disorder_update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    """Stateful lateness audit (streaming twin of
    eventops.events_disorder_audit): per event type, carry the running
    event-time high-water mark and count arrivals behind it — the
    EXACT bookkeeping Structured Streaming's own watermark tracker
    performs, surfaced as a queryable relation. Chunks are
    concatenated BEFORE the one event_id sort (the _session_update
    hazard: a type spanning multiple Arrow chunks arrives in arbitrary
    chunk order, and per-chunk replay would misorder cross-chunk
    stragglers). Within a batch the arrival order is event_id (the
    monotone ingest sequence); across batches the delivery order IS
    the arrival order — equal to the batch audit whenever files land
    in ingest order (the landed layout; the multi-batch test splits
    that way). Because that cross-batch assumption is the ONE thing
    this audit cannot reconstruct after the fact, the state also
    carries the max event_id consumed so far and counts ingest-order
    regressions (an event arriving in a LATER micro-batch with a
    SMALLER event_id than one already folded in): when
    ``n_id_regressions`` is non-zero the source delivered files out of
    ingest order and ``n_late`` is an UNDERCOUNT relative to the batch
    oracle — detectable, not silently divergent (ADVICE r7)."""
    (event_type,) = key
    if state.exists:
        hw, n_events, n_late, worst, max_eid, n_regr = state.get
    else:
        hw, n_events, n_late, worst, max_eid, n_regr = (
            None, 0, 0, 0, None, 0)
    chunks = [pdf for pdf in pdfs]
    if chunks:
        allpdf = (pd.concat(chunks, ignore_index=True)
                  if len(chunks) > 1 else chunks[0])
        for r in allpdf.sort_values("event_id").itertuples():
            eid = int(r.event_id)
            # STRICT <: an exact re-delivered event_id (at-least-once
            # duplicate) is a different anomaly class — it makes
            # n_late OVERcount, not undercount — and is not folded
            # into the out-of-ORDER counter (dedupe duplicates
            # upstream; dedup_stream is the first-seen-wins tool)
            if max_eid is not None and eid < max_eid:
                n_regr += 1
            max_eid = eid if max_eid is None else max(max_eid, eid)
            ep = int(r.ep)
            hw = ep if hw is None else max(hw, ep)
            if ep < hw:
                n_late += 1
                worst = max(worst, hw - ep)
            n_events += 1
    state.update((hw, n_events, n_late, worst, max_eid, n_regr))
    yield pd.DataFrame({
        "event_type": [event_type], "n_events": [n_events],
        "n_late": [n_late], "max_lateness_us": [worst],
        "n_id_regressions": [n_regr]})


def disorder_audit_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState lateness audit (streaming twin of
    eventops.events_disorder_audit — THE measurement that sizes
    ``withWatermark`` delays, run AT INGEST instead of on a landed
    sample). State is six longs per event type — fixed size no
    matter how long the stream runs; per-batch work sorts only that
    batch's rows per type. ``n_id_regressions`` > 0 flags out-of-order
    micro-batch delivery (see :func:`_disorder_update`), the regime
    where ``n_late`` undercounts the batch oracle.

    COMPATIBILITY NOTE (state-schema evolution): r8 grew
    ``DISORDER_STATE_SCHEMA`` from 4 to 6 fields (the ingest-order
    regression counter pair). ``applyInPandasWithState`` state schemas
    are checkpoint-incompatible — a consumer resuming this query from
    a pre-r8 checkpoint fails at state deserialization and must start
    a NEW checkpoint directory (replaying the source, as for any
    stateful-schema break; the reference framework likewise treats
    stateful schema evolution as a breaking change). The repo's own
    availableNow test drains use fresh checkpoints per run and are
    unaffected."""
    ev = events_stream(spark, sf_dir)
    keyed = ev.select(
        "event_type", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ep"))
    return keyed.groupBy("event_type").applyInPandasWithState(
        _disorder_update,
        outputStructType=DISORDER_OUTPUT_SCHEMA,
        stateStructType=DISORDER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


SCD2_STATE_SCHEMA = StructType([
    StructField("cur_state", StringType()),
    StructField("valid_from_us", LongType()),
    StructField("run_no", LongType()),
    StructField("n_events", LongType()),
])

SCD2_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("state", StringType()),
    StructField("run_no", LongType()),
    StructField("valid_from_us", LongType()),
    StructField("valid_to_us", LongType()),
    StructField("n_events", LongType()),
    StructField("is_current", LongType()),
])


def _scd2_update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    """Stateful SCD Type-2 compaction (streaming twin of
    eventops.events_scd2_history): per user, carry the OPEN run's
    (state, valid_from, run number, event count) — four fields, fixed
    size no matter how long the stream runs — and emit a closed
    interval row the moment the state changes, exactly what a
    dimension-history sink wants at ingest instead of as a nightly
    window job. Chunks concatenate BEFORE the one (ep, event_id) sort
    (the _session_update hazard); cross-batch correctness needs files
    delivered in event-time order, the landed layout (same contract
    the other stateful twins document). Each batch also re-emits the
    open run's running snapshot (is_current=1), so in update mode the
    last emission per (user, run_no) IS the batch relation's row."""
    (user_id,) = key
    if state.exists:
        cur, vfrom, run_no, n_ev = state.get
    else:
        cur, vfrom, run_no, n_ev = None, None, 0, 0
    out_rows = []
    chunks = [pdf for pdf in pdfs]
    if chunks:
        allpdf = (pd.concat(chunks, ignore_index=True)
                  if len(chunks) > 1 else chunks[0])
        for r in allpdf.sort_values(["ep", "event_id"]).itertuples():
            ep, et = int(r.ep), r.event_type
            if cur is None:
                cur, vfrom, run_no, n_ev = et, ep, 1, 1
            elif et == cur:
                n_ev += 1
            else:
                out_rows.append((user_id, cur, run_no, vfrom, ep,
                                 n_ev, 0))  # closed interval
                cur, vfrom, run_no, n_ev = et, ep, run_no + 1, 1
    state.update((cur, vfrom, run_no, n_ev))
    if cur is not None:
        out_rows.append((user_id, cur, run_no, vfrom, None, n_ev, 1))
    yield pd.DataFrame(out_rows, columns=[
        "user_id", "state", "run_no", "valid_from_us", "valid_to_us",
        "n_events", "is_current"])


def scd2_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState SCD Type-2 history (streaming twin of
    eventops.events_scd2_history): closed validity intervals emit the
    moment a user's state changes; the open run re-emits its running
    snapshot each batch. State is one open-run record per user."""
    ev = events_stream(spark, sf_dir)
    keyed = ev.select(
        "user_id", "event_id", "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ep"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _scd2_update,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def _half_up_cents(v: float) -> int:
    """value -> integer cents with HALF-AWAY-FROM-ZERO ties, the
    rounding cast(double as decimal(18,2)) applies in Spark and
    DuckDB alike; shared by the pit kernel's state and emissions."""
    import math

    return int(math.copysign(math.floor(abs(v) * 100 + 0.5), v))


PIT_STATE_SCHEMA = StructType([
    StructField("us", ArrayType(LongType())),
    StructField("typ", ArrayType(StringType())),
    StructField("cents", ArrayType(LongType())),
])

PIT_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("purchase_id", LongType()),
    StructField("label_value", DoubleType()),
    StructField("n_clicks_1d", LongType()),
    StructField("n_views_1d", LongType()),
    StructField("click_value_1d", DoubleType()),
    StructField("n_events_7d", LongType()),
    StructField("n_purchases_7d", LongType()),
    StructField("purchase_value_7d", DoubleType()),
])


def _pit_update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Online point-in-time features (streaming twin of
    eventops.events_pit_features — the on/offline feature-store
    consistency story: the serving path must compute EXACTLY what the
    batch training join computed, or the model trains on features it
    never sees in production). State per user is the rolling 7-day
    event buffer (us, type, integer cents), evicted by event time as
    the stream's high-water mark advances — bounded by the window, not
    the stream length. A purchase's features are computed from the
    buffer BEFORE the purchase itself is appended, restricted to
    strictly-earlier microseconds — same-microsecond peers are
    excluded exactly as the batch frame's `1 PRECEDING` bound does.
    Chunks concatenate BEFORE the one (us, event_id) sort (the
    _session_update hazard); cross-batch correctness needs files
    delivered in event-time order (the landed layout, the other
    stateful twins' contract). Value sums stay integer cents in state
    and convert once at emission (cents/100 correctly rounded ==
    the batch decimal->double cast)."""
    from aws_trusted_advisor_explorer_spark.operators.eventops import (
        PIT_LONG_US, PIT_SHORT_US,
    )

    (user_id,) = key
    if state.exists:
        b_us, b_typ, b_cents = (list(x) for x in state.get)
    else:
        b_us, b_typ, b_cents = [], [], []
    out = []
    chunks = [pdf for pdf in pdfs]
    if chunks:
        allpdf = (pd.concat(chunks, ignore_index=True)
                  if len(chunks) > 1 else chunks[0])
        for r in allpdf.sort_values(["us", "event_id"]).itertuples():
            us, typ = int(r.us), r.event_type
            # NULL value contributes nothing to a conditional decimal
            # sum in the batch form; 0 cents is the identical effect
            # (the row still COUNTS toward its type's frame count).
            # Rounding is HALF-AWAY-FROM-ZERO to match the batch
            # cast(value as decimal(18,2)) in BOTH engines — python's
            # round() is half-EVEN and would diverge on exact .xx5
            # doubles (0.125 -> batch 0.13, round() 0.12)
            cents = (0 if pd.isna(r.value)
                     else _half_up_cents(float(r.value)))
            if typ == "purchase":
                lo1, lo7, hi = us - PIT_SHORT_US, us - PIT_LONG_US, us - 1
                n_c1 = n_v1 = c_cents = n_e7 = n_p7 = p_cents = 0
                for bu, bt, bc in zip(b_us, b_typ, b_cents):
                    if bu > hi or bu < lo7:
                        continue
                    n_e7 += 1
                    if bt == "purchase":
                        n_p7 += 1
                        p_cents += bc
                    if bu >= lo1:
                        if bt == "click":
                            n_c1 += 1
                            c_cents += bc
                        elif bt == "view":
                            n_v1 += 1
                # label_value passes through as NULL (not NaN) for a
                # NULL-valued purchase — the batch column is NULL and
                # NaN diverges under IS NULL filters and JSON sinks
                out.append((user_id, int(r.event_id),
                            None if pd.isna(r.value) else float(r.value),
                            n_c1, n_v1, c_cents / 100.0,
                            n_e7, n_p7, p_cents / 100.0))
            b_us.append(us)
            b_typ.append(typ)
            b_cents.append(cents)
        # event-time eviction: nothing older than the high-water mark
        # minus the widest lookback can enter a future frame
        cut = max(b_us) - PIT_LONG_US
        keep = [i for i, u in enumerate(b_us) if u >= cut]
        b_us = [b_us[i] for i in keep]
        b_typ = [b_typ[i] for i in keep]
        b_cents = [b_cents[i] for i in keep]
    state.update((b_us, b_typ, b_cents))
    yield pd.DataFrame(out, columns=[f.name for f in PIT_OUTPUT_SCHEMA])


def pit_features_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState point-in-time features (streaming twin
    of eventops.events_pit_features): each purchase's leakage-safe
    trailing-window features emit the moment the purchase arrives —
    the online serving path of the feature store whose offline
    training path is the batch query; tested feature-identical."""
    ev = events_stream(spark, sf_dir)
    keyed = ev.select(
        "user_id", "event_id", "event_type", "value",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _pit_update,
        outputStructType=PIT_OUTPUT_SCHEMA,
        stateStructType=PIT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


LABELS_STATE_SCHEMA = StructType([
    StructField("p_us", ArrayType(LongType())),      # pending purchases
    StructField("p_id", ArrayType(LongType())),
    StructField("p_val", ArrayType(DoubleType())),   # NaN = NULL value
    StructField("ptimes", ArrayType(LongType())),    # purchase times <= H old
])

LABELS_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("purchase_id", LongType()),
    StructField("label_value", DoubleType()),
    StructField("n_purchases_30d_fwd", LongType()),
    StructField("label_repeat", LongType()),
    StructField("time_to_next_us", LongType()),
])


def _make_labels_update(horizon_us: int):
    """Bind the horizon into the state-update closure (the default is
    the batch query's 30-day LABEL_HORIZON_US; measurement drains pass
    a shorter horizon so the corpus span exceeds it and horizons
    actually close — scripts/bench_streaming.py)."""

    def _labels_update(key, pdfs, state):
        return _labels_update_impl(key, pdfs, state, horizon_us)

    return _labels_update


def _labels_update_impl(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                        state: GroupState,
                        horizon_us: int) -> Iterator[pd.DataFrame]:
    """The DELAYED-LABEL problem at ingest (streaming twin of
    eventops.events_training_labels): a forward-horizon label is not
    knowable when its anchor arrives — it FINALIZES when the user's
    event-time high-water mark passes anchor + horizon, and only then
    may it ship to training (emitting earlier would train on
    provisional negatives that flip positive). State per user: the
    pending (unresolved-horizon) purchases plus the purchase-time
    buffer of the last horizon window (both event-time-bounded — the
    pit twin's eviction rule, so state is O(horizon activity), not
    stream length). A pending purchase resolves exactly when
    max_us > p_us + H: ordered delivery means every future event has
    us >= max_us, so nothing can still land inside (p_us, p_us + H].
    Purchases whose horizon is still open when a finite drain ends
    are deliberately NOT emitted — the stream cannot know the future;
    the equality test covers the closed-horizon subset and accounts
    for the pending remainder."""
    import math

    LABEL_HORIZON_US = horizon_us

    (user_id,) = key
    if state.exists:
        p_us, p_id, p_val, ptimes = (list(x) for x in state.get)
    else:
        p_us, p_id, p_val, ptimes = [], [], [], []
    out = []
    chunks = [pdf for pdf in pdfs]
    if chunks:
        allpdf = (pd.concat(chunks, ignore_index=True)
                  if len(chunks) > 1 else chunks[0])
        purch = allpdf[allpdf["event_type"] == "purchase"]
        max_us = int(allpdf["us"].max())
        for r in purch.sort_values(["us", "event_id"]).itertuples():
            p_us.append(int(r.us))
            p_id.append(int(r.event_id))
            # label_value passes through RAW (the batch column is the
            # raw double); NaN is the in-array NULL sentinel — a real
            # money value is never NaN
            p_val.append(math.nan if pd.isna(r.value)
                         else float(r.value))
            ptimes.append(int(r.us))
        # resolve every pending purchase whose horizon has CLOSED
        keep = []
        for i, us in enumerate(p_us):
            if max_us > us + LABEL_HORIZON_US:
                fwd = sorted(t for t in ptimes
                             if us + 1 <= t <= us + LABEL_HORIZON_US)
                out.append((user_id, p_id[i],
                            None if math.isnan(p_val[i]) else p_val[i],
                            len(fwd), 1 if fwd else 0,
                            fwd[0] - us if fwd else None))
            else:
                keep.append(i)
        p_us = [p_us[i] for i in keep]
        p_id = [p_id[i] for i in keep]
        p_val = [p_val[i] for i in keep]
        # purchase-time buffer: the oldest pending anchor's frame
        # starts strictly after its own us >= max_us - H, so times
        # before max_us - H can never enter a future frame
        ptimes = [t for t in ptimes if t >= max_us - LABEL_HORIZON_US]
    state.update((p_us, p_id, p_val, ptimes))
    yield pd.DataFrame(out, columns=[f.name for f in LABELS_OUTPUT_SCHEMA])


def training_labels_stream(spark: SparkSession, sf_dir: str,
                           horizon_us: int | None = None) -> DataFrame:
    """applyInPandasWithState delayed-label emission (streaming twin
    of eventops.events_training_labels): each purchase's forward-
    horizon label ships the moment the user's event-time high-water
    mark closes its horizon — the at-ingest labeler whose offline
    twin is the batch query; closed-horizon labels are pinned equal
    to batch, open-horizon anchors stay pending by design.
    ``horizon_us`` overrides the 30-day default (measurement drains
    pair it with the batch form's matching override)."""
    from aws_trusted_advisor_explorer_spark.operators.eventops import (
        LABEL_HORIZON_US,
    )

    ev = events_stream(spark, sf_dir)
    keyed = ev.select(
        "user_id", "event_id", "event_type", "value",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_labels_update(
            LABEL_HORIZON_US if horizon_us is None else horizon_us),
        outputStructType=LABELS_OUTPUT_SCHEMA,
        stateStructType=LABELS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
