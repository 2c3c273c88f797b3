"""Streaming twins must equal their batch operators on a finite input:
availableNow drains the whole events directory, so stream == batch,
and the batch side is already DuckDB-oracled (test_extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
from aws_trusted_advisor_explorer_spark.operators import eventops
from aws_trusted_advisor_explorer_spark.streaming import structured
from tests.conftest import SF_DIR, canonicalize


def test_hourly_counts_stream_equals_batch(spark):
    structured.run_stream_to_memory(
        structured.hourly_counts_stream(spark, SF_DIR), "hourly_stream")
    got = canonicalize(spark.table("hourly_stream").toPandas())
    want = canonicalize(spark.sql(eventops.events_hourly_by_type(SPARK)).toPandas())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want), "stream result != batch result"


def test_dedup_stream_equals_batch_distinct(spark):
    """Streaming first-seen-wins dedup: the surviving TEXT set equals
    the batch distinct set (which doc_id survives per text depends on
    arrival order, so compare the content sets, not keeper ids)."""
    structured.run_stream_to_memory(
        structured.dedup_stream(spark, SF_DIR), "dedup_stream",
        output_mode="append")
    got = spark.table("dedup_stream")
    n_rows = got.count()
    assert n_rows == got.select("text_hash").distinct().count()
    want = spark.sql("SELECT count(DISTINCT text) AS n FROM documents").first().n
    assert n_rows == want
    got_texts = {r.text for r in got.select("text").collect()}
    want_texts = {r.text for r in
                  spark.sql("SELECT DISTINCT text FROM documents").collect()}
    assert got_texts == want_texts


def test_sessionize_stream_equals_batch(spark):
    structured.run_stream_to_memory(
        structured.sessionize_stream(spark, SF_DIR), "sessions_stream",
        output_mode="update")
    # update mode emits one row per (user, micro-batch); final state per
    # user = last emission; with maxFilesPerTrigger=1 over a single
    # parquet dir there may be several batches — take the max counters.
    got = (spark.table("sessions_stream")
           .groupBy("user_id")
           .agg({"n_sessions": "max", "n_events": "max"})
           .withColumnRenamed("max(n_sessions)", "n_sessions")
           .withColumnRenamed("max(n_events)", "n_events"))
    got_pd = canonicalize(got.toPandas())
    want = canonicalize(
        spark.sql(eventops.events_sessionize(SPARK))
        .select("user_id", "n_sessions", "n_events").toPandas())
    assert got_pd.equals(want), "stateful sessionization != batch"


def test_quality_gate_stream_equals_batch(spark):
    """Streaming quality gate: identical filter semantics to the batch
    gate; surviving TEXT set equals the batch gate's survivor texts
    (keeper doc_id is arrival-order-dependent, content set is not)."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import textops

    structured.run_stream_to_memory(
        structured.quality_gate_stream(spark, SF_DIR), "qgate_stream",
        output_mode="append")
    got = spark.table("qgate_stream")
    assert got.count() == got.select("text_hash").distinct().count()
    got_texts = {r.text for r in got.select("text").collect()}
    batch = spark.sql(textops.docs_quality_gate(SPARK))
    want_texts = {
        r.text for r in
        batch.join(spark.table("documents"), "doc_id")
        .select("text").collect()}
    assert got_texts == want_texts


def test_sliding_counts_stream_equals_batch(spark):
    """Streaming hopping-window aggregate == the batch/oracle
    events_sliding_window rows (exact decimal sums)."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import eventops
    from tests.conftest import canonicalize

    structured.run_stream_to_memory(
        structured.sliding_counts_stream(spark, SF_DIR), "sliding_stream",
        output_mode="complete")
    got = canonicalize(spark.table("sliding_stream").toPandas())
    want = canonicalize(spark.sql(eventops.events_sliding_window(SPARK))
                        .toPandas())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)


def test_latest_state_stream_equals_batch(spark):
    structured.run_stream_to_memory(
        structured.latest_state_stream(spark, SF_DIR), "latest_stream",
        output_mode="update")
    # update mode: one snapshot per (user, micro-batch); n_events is
    # monotone, so the final snapshot is the max-n_events row.
    got = spark.sql("""
        SELECT user_id, last_us, last_event_type, last_value, n_events
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY n_events DESC) rk FROM latest_stream) WHERE rk = 1""")
    got_pd = canonicalize(got.toPandas())
    want = canonicalize(
        spark.sql(eventops.events_latest_state(SPARK))
        .select("user_id",
                F.expr("unix_micros(cast(last_ts as timestamp))").alias("last_us"),
                "last_event_type", "last_value", "n_events").toPandas())
    assert got_pd.equals(want), "stateful latest-state != batch"


def test_decontaminate_stream_equals_batch(spark):
    from aws_trusted_advisor_explorer_spark.operators import corpusops

    structured.run_stream_to_memory(
        structured.decontaminate_stream(spark, SF_DIR), "decon_stream",
        output_mode="append")
    got = {r.doc_id for r in spark.table("decon_stream").collect()}
    want = {r.doc_id
            for r in spark.sql(corpusops.docs_decontaminated(SPARK)).collect()}
    assert got == want, (len(got), len(want))


def test_funnel_stream_equals_batch(spark):
    """Final per-step user counts from the stateful streaming funnel
    must equal the batch events_funnel."""
    structured.run_stream_to_memory(
        structured.funnel_stream(spark, SF_DIR), "funnel_stream",
        output_mode="update")
    final = spark.sql("""
        SELECT user_id, max(step_reached) AS step_reached
        FROM funnel_stream GROUP BY user_id""")
    got = {s: 0 for s in (1, 2, 3)}
    for r in final.collect():
        for s in range(1, int(r.step_reached) + 1):
            got[s] += 1
    want = {r.step: r.n_users
            for r in spark.sql(eventops.events_funnel(SPARK)).collect()}
    assert got == want


def test_bloom_prefilter_stream_equals_batch(spark):
    """Stream-side bloom verdicts (stateless in-plan filter words) must
    equal the batch operator's bloom_maybe column doc-for-doc."""
    from aws_trusted_advisor_explorer_spark.operators import dedup

    structured.run_stream_to_memory(
        structured.bloom_prefilter_stream(spark, SF_DIR), "bloom_stream",
        output_mode="append")
    got = {r.doc_id: r.bloom_maybe
           for r in spark.table("bloom_stream").collect()}
    want = {r.doc_id: r.bloom_maybe
            for r in spark.sql(dedup.dedup_bloom_prefilter(SPARK)).collect()}
    assert got == want, (len(got), len(want))


def test_purchase_click_stream_stream_join_equals_batch(spark):
    """The watermarked stream-stream join must emit exactly the batch
    pair relation (ids and microsecond deltas)."""
    from aws_trusted_advisor_explorer_spark.operators import eventops

    structured.run_stream_to_memory(
        structured.purchase_click_join_stream(spark, SF_DIR), "pc_join",
        output_mode="append")
    got = {(r.purchase_id, r.click_id, r.us_before_purchase)
           for r in spark.table("pc_join").collect()}
    want = {(r.purchase_id, r.click_id, r.us_before_purchase)
            for r in spark.sql(
                eventops.events_purchase_click_pairs(SPARK)).collect()}
    assert got == want and got


def test_sanitize_stream_equals_batch(spark):
    """Streaming unicode sanitation: row-for-row equal to the batch
    text_unicode_sanitize query (same planted damage, same expression
    fragments via textops.sanitize_parts)."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import textops

    structured.run_stream_to_memory(
        structured.sanitize_stream(spark, SF_DIR), "sanitize_stream",
        output_mode="append")
    got = {tuple(r) for r in spark.table("sanitize_stream").collect()}
    want = {tuple(r)
            for r in spark.sql(textops.text_unicode_sanitize(SPARK)).collect()}
    assert got == want


def test_nb_score_stream_equals_batch(spark):
    """Streaming classifier scoring (frozen in-plan model) must be
    row-for-row equal to the batch text_nb_quality_score."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import textops

    structured.run_stream_to_memory(
        structured.nb_score_stream(spark, SF_DIR), "nb_score_stream",
        output_mode="append")
    got = {tuple(r) for r in spark.table("nb_score_stream").collect()}
    want = {tuple(r)
            for r in spark.sql(textops.text_nb_quality_score(SPARK)).collect()}
    assert got == want


def test_bpe_count_stream_equals_batch(spark):
    """Streaming BPE pricing (frozen merge table in-plan) must be
    row-for-row equal to the batch text_bpe_tokenize_count."""
    from aws_trusted_advisor_explorer_spark.operators import textops

    structured.run_stream_to_memory(
        structured.bpe_count_stream(spark, SF_DIR), "bpe_count_stream",
        output_mode="append")
    got = {tuple(r) for r in spark.table("bpe_count_stream").collect()}
    want = {tuple(r)
            for r in textops.text_bpe_tokenize_count_df(spark).collect()}
    assert got == want


def test_top_paths_stream_gram_counts_equal_batch(spark):
    """Summing the stream's per-batch path emissions reproduces the
    batch gram relation exactly (the top-k report is a rollup of it):
    same sliding grams, no duplicates or gaps across micro-batches."""
    import collections
    import re as _re

    from aws_trusted_advisor_explorer_spark.operators import eventops

    structured.run_stream_to_memory(
        structured.top_paths_stream(spark, SF_DIR), "top_paths_stream",
        output_mode="update")
    got: collections.Counter = collections.Counter()
    for r in spark.table("top_paths_stream").collect():
        got[r.path] += r.n
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    byu: dict = {}
    for r in ev:
        byu.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    expect: collections.Counter = collections.Counter()
    for seq in byu.values():
        types = [t for _, _, t in sorted(seq)]
        for i in range(len(types) - eventops.PATH_N + 1):
            expect[" ".join(types[i:i + eventops.PATH_N])] += 1
    assert got == expect


def test_transition_matrix_stream_equals_batch(spark):
    """Summing the stream's per-batch transition emissions reproduces
    the batch events_transition_matrix exactly — counts match per
    (prev, next) cell, and the rates re-derive from the summed counts
    (the matrix report is a rollup of this relation)."""
    import collections

    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import eventops

    structured.run_stream_to_memory(
        structured.transition_matrix_stream(spark, SF_DIR),
        "transition_stream", output_mode="update")
    got: collections.Counter = collections.Counter()
    for r in spark.table("transition_stream").collect():
        got[(r.prev_type, r.next_type)] += r.n
    want = {}
    for r in spark.sql(eventops.events_transition_matrix(SPARK)).collect():
        want[(r.prev_type, r.next_type)] = (int(r.n), int(r.n_from),
                                            int(r.rate_ppm))
    assert dict(got) == {k: v[0] for k, v in want.items()}
    n_from: collections.Counter = collections.Counter()
    for (a, _), n in got.items():
        n_from[a] += n
    for (a, b), n in got.items():
        assert want[(a, b)] == (n, n_from[a], n * 1_000_000 // n_from[a])


def test_range_search_stream_equals_batch(spark):
    """Stream-static retrieval: the streamed query vectors joined
    against the static bucketed corpus must reproduce the batch
    knn_range_search rows exactly (same buckets, same cosine folds)."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import similarity

    structured.run_stream_to_memory(
        structured.range_search_stream(spark, SF_DIR), "range_stream",
        output_mode="append")
    got = {tuple(r) for r in spark.table("range_stream").collect()}
    want = {tuple(r)
            for r in spark.sql(similarity.knn_range_search(SPARK)).collect()}
    assert got == want


def test_anomaly_stream_equals_batch(spark):
    """Online control-chart detection (frozen batch-trained stats) must
    flag exactly the batch events_hourly_anomaly rows with identical
    integer z² values."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import eventops

    structured.run_stream_to_memory(
        structured.anomaly_stream(spark, SF_DIR), "anomaly_stream")
    got = {tuple(r) for r in spark.table("anomaly_stream").collect()}
    want = {tuple(r)
            for r in spark.sql(eventops.events_hourly_anomaly(SPARK)).collect()}
    assert got == want


def test_chunk_stream_equals_batch(spark):
    """Streaming chunker (shared geometry expressions) must emit
    exactly the batch docs_chunking rows."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import corpusops

    structured.run_stream_to_memory(
        structured.chunk_stream(spark, SF_DIR), "chunk_stream",
        output_mode="append")
    got = {tuple(r) for r in spark.table("chunk_stream").collect()}
    want = {tuple(r)
            for r in spark.sql(corpusops.docs_chunking(SPARK)).collect()}
    assert got == want


def test_frozen_model_broadcast_path_twins(spark, monkeypatch):
    """Frozen-model shipping mechanics (round-3 verdict item 1): force
    every model past the literal threshold so decontaminate / bloom /
    NB-score build their BROADCAST-variable + Arrow-UDF plans, pin
    (a) the stream plan really carries the pandas UDF (the model is
    NOT a plan literal) and (b) verdicts are identical to the batch
    operators — the model is the same object either way, only the
    shipping changes."""
    from aws_trusted_advisor_explorer_spark.operators import corpusops, dedup
    from aws_trusted_advisor_explorer_spark.operators import textops

    monkeypatch.setattr(structured, "MODEL_LITERAL_MAX", -1)

    decon = structured.decontaminate_stream(spark, SF_DIR)
    bloom = structured.bloom_prefilter_stream(spark, SF_DIR)
    nbsc = structured.nb_score_stream(spark, SF_DIR)
    # decon drops rows -> mapInPandas stage; bloom/nb project a column
    # -> Arrow-batched scalar UDF stage
    assert "MapInPandas" in decon._jdf.queryExecution().analyzed().toString()
    for df in (bloom, nbsc):
        assert "apply_model" in df._jdf.queryExecution().analyzed().toString()

    structured.run_stream_to_memory(decon, "decon_bc", output_mode="append")
    got = {r.doc_id for r in spark.table("decon_bc").collect()}
    want = {r.doc_id
            for r in spark.sql(corpusops.docs_decontaminated(SPARK)).collect()}
    assert got == want

    structured.run_stream_to_memory(bloom, "bloom_bc", output_mode="append")
    got = {r.doc_id: r.bloom_maybe for r in spark.table("bloom_bc").collect()}
    want = {r.doc_id: r.bloom_maybe
            for r in spark.sql(dedup.dedup_bloom_prefilter(SPARK)).collect()}
    assert got == want

    structured.run_stream_to_memory(nbsc, "nb_bc", output_mode="append")
    got = {tuple(r) for r in spark.table("nb_bc").collect()}
    want = {tuple(r)
            for r in spark.sql(textops.text_nb_quality_score(SPARK)).collect()}
    assert got == want


def test_frozen_model_join_path_twins(spark, monkeypatch):
    """No-collect model shipping (round-4 verdict item 4, mechanism
    corrected r6 per ADVICE): force every frozen model past
    MODEL_BROADCAST_MAX so decontaminate / bloom / NB-score take the
    stream-static JOIN tier — the model stays a DataFrame and is never
    collect()ed. Pin (a) each twin's physical plan carries the
    stream-static join and NO Python stage (the model is neither a
    plan literal nor a broadcast-variable UDF), (b) with
    auto-broadcast disabled the un-hinted join degrades to a SHUFFLED
    join — the path where nothing is materialized driver-side, which
    a 1e8+-row model requires (a BroadcastExchange still builds its
    relation on the driver in stock Spark), and (c) verdicts are
    identical to the batch operators — same model, third shipping
    mechanism."""
    import re

    from aws_trusted_advisor_explorer_spark.operators import (
        corpusops, dedup, textops,
    )

    monkeypatch.setattr(structured, "MODEL_BROADCAST_MAX", -1)

    def physical(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))

    JOIN = r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
    decon = structured.decontaminate_stream(spark, SF_DIR)
    bloom = structured.bloom_prefilter_stream(spark, SF_DIR)
    nbsc = structured.nb_score_stream(spark, SF_DIR)
    for df in (decon, bloom, nbsc):
        plan = physical(df)
        assert re.search(JOIN, plan)
        assert "MapInPandas" not in plan
        assert "pythonudf" not in plan.lower()
    # bloom is the stateless tier: one join per probe, no agg state
    # (formatted explain prints each node twice: tree + detail)
    assert len(re.findall(JOIN, physical(bloom))) == 2 * len(
        dedup.BLOOM_SALTS)

    # (b): past autoBroadcastJoinThreshold the un-hinted join plans
    # shuffled — no driver-side hash-relation build anywhere — and the
    # stream EXECUTED on that path produces the same verdicts (plan
    # shape alone would not catch a runtime-only regression in the
    # very path the 1e8+-row claim rests on)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        decon_smj = structured.decontaminate_stream(spark, SF_DIR)
        plan = physical(decon_smj)
        assert re.search(r"SortMergeJoin|ShuffledHashJoin", plan)
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastExchange" not in plan
        structured.run_stream_to_memory(decon_smj, "decon_join_smj",
                                        output_mode="update")
        got = {r.doc_id for r in spark.table("decon_join_smj").collect()}
        want = {r.doc_id for r in
                spark.sql(corpusops.docs_decontaminated(SPARK)).collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    # decon/nb aggregate per-doc -> update mode (group completes
    # within its arrival micro-batch, emitted exactly once)
    structured.run_stream_to_memory(decon, "decon_join",
                                    output_mode="update")
    got = {r.doc_id for r in spark.table("decon_join").collect()}
    want = {r.doc_id
            for r in spark.sql(corpusops.docs_decontaminated(SPARK)).collect()}
    assert got == want

    structured.run_stream_to_memory(bloom, "bloom_join",
                                    output_mode="append")
    got = {r.doc_id: r.bloom_maybe
           for r in spark.table("bloom_join").collect()}
    want = {r.doc_id: r.bloom_maybe
            for r in spark.sql(dedup.dedup_bloom_prefilter(SPARK)).collect()}
    assert got == want

    structured.run_stream_to_memory(nbsc, "nb_join", output_mode="update")
    got = {tuple(r) for r in spark.table("nb_join").collect()}
    want = {tuple(r)
            for r in spark.sql(textops.text_nb_quality_score(SPARK)).collect()}
    assert got == want


def test_decontaminate_tiers_agree_on_null_text(spark, tmp_path,
                                                monkeypatch):
    """NULL-text docs must survive decontamination in ALL THREE model
    tiers (ADVICE r5): the batch anti-join keeps them (a null text
    never reaches the contaminated set), the join tier keeps them via
    explode_outer, and — fixed r6 — the literal tier's coalesce'd
    arrays_overlap and the broadcast tier's kernel keep them too.
    Planted corpus: one eval doc, one contaminated training doc, one
    NULL-text doc, one clean doc, one shingle-less doc."""
    import pandas as pd

    from aws_trusted_advisor_explorer_spark.operators.corpusops import (
        BENCH_MOD,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0 * BENCH_MOD, "en", shared, "web"),          # eval stand-in
        (1, "en", shared, "web"),                      # contaminated
        (2, "en", None, "web"),                        # NULL text
        (3, "en", "one two three four five six", "web"),
        (4, "en", "hi", "web"),                        # shingle-less
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text", "source"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    path = tmp_path / "documents.parquet"
    pdf.to_parquet(path)

    expect = {2, 3, 4}
    # literal tier (defaults: the planted model is tiny)
    d1 = structured.decontaminate_stream(spark, str(tmp_path))
    structured.run_stream_to_memory(d1, "decon_null_lit",
                                    output_mode="append")
    assert {r.doc_id for r in spark.table("decon_null_lit").collect()} \
        == expect
    # broadcast-variable tier
    monkeypatch.setattr(structured, "MODEL_LITERAL_MAX", -1)
    d2 = structured.decontaminate_stream(spark, str(tmp_path))
    structured.run_stream_to_memory(d2, "decon_null_bc",
                                    output_mode="append")
    assert {r.doc_id for r in spark.table("decon_null_bc").collect()} \
        == expect
    # join tier
    monkeypatch.setattr(structured, "MODEL_BROADCAST_MAX", -1)
    d3 = structured.decontaminate_stream(spark, str(tmp_path))
    structured.run_stream_to_memory(d3, "decon_null_join",
                                    output_mode="update")
    assert {r.doc_id for r in spark.table("decon_null_join").collect()} \
        == expect


def test_hll_registers_stream_equals_batch(spark):
    """The streamed HLL register table (native streaming max()
    aggregation, fixed-size state) must be row-identical to the batch
    register build — the streaming face of the merge-losslessness the
    batch audit proves per day slice."""
    from aws_trusted_advisor_explorer_spark.operators import sketchops

    structured.run_stream_to_memory(
        structured.hll_registers_stream(spark, SF_DIR), "hll_stream")
    got = canonicalize(spark.table("hll_stream").toPandas())
    want = canonicalize(
        spark.sql(sketchops.hll_registers_sql(SPARK)).toPandas())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want), "stream registers != batch registers"


def test_bloom_probe_kernel_nan_probe_is_false():
    """Arrow hands a NULL array element to a pandas UDF as float NaN,
    not None — the kernel must return False (the batch CASE's verdict
    for null text), not raise on int(nan)."""
    import numpy as np

    from aws_trusted_advisor_explorer_spark.streaming.structured import (
        _bloom_probe_kernel,
    )

    model = {0: (1 << 5) | (1 << 7)}
    assert _bloom_probe_kernel([5.0, 7.0], model) is True
    assert _bloom_probe_kernel([5.0, 8.0], model) is False
    assert _bloom_probe_kernel([float("nan"), 5.0], model) is False
    assert _bloom_probe_kernel([np.nan], model) is False
    assert _bloom_probe_kernel([None, 5.0], model) is False


def test_lm_score_stream_three_tiers_equal_batch(spark, monkeypatch):
    """Streaming reference-LM scoring must be row-for-row equal to the
    batch text_lm_score_ref in ALL THREE model tiers — the per-language
    bigram LM is the canonical join-tier model (vocab²-bounded dims).
    Pins the shipping mechanism per tier: map literals in-plan (no UDF,
    no join), broadcast variable + Arrow kernel (apply_model stage),
    and the no-collect stream-static join (join present, no Python
    stage, three dim joins)."""
    import re

    from aws_trusted_advisor_explorer_spark.operators import textops

    want = {tuple(r)
            for r in spark.sql(textops.text_lm_score_ref(SPARK)).collect()}
    assert want

    # literal tier (default at this SF): model rides the plan string
    lit = structured.lm_score_stream(spark, SF_DIR)
    an = lit._jdf.queryExecution().analyzed().toString()
    assert "map_from_arrays" in an or "map(" in an
    assert "apply_model" not in an
    structured.run_stream_to_memory(lit, "lm_lit", output_mode="append")
    assert {tuple(r) for r in spark.table("lm_lit").collect()} == want

    # broadcast-variable + Arrow-kernel tier
    monkeypatch.setattr(structured, "MODEL_LITERAL_MAX", -1)
    bc = structured.lm_score_stream(spark, SF_DIR)
    assert "apply_model" in bc._jdf.queryExecution().analyzed().toString()
    structured.run_stream_to_memory(bc, "lm_bc", output_mode="append")
    assert {tuple(r) for r in spark.table("lm_bc").collect()} == want

    # no-collect join tier: dims stay DataFrames; per-(doc,lang) agg
    # completes within its arrival micro-batch -> update mode
    monkeypatch.setattr(structured, "MODEL_BROADCAST_MAX", -1)
    jn = structured.lm_score_stream(spark, SF_DIR)
    plan = jn._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert re.search(r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin",
                     plan)
    assert "MapInPandas" not in plan
    assert "pythonudf" not in plan.lower()
    structured.run_stream_to_memory(jn, "lm_join", output_mode="update")
    assert {tuple(r) for r in spark.table("lm_join").collect()} == want


def test_interval_join_stream_equals_batch(spark):
    """The stream-static bucketized interval join must reproduce the
    batch events_interval_join exactly — keyless interval attribution
    is only streamable BECAUSE of the bucket equi-key (a range
    predicate alone cannot be a stream-static join key)."""
    from aws_trusted_advisor_explorer_spark.operators import eventops

    structured.run_stream_to_memory(
        structured.interval_join_stream(spark, SF_DIR),
        "interval_join_stream", output_mode="update")
    got = {tuple(r) for r in spark.table("interval_join_stream").collect()}
    want = {tuple(r)
            for r in spark.sql(eventops.events_interval_join(SPARK)).collect()}
    assert got and got == want


def test_stateful_kernels_sort_across_arrow_chunks(spark, tmp_path):
    """Regression for the per-chunk-sort hazard: with
    arrow.maxRecordsPerBatch forced to 1, a user whose events arrive
    in REVERSE time order spans many Arrow chunks in anti-chronological
    order — the kernels must concatenate before the one (us, event_id)
    sort. Pre-fix, sessionize counted 1 session instead of 3 (each
    chunk sorted alone replays stragglers out of order) and the funnel
    missed the view->click->purchase progression entirely."""
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2026, 1, 1)

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    # reverse-chronological file order; gaps of 3600s > SESSION_GAP
    rows = [
        (5, ts(8000), 1, "purchase", 0.0, "{}"),
        (4, ts(7200), 1, "view", 0.0, "{}"),      # wrong-order step
        (3, ts(7500), 1, "click", 0.0, "{}"),
        (2, ts(3600), 1, "click", 0.0, "{}"),
        (1, ts(0), 1, "view", 0.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf.astype({"ts": "datetime64[us]"}).to_parquet(
        tmp_path / "events.parquet")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
        structured.run_stream_to_memory(
            structured.sessionize_stream(spark, str(tmp_path)),
            "chunk_sessions", output_mode="update")
        got = {(r.user_id, r.n_sessions, r.n_events)
               for r in spark.table("chunk_sessions").collect()}
        # chronological: 0 | 3600 | 7200,7500,8000 -> 3 sessions
        assert got == {(1, 3, 5)}

        structured.run_stream_to_memory(
            structured.funnel_stream(spark, str(tmp_path)),
            "chunk_funnel", output_mode="update")
        got_f = {(r.user_id, r.step_reached)
                 for r in spark.table("chunk_funnel").collect()}
        # chronological: view@0 -> click@3600 -> purchase@8000 = step 3
        assert got_f == {(1, 3)}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_sliding_window_negative_epoch_twin_parity(spark, tmp_path):
    """Regression (review finding): pre-1970 negative-epoch events
    must land in the SAME two hopping windows in the batch bucket
    arithmetic (floor semantics, r6 fix) and the F.window stream —
    truncating division used to assign them one wrong window."""
    import datetime as dt

    import pandas as pd

    rows = [
        (1, dt.datetime(1969, 12, 31, 23, 58, 20), 1, "click", 1.0, "{}"),
        (2, dt.datetime(1970, 1, 1, 0, 10, 0), 1, "click", 2.0, "{}"),
        (3, dt.datetime(1969, 12, 31, 22, 0, 0), 1, "view", 3.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf.astype({"ts": "datetime64[us]"}).to_parquet(
        tmp_path / "events.parquet")

    from aws_trusted_advisor_explorer_spark.operators import eventops
    from aws_trusted_advisor_explorer_spark.session import load_tables

    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    load_tables(ns, str(tmp_path), names=("events",))
    batch = {(r.event_type, r.win_start_sec, r.n_events, r.total_value)
             for r in ns.sql(eventops.events_sliding_window(SPARK)).collect()}
    # every event covers exactly 2 hopping windows, negative epochs
    # too: 3 events -> 6 window memberships
    assert sum(n for _, _, n, _ in batch) == 6
    # the -100s click floors into {-1800, -3600}, NOT {0, -1800}
    assert ("click", -3600, 1, 1.0) in batch

    structured.run_stream_to_memory(
        structured.sliding_counts_stream(spark, str(tmp_path)),
        "neg_sliding")
    got = {(r.event_type, r.win_start_sec, r.n_events, r.total_value)
           for r in spark.table("neg_sliding").collect()}
    assert got == batch


def test_stateful_twins_survive_multi_batch_boundaries(spark, tmp_path):
    """r6 verdict stretch ask: the availableNow drains at driver SF are
    single-batch (one staged file), so this splits the sf0.001 events
    into FOUR chronologically ordered part files and re-runs the three
    stateful twins with maxFilesPerTrigger=1 — state must carry across
    real micro-batch boundaries and still reproduce the batch answers.
    The update-mode emission counts prove multiple batches actually
    ran (more emissions than users for sessionize)."""
    import collections
    import os

    import pandas as pd

    pdf = (pd.read_parquet(f"{SF_DIR}/events.parquet")
           .sort_values(["ts", "event_id"]).reset_index(drop=True))
    evdir = tmp_path / "events.parquet"
    os.makedirs(evdir)
    n = len(pdf)
    for i in range(4):
        chunk = pdf.iloc[i * n // 4:(i + 1) * n // 4]
        p = evdir / f"part-{i:05d}.parquet"
        chunk.astype({"ts": "datetime64[us]"}).to_parquet(p)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    ns.read.parquet(str(evdir)).createOrReplaceTempView("events")

    # sessionize: last state per user == batch
    structured.run_stream_to_memory(
        structured.sessionize_stream(ns, str(tmp_path)), "mb_sessions",
        output_mode="update")
    emissions = ns.table("mb_sessions").count()
    n_users = ns.sql("SELECT count(DISTINCT user_id) AS n FROM events") \
        .first().n
    assert emissions > n_users, "expected >1 micro-batch of emissions"
    got_s = (ns.table("mb_sessions")
             .groupBy("user_id")
             .agg(F.max("n_sessions").alias("n_sessions"),
                  F.max("n_events").alias("n_events")))
    want_s = ns.sql(eventops.events_sessionize(SPARK)) \
        .select("user_id", "n_sessions", "n_events")
    assert canonicalize(got_s.toPandas()).equals(
        canonicalize(want_s.toPandas()))

    # funnel: per-step user counts from the final per-user states
    structured.run_stream_to_memory(
        structured.funnel_stream(ns, str(tmp_path)), "mb_funnel",
        output_mode="update")
    final = ns.sql("""
        SELECT user_id, max(step_reached) AS step_reached
        FROM mb_funnel GROUP BY user_id""")
    got_f = {s: 0 for s in (1, 2, 3)}
    for r in final.collect():
        for s in range(1, int(r.step_reached) + 1):
            got_f[s] += 1
    want_f = {r.step: r.n_users
              for r in ns.sql(eventops.events_funnel(SPARK)).collect()}
    assert got_f == want_f

    # top paths: summed per-batch gram emissions == exact gram counts
    structured.run_stream_to_memory(
        structured.top_paths_stream(ns, str(tmp_path)), "mb_paths",
        output_mode="update")
    got_p: collections.Counter = collections.Counter()
    for r in ns.table("mb_paths").collect():
        got_p[r.path] += r.n
    byu: dict = {}
    for r in ns.sql("SELECT * FROM events").collect():
        byu.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    expect: collections.Counter = collections.Counter()
    for seq in byu.values():
        types = [t for _, _, t in sorted(seq)]
        for i in range(len(types) - eventops.PATH_N + 1):
            expect[" ".join(types[i:i + eventops.PATH_N])] += 1
    assert got_p == expect

    # disorder audit (r7 twin, added per the r7 verdict): the running
    # high-water mark must carry across the four micro-batch
    # boundaries — final per-type counts equal the batch audit, and
    # per-type emission counts prove state visited multiple batches
    structured.run_stream_to_memory(
        structured.disorder_audit_stream(ns, str(tmp_path)), "mb_dis",
        output_mode="update")
    rows_d = ns.table("mb_dis").collect()
    got_d = {}
    for r in rows_d:
        cur = got_d.get(r.event_type)
        if cur is None or r.n_events > cur[0]:
            got_d[r.event_type] = (r.n_events, r.n_late,
                                   r.max_lateness_us, r.n_id_regressions)
    want_d = {r.event_type: (r.n_events, r.n_late, r.max_lateness_us, 0)
              for r in ns.sql(
                  eventops.events_disorder_audit(SPARK)).collect()}
    assert got_d == want_d
    n_types = ns.sql(
        "SELECT count(DISTINCT event_type) AS n FROM events").first().n
    assert len(rows_d) > n_types, "expected >1 micro-batch of emissions"

    # SCD2 (r8 twin): open-run state must carry across the four
    # micro-batch boundaries — runs spanning a boundary keep their run
    # number and accumulate their event count; final rows == batch
    structured.run_stream_to_memory(
        structured.scd2_stream(ns, str(tmp_path)), "mb_scd2",
        output_mode="update")
    got_s2 = _scd2_final_rows(ns.table("mb_scd2").collect())
    want_s2 = {(r.user_id, int(r.run_no)):
               (r.state, int(r.valid_from_us),
                None if r.valid_to_us is None else int(r.valid_to_us),
                int(r.n_events), int(r.is_current))
               for r in ns.sql(
                   eventops.events_scd2_history(SPARK)).collect()}
    assert got_s2 == want_s2

    # transition matrix (r9 twin): the last-type state must carry
    # across the four boundaries — a transition whose prev event sits
    # in batch k and next event in batch k+1 is emitted exactly once;
    # summed emissions == the batch matrix counts
    structured.run_stream_to_memory(
        structured.transition_matrix_stream(ns, str(tmp_path)),
        "mb_trans", output_mode="update")
    got_t: collections.Counter = collections.Counter()
    for r in ns.table("mb_trans").collect():
        got_t[(r.prev_type, r.next_type)] += r.n
    want_t = {(r.prev_type, r.next_type): int(r.n)
              for r in ns.sql(
                  eventops.events_transition_matrix(SPARK)).collect()}
    assert dict(got_t) == want_t


def _scd2_final_rows(rows):
    """In update mode the open run re-emits per batch: per
    (user, run_no) the FINAL row is the closed one if present, else
    the open snapshot with the most events."""
    final = {}
    for r in rows:
        k = (r.user_id, int(r.run_no))
        cur = final.get(k)
        if (cur is None or int(r.is_current) < int(cur.is_current)
                or (int(r.is_current) == int(cur.is_current)
                    and r.n_events > cur.n_events)):
            final[k] = r
    return {k: (r.state, int(r.valid_from_us),
                None if r.valid_to_us is None else int(r.valid_to_us),
                int(r.n_events), int(r.is_current))
            for k, r in final.items()}


def test_scd2_stream_equals_batch(spark, tmp_path):
    """The stateful SCD2 twin must reproduce the batch
    events_scd2_history relation on the real corpus: closed intervals
    emitted at state-change time + the open run's last snapshot ==
    the batch gaps-and-islands rows."""
    structured.run_stream_to_memory(
        structured.scd2_stream(spark, SF_DIR), "scd2_rows",
        output_mode="update")
    got = _scd2_final_rows(spark.table("scd2_rows").collect())
    want = {(r.user_id, int(r.run_no)):
            (r.state, int(r.valid_from_us),
             None if r.valid_to_us is None else int(r.valid_to_us),
             int(r.n_events), int(r.is_current))
            for r in spark.sql(eventops.events_scd2_history(SPARK)).collect()}
    assert got == want


def test_disorder_audit_stream_equals_batch(spark, tmp_path):
    """The stateful lateness audit must equal the batch
    events_disorder_audit on a PLANTED disordered corpus delivered
    across multiple micro-batches (files split in ingest/event_id
    order, maxFilesPerTrigger=1) — non-zero n_late, state carried
    across batch boundaries, and on the real sf0.001 corpus (in time
    order) every count is legitimately zero in both forms."""
    import datetime as dt
    import os

    import pandas as pd

    base = dt.datetime(2024, 1, 1)

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    # event_id = ingest order; several events arrive with OLDER
    # timestamps than the running max (late), spread across both types
    rows = [
        (1, ts(100), 1, "click", 0.0, "{}"),
        (2, ts(50), 1, "click", 0.0, "{}"),    # 50us-class late
        (3, ts(200), 1, "view", 0.0, "{}"),
        (4, ts(300), 1, "click", 0.0, "{}"),
        (5, ts(120), 1, "view", 0.0, "{}"),    # late vs 200
        (6, ts(400), 1, "view", 0.0, "{}"),
        (7, ts(90), 1, "click", 0.0, "{}"),    # late vs 300
        (8, ts(500), 1, "click", 0.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    evdir = tmp_path / "events.parquet"
    os.makedirs(evdir)
    for i in range(4):  # 2 events per file, ingest order across files
        chunk = pdf.iloc[i * 2:(i + 1) * 2]
        p = evdir / f"part-{i:05d}.parquet"
        chunk.astype({"ts": "datetime64[us]"}).to_parquet(p)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    ns.read.parquet(str(evdir)).createOrReplaceTempView("events")
    structured.run_stream_to_memory(
        structured.disorder_audit_stream(ns, str(tmp_path)), "mb_disorder",
        output_mode="update")
    # update mode: final state per type = row with the max n_events
    got = {}
    regr = {}
    for r in ns.table("mb_disorder").collect():
        cur = got.get(r.event_type)
        if cur is None or r.n_events > cur[0]:
            got[r.event_type] = (r.n_events, r.n_late, r.max_lateness_us)
            regr[r.event_type] = r.n_id_regressions
    want = {r.event_type: (r.n_events, r.n_late, r.max_lateness_us)
            for r in ns.sql(eventops.events_disorder_audit(SPARK)).collect()}
    assert got == want
    assert all(v[1] > 0 for v in got.values())  # lateness really fired
    # in-ingest-order delivery: the out-of-order-delivery detector
    # (ADVICE r7) must stay silent
    assert all(v == 0 for v in regr.values())

    # OUT-OF-ORDER file delivery (reversed modtimes => the file source
    # consumes the last-ingested file first): n_late silently diverges
    # from the batch oracle here, and the state's max-event_id guard
    # must make that DETECTABLE via n_id_regressions > 0
    rdir = tmp_path / "rev_sf" / "events.parquet"
    os.makedirs(rdir)
    for i in range(4):
        chunk = pdf.iloc[i * 2:(i + 1) * 2]
        p = rdir / f"part-{i:05d}.parquet"
        chunk.astype({"ts": "datetime64[us]"}).to_parquet(p)
        os.utime(p, (1_700_000_000 - i * 60, 1_700_000_000 - i * 60))
    rs = spark.newSession()
    rs.conf.set("spark.sql.session.timeZone", "UTC")
    rs.read.parquet(str(rdir)).createOrReplaceTempView("events")
    structured.run_stream_to_memory(
        structured.disorder_audit_stream(rs, str(tmp_path / "rev_sf")),
        "mb_disorder_rev", output_mode="update")
    finals = {}
    for r in rs.table("mb_disorder_rev").collect():
        cur = finals.get(r.event_type)
        if cur is None or r.n_events > cur.n_events:
            finals[r.event_type] = r
    assert sum(r.n_id_regressions for r in finals.values()) > 0

    # real corpus (generated in time order): all-zero in both forms
    structured.run_stream_to_memory(
        structured.disorder_audit_stream(spark, SF_DIR), "sf_disorder",
        output_mode="update")
    got_sf = {}
    for r in spark.table("sf_disorder").collect():
        cur = got_sf.get(r.event_type)
        if cur is None or r.n_events > cur[0]:
            got_sf[r.event_type] = (r.n_events, r.n_late, r.max_lateness_us)
    want_sf = {r.event_type: (r.n_events, r.n_late, r.max_lateness_us)
               for r in spark.sql(
                   eventops.events_disorder_audit(SPARK)).collect()}
    assert got_sf == want_sf
    assert all(v[1] == 0 for v in got_sf.values())


def test_pit_features_stream_equals_batch(spark):
    """The online point-in-time feature path must compute EXACTLY the
    batch training join's features on the real corpus (the feature
    store's on/offline consistency contract)."""
    structured.run_stream_to_memory(
        structured.pit_features_stream(spark, SF_DIR), "pit_stream",
        output_mode="update")
    got = canonicalize(spark.table("pit_stream").toPandas())
    want = canonicalize(
        spark.sql(eventops.events_pit_features(SPARK)).toPandas())
    assert list(got.columns) == list(want.columns)
    assert len(got) > 0
    assert got.equals(want)


def test_pit_features_stream_multi_batch_state(spark, tmp_path):
    """State must carry the rolling event buffer across micro-batch
    boundaries AND evict by event time: purchases whose lookback
    windows straddle file boundaries (maxFilesPerTrigger=1) still see
    exactly the batch frames, and events older than 7 days before a
    later purchase have been evicted without changing its features."""
    import datetime as dt
    import os

    import pandas as pd

    base = dt.datetime(2024, 1, 10)
    h = 3600

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    day = 24 * h
    rows = [
        # file 0: old activity
        (1, ts(0), 1, "click", 10.00, "{}"),
        (2, ts(100), 1, "view", 0.00, "{}"),
        # file 1: purchase sees file-0 events across the batch boundary
        (3, ts(200), 1, "purchase", 50.00, "{}"),
        (4, ts(300), 1, "click", 5.25, "{}"),
        # file 2: second purchase 1d+ later - 1d frame holds only the
        # click at +300s? no: that is > 1d earlier; only file-2's view
        (5, ts(day + 250), 1, "view", 0.00, "{}"),
        (6, ts(day + 400), 1, "purchase", 75.00, "{}"),
        # file 3: third purchase 9 days in - everything before is
        # > 7d older, EVICTED from state, frames must be empty
        (7, ts(9 * day + 100), 1, "purchase", 20.00, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    evdir = tmp_path / "events.parquet"
    os.makedirs(evdir)
    bounds = [(0, 2), (2, 4), (4, 6), (6, 7)]
    for i, (lo, hi) in enumerate(bounds):
        p = evdir / f"part-{i:05d}.parquet"
        pdf.iloc[lo:hi].astype({"ts": "datetime64[us]"}).to_parquet(p)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    ns.read.parquet(str(evdir)).createOrReplaceTempView("events")
    structured.run_stream_to_memory(
        structured.pit_features_stream(ns, str(tmp_path)), "pit_mb",
        output_mode="update")
    got = canonicalize(ns.table("pit_mb").toPandas())
    want = canonicalize(ns.sql(eventops.events_pit_features(SPARK)).toPandas())
    assert len(got) == 3
    assert got.equals(want)
    feats = {r.purchase_id: r for r in ns.table("pit_mb").collect()}
    # cross-boundary frame: purchase 3 sees both file-0 events
    assert feats[3].n_clicks_1d == 1 and feats[3].n_views_1d == 1
    assert feats[3].click_value_1d == 10.0 and feats[3].n_events_7d == 2
    # 1d frame rolled past the old click; 7d frame still holds it
    assert feats[6].n_clicks_1d == 0 and feats[6].n_views_1d == 1
    assert feats[6].n_events_7d == 5 and feats[6].n_purchases_7d == 1
    assert feats[6].purchase_value_7d == 50.0
    # post-eviction purchase: empty frames
    assert feats[7].n_events_7d == 0 and feats[7].n_purchases_7d == 0


def test_pit_features_stream_tie_rounding_and_null_value(spark, tmp_path):
    """Review fixes pinned: (a) a value whose cents land exactly on a
    half (0.125 -> 12.5 cents) must round HALF-UP in the stream kernel
    exactly as the batch decimal(18,2) cast does — python round()'s
    half-even would emit 0.12 vs batch 0.13; (b) a NULL-valued
    purchase emits label_value NULL (not NaN) and its NULL click
    peers contribute 0 cents but still count."""
    import datetime as dt
    import os

    import pandas as pd

    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, base, 1, "click", 0.125, "{}"),               # half-cent
        (2, base + dt.timedelta(seconds=60), 1, "click", None, "{}"),
        (3, base + dt.timedelta(seconds=120), 1, "purchase", None, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    evdir = tmp_path / "events.parquet"
    os.makedirs(evdir)
    pdf.astype({"ts": "datetime64[us]"}).to_parquet(
        evdir / "part-00000.parquet")

    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    ns.read.parquet(str(evdir)).createOrReplaceTempView("events")
    structured.run_stream_to_memory(
        structured.pit_features_stream(ns, str(tmp_path)), "pit_tie",
        output_mode="update")
    [got] = ns.table("pit_tie").collect()
    [want] = ns.sql(eventops.events_pit_features(SPARK)).collect()
    assert got.n_clicks_1d == want.n_clicks_1d == 2
    # 0.125 -> decimal(18,2) HALF_UP -> 0.13; NULL click adds nothing
    assert got.click_value_1d == want.click_value_1d == 0.13
    assert got.label_value is None and want.label_value is None


def test_training_labels_stream_resolves_closed_horizons(spark, tmp_path):
    """The delayed-label twin emits a purchase's forward-horizon label
    exactly when a later event closes the horizon (possibly batches
    later), equal to the batch events_training_labels row; anchors
    whose horizon is still open at drain end stay pending (never a
    provisional emission). NULL-valued anchor passes label_value
    through as NULL."""
    import datetime as dt
    import os

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    day = 86400

    def ts(d):
        return base + dt.timedelta(seconds=d * day)

    rows = [
        # file 0: two purchases 5 days apart (p2 inside p1's horizon)
        (1, ts(0), 7, "purchase", 10.0, "{}"),
        (2, ts(5), 7, "purchase", None, "{}"),
        # file 1: a purchase at day 40 closes BOTH horizons on arrival
        (3, ts(40), 7, "purchase", 30.0, "{}"),
        # file 2: day-80 purchase closes p3; day-81 click advances the
        # watermark but leaves p4's own horizon open
        (4, ts(80), 7, "purchase", 40.0, "{}"),
        (5, ts(81), 7, "click", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    evdir = tmp_path / "events.parquet"
    os.makedirs(evdir)
    for i, (lo, hi) in enumerate(((0, 2), (2, 3), (3, 5))):
        p = evdir / f"part-{i:05d}.parquet"
        pdf.iloc[lo:hi].astype({"ts": "datetime64[us]"}).to_parquet(p)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    ns.read.parquet(str(evdir)).createOrReplaceTempView("events")
    structured.run_stream_to_memory(
        structured.training_labels_stream(ns, str(tmp_path)), "lab_mb",
        output_mode="update")
    got = {r.purchase_id: r for r in ns.table("lab_mb").collect()}
    want = {r.purchase_id: r for r in
            ns.sql(eventops.events_training_labels(SPARK)).collect()}
    # p4's horizon (day 110) never closes -> pending, not emitted
    assert set(got) == {1, 2, 3} and set(want) == {1, 2, 3, 4}
    for pid in got:
        g, w = got[pid], want[pid]
        assert (g.label_value, g.n_purchases_30d_fwd, g.label_repeat,
                g.time_to_next_us) == \
               (w.label_value, w.n_purchases_30d_fwd, w.label_repeat,
                w.time_to_next_us), pid
    assert got[1].n_purchases_30d_fwd == 1
    assert got[1].time_to_next_us == 5 * 86400 * 1_000_000
    assert got[2].label_value is None       # NULL anchor passes through
    assert got[2].n_purchases_30d_fwd == 0  # day 40 is past day 35
    assert got[3].n_purchases_30d_fwd == 0
