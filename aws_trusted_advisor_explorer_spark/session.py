"""SparkSession factory.

Local-mode defaults tuned for the test harness (local[32], single JVM);
the same settings are the right starting point on a real cluster --
AQE on, shuffle partitions sized to parallelism, Arrow enabled for the
Pandas-UDF slow path, UTC session timezone so timestamp semantics match
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ta_explorer_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # the generated-class cache defaults to 100 entries; a session
        # running the full driver query surface compiles several hundred
        # wholestage/projection classes, so LRU eviction forces visible
        # (~1s) recompiles of early queries on every later pass. Static
        # conf -- must be set at JVM build time, hence here and not in
        # tune_session. r12: 2000 was sized for a ~160-key suite; at
        # 202 keys the per-pass codegen working set exceeds it again,
        # and the LRU victims are exactly the PASS-START queries (the
        # least-recently-run when a pass restarts) — the long-attributed
        # "pass-start stall" rows (view_low_util_ec2* 1.3-3.3 s vs
        # 0.3 s steady-state). 8000 entries keeps the whole suite's
        # classes resident (generated classes are KB-scale; heap cost
        # is negligible against the 8g driver).
        .config("spark.sql.codegen.cache.maxEntries", "8000")
        # see tune_session: dimension-broadcast headroom over the stock
        # 10MB (the sf0.1 tags dim is ~11MB -> broadcast, 2-5x)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # progress bars land on the Python process's stdout and would
        # corrupt bench.py's one-JSON-line stdout contract
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally-provided session.

    The driver hands our ``queries()`` callables its own SparkSession;
    these settings keep semantics (UTC timestamps) and plans (AQE) in
    line with what we test with, without restarting the JVM.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Dimension-broadcast headroom: the stock 10MB threshold is sized
    # for small executors; with multi-GB executor memory a 64MB
    # broadcast is routine and turns the fact-to-tags view joins into
    # broadcast hash joins (measured 2-5x over the sort-merge pick at
    # sf0.1, where tags is ~11MB on disk — just past the default
    # threshold). Oversized dimensions still fall back to shuffle
    # joins automatically, so the 100 TB posture is unchanged.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))
    return spark


def range_partitions_for(df_or_spark) -> int:
    """:func:`range_partitions` for call sites holding a DataFrame or
    a SparkSession (the two-phase-cumsum helpers take relations)."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return range_partitions(spark)


def range_partitions(spark: SparkSession) -> int:
    """Partition count for the two-phase-cumsum range layouts (r12:
    was a hard-coded 32 tuned to local[32]). Scale-adaptive:
    defaultParallelism = the session's core count locally, total
    executor cores on a cluster — so the driver's lower-core scaling
    runs and a real deployment both get proportionate layouts. The
    two-phase cumsum's results are partition-count-INDEPENDENT by
    construction (priors depend only on the global in-split order),
    so this is a parallelism knob, never a semantics knob."""
    return max(int(spark.sparkContext.defaultParallelism), 1)


# target ESTIMATED input bytes per corpus->Arrow-kernel task (the
# optimizer's column-pruned compressed-size estimate, which undercounts
# raw text ~2x): the Python kernels (tokenize+fold, Gram partials,
# cluster assignment) cost ~1 s/MB of input, so tasks far smaller than
# a shuffle-partition sweet spot are right — measured at sf0.1 (594 KB
# documents, ~0.25 MB estimated): 1 task 0.47 s, 8 tasks 0.27 s, 32
# tasks 0.39 s for the fused gram fold
KERNEL_TASK_BYTES = 32 * 1024


def kernel_partitions(df) -> int:
    """Partition count for a corpus→Arrow-kernel pass, derived from
    the input's optimizer size estimate and capped at the session
    parallelism (guide §2: scale-adaptive, never a core-count
    constant). The driver corpus ships as ONE parquet file with one
    row group, so without an explicit repartition every kernel ran as
    a single task at any core count (the flat 8-vs-32 ratios in
    SCALING.md's r13 core-scaling block); at cluster scale the
    estimate grows with the data and the cap keeps it at full
    parallelism."""
    spark = df.sparkSession
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        size = 0
    cap = max(int(spark.sparkContext.defaultParallelism), 1)
    if size <= 0:
        return cap
    return max(1, min(cap, size // KERNEL_TASK_BYTES))


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> dict:
    """Register the driver's parquet tables as temp views; return {name: df}.

    Spark rejects parquet TIMESTAMP(NANOS) columns (``events.ts``), so we
    read them as long via ``spark.sql.legacy.parquet.nanosAsLong`` and
    rebuild a TIMESTAMP_NTZ (values are micro-precision, the ns→us
    truncation is lossless; verified against the driver data). Session
    timezone is pinned to UTC so the LTZ→NTZ hop is exact and timestamp
    semantics match the DuckDB oracle.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if names is None:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        ns_cols = _nanos_timestamp_cols(path)
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.expr(f"CAST(timestamp_micros({c} DIV 1000) AS TIMESTAMP_NTZ)"))
        df = _land_multifile(spark, sf_dir, name, path, df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# target bytes per landed input file (r13, guide §6 inverted for tiny
# local inputs): each driver table ships as ONE parquet file with one
# row group, so every scan — and everything narrow-chained above it —
# ran as a single task at any core count (the flat 8-vs-32-core ratios
# in SCALING.md). Landing a table once per dataset as
# size/LAND_FILE_BYTES files (capped at the session parallelism)
# restores scan parallelism without adding a per-query exchange; on a
# real deployment inputs arrive multi-split and the landing is a
# no-op (n_files <= 1 skips it). 128 KB keeps interpreted-lambda SQL
# over `documents` parallel at sf0.1 while sf0.001 stays single-file.
LAND_FILE_BYTES = 128 * 1024
# tables worth landing: the corpora whose consumers run expensive
# per-row work (interpreted higher-order lambdas, Arrow kernels) or
# feed the multi-table TPC-H joins. `events` is deliberately EXCLUDED:
# its ~36 consumers are cheap codegen'd windowed aggregates over a
# 2 MB table, and a 15-way scan added ~0.1 s of task scheduling per
# query (measured r13: events family +3.7 s with landing, docs/text
# -4.7 s) — per-table cost/benefit, not a blanket layout rule.
LAND_TABLES = ("documents", "embeddings", "lineitem", "orders",
               "customer", "part")


def _land_multifile(spark: SparkSession, sf_dir: str, name: str,
                    path: str, df):
    """Land ``df`` (the loaded driver table, post timestamp rebuild)
    as a multi-file parquet copy under the fixture scratch dir, once
    per (dataset, table, layout); returns the landed scan, or ``df``
    unchanged when the table is too small to split. Content-identical
    rows (repartition is a row-preserving round-robin); the one-time
    landing is priced as a ``fixture_land:land_<name>`` plane row."""
    import hashlib
    import tempfile
    import time

    if name not in LAND_TABLES:
        return df
    try:
        raw_bytes = os.path.getsize(path)
    except OSError:
        return df
    cap = max(int(spark.sparkContext.defaultParallelism), 1)
    n_files = max(1, min(cap, raw_bytes // LAND_FILE_BYTES))
    if n_files < 2:
        return df
    key = hashlib.md5(
        f"{sf_dir}|{name}|corpus-land-v1|{n_files}".encode()
    ).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), "spark_fixture_cache",
                        f"land-{key}")
    dest = os.path.join(base, name)
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        os.makedirs(base, exist_ok=True)
        t0 = time.perf_counter()
        tmp = f"{dest}.tmp-{os.getpid()}"
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
        record_plane(f"fixture_land:land_{name}",
                     time.perf_counter() - t0)
        try:
            os.rename(tmp, dest)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(dest, "_SUCCESS")):
                raise
    return spark.read.parquet(dest)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (footer-only
    inspection). ``path`` may be a single file or a Spark-written
    dataset DIRECTORY — pyarrow's read_schema only accepts a file, so
    for directories the first part file's footer speaks for the
    dataset (a dataset with mixed ts physical types would be a writer
    bug upstream of us)."""
    import glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return []
        path = parts[0]
    # match the tz-aware variant too ("timestamp[ns, tz=UTC]"): Spark's
    # nanosAsLong reads BOTH as bigint, so missing the tz form here
    # would leave the column a raw long with no timestamp rebuild
    import pyarrow as pa

    return [f.name for f in pq.read_schema(path)
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"]


# (label, seconds) per session-plane build, appended by
# ensure_session_plane and drained by bench.py (r10 verdict task 2:
# first-consumer keys absorbed their family's plane build, so per-key
# bench numbers measured the plane lottery, not the query — bench.py
# now subtracts drained build seconds from the triggering query's
# elapsed and reports them as their own "plane:<label>" rows). Callers
# never need to touch this; anything funnelling through
# ensure_session_plane / register_session_plane is captured. A custom
# cache site (the BPE merges trainer) records through record_plane().
PLANE_TIMINGS: list[tuple[str, float]] = []

# Per-active-build accumulators of NESTED plane-build seconds (plane
# builds call each other: prefix -> shingle, minhash_pairs -> shingle,
# bpe_merges -> bpe_dict). Without this, a cold inner build was priced
# twice — once as its own row and once inside the outer build's
# elapsed — so plane rows + query rows overstated the pass total, and
# bench.py's per-query "elapsed - drained" subtraction clamped to 0
# (r11 advice finding). Each frame collects the seconds of EVERY row
# recorded while it is active — charged to all open frames, not just
# the innermost, because an outer build's wall contains the grandchild
# builds too and the child's own row is already net of them; each
# build then subtracts its frame, so every row prices ONLY its own
# work and the rows sum to the true total.
_PLANE_BUILD_FRAMES: list[float] = []


def record_plane(label: str, seconds: float) -> None:
    """Record one session-plane build for bench attribution. Inside
    enclosing timed builds (see :data:`_PLANE_BUILD_FRAMES`) the row's
    seconds are also charged to every open frame so each encloser nets
    them out of its own row."""
    PLANE_TIMINGS.append((label, seconds))
    for i in range(len(_PLANE_BUILD_FRAMES)):
        _PLANE_BUILD_FRAMES[i] += seconds


def timed_plane_build(label: str, fn):
    """Run ``fn()`` as a timed plane build and record a ``(label,
    seconds)`` row NET of any nested plane builds recorded while it ran
    (each nested row already priced itself). Returns ``fn()``'s
    result. The shared timing discipline of ensure_session_plane and
    the custom cache sites (the BPE merges trainer)."""
    import time

    t0 = time.perf_counter()
    _PLANE_BUILD_FRAMES.append(0.0)
    try:
        out = fn()
    finally:
        inner = _PLANE_BUILD_FRAMES.pop()
    record_plane(label, max(time.perf_counter() - t0 - inner, 0.0))
    return out


def drain_plane_timings() -> list[tuple[str, float]]:
    """Return and clear the plane-build records accumulated since the
    last drain (bench.py calls this after every query execution)."""
    out = list(PLANE_TIMINGS)
    PLANE_TIMINGS.clear()
    return out


def ensure_session_plane(state: dict, spark: SparkSession, key: object,
                         build, key_ok=None) -> bool:
    """Build-once-per-(session, dataset) cache for localCheckpoint-backed
    temp views ("session planes": the shingle, span, cluster, and
    semdedup-pair relations).

    ``state`` maps ``id(spark)`` to ``(weakref to the session, cache
    key, pinned DataFrames)``. The weakref guards CPython id reuse: an
    entry counts only if its session is still the LIVE object, so a new
    session allocated at a recycled id re-registers instead of
    resolving a dead session's stale views. On hit (live session and
    ``key is None`` or the stored key matches) nothing runs; on miss
    ``build(spark)`` materializes the plane (registering its temp
    views) and returns the DataFrames to pin. A superseded entry is
    simply dropped — ``unpersist()`` is a cache-manager call and a
    no-op for localCheckpoint blocks, which are freed when their RDD
    is GC'd. Dead-session entries are swept on every rebuild so the
    dict does not grow with session churn. Returns True iff the plane
    was (re)built.

    ``key_ok`` (optional) replaces the hit predicate: when given, a
    live entry hits iff ``key_ok(stored_key)`` — the hook callers with
    structured keys (register_session_plane's (key, mode) pairs) use
    to express "any dataset, but only my mode" without this function
    having to know their key layout, and without them reaching into
    the state-tuple layout this function owns.
    """
    import weakref

    st = state.get(id(spark))
    if st is not None and st[0]() is not spark:
        st = None  # dead session's id was recycled — never trust it
    if st is not None and (key_ok(st[1]) if key_ok is not None
                           else (key is None or st[1] == key)):
        return False
    dfs = timed_plane_build(
        getattr(build, "plane_label", None)
        or getattr(build, "__qualname__", repr(build)),
        lambda: build(spark))
    for sid in [sid for sid, s in state.items() if s[0]() is None]:
        del state[sid]
    state[id(spark)] = (weakref.ref(spark), key, list(dfs))
    return True


# Session-plane materialization mode (the set_money_mode/set_skew_mode
# precedent): "local" = localCheckpoint(eager=True) — the single-JVM
# optimization (executor-local blocks, lineage cut; right on local[32],
# NOT fault-tolerant on a cluster, SCALE.md policy table); "table" =
# the documented production swap: write the plane once to a bucketed
# warehouse table and read it back — restart-safe, shareable across
# sessions/jobs, and the bucketed layout removes downstream join
# exchanges on the bucket key (BUCKETING.md). Governs every plane that
# funnels through register_session_plane; the multi-view shingle plane
# documents the same swap at its own build site.
_PLANE_MODE = "local"


def set_plane_mode(mode: str) -> None:
    """Select session-plane materialization: "local" (localCheckpoint,
    the single-JVM default) or "table" (bucketed warehouse table — the
    production fault-tolerance swap named in SCALE.md). Takes effect on
    the next plane build; the mode is part of the plane cache key, so
    switching modes rebuilds the plane rather than silently reusing the
    other mode's materialization."""
    global _PLANE_MODE
    if mode not in ("local", "table"):
        raise ValueError(f"plane mode must be 'local' or 'table', got {mode!r}")
    _PLANE_MODE = mode


def plane_cache_key(key: object) -> tuple:
    """The ``(key, mode)`` cache key every mode-aware plane build
    stores: the mode is part of the key, so ``set_plane_mode``'s
    documented rebuild-on-switch contract holds — switching modes
    rebuilds instead of silently reusing the other mode's
    materialization."""
    return (key, _PLANE_MODE)


def plane_key_ok(key: object):
    """The hit predicate to pass ``ensure_session_plane`` alongside
    :func:`plane_cache_key`. ``key=None`` keeps its wildcard meaning
    ("any registered plane for this session counts") WITHIN a mode: a
    wildcard hit must still match the current plane mode, or the
    rebuild-on-switch contract would be silently void for default-key
    callers (r9 review finding). Explicit keys use plain ``(key,
    mode)`` equality (predicate None)."""
    if key is not None:
        return None
    mode = _PLANE_MODE
    return (lambda sk: isinstance(sk, tuple) and len(sk) == 2
            and sk[1] == mode)


def materialize_plane_df(spark: SparkSession, df, view_name: str,
                         key: object,
                         bucket_cols: list[str] | None = None):
    """Materialize ONE plane DataFrame per the current ``_PLANE_MODE``
    and register it under ``view_name``; returns the materialized
    DataFrame (callers pin it in their plane state). "local" =
    ``localCheckpoint(eager=True)`` (single-JVM default); "table" =
    bucketed external warehouse table read back — the production
    fault-tolerance swap named in SCALE.md's policy table, and the
    bucketed layout removes downstream exchanges on ``bucket_cols``
    (the dominant downstream join/group key; first column when
    omitted — bucketing never changes semantics, only which exchanges
    disappear).

    Table naming: the name carries a dataset discriminator (hash of
    the plane key — driver keys are sf_dir strings, so repr is
    stable): a fixed per-view name would let a rebuild for ANOTHER
    dataset overwrite the table a still-pinned view resolves lazily —
    local mode was immune because localCheckpoint pins blocks per
    session. key=None has no dataset identity, so it discriminates by
    SESSION id instead (per-session table; a concurrent sibling
    session can't overwrite it). Two CONCURRENT sessions on the SAME
    explicit key still share one table name; the production form
    versions table names through the model-registry pattern (SCALE.md
    streaming-dims row) — out of scope for the local-mode
    demonstration."""
    if _PLANE_MODE == "table":
        import hashlib

        from aws_trusted_advisor_explorer_spark.sinks.writers import (
            write_bucketed_table,
        )

        ident = repr(key) if key is not None else f"nokey-{id(spark)}"
        disc = hashlib.md5(ident.encode()).hexdigest()[:8]
        tbl = f"plane_{view_name.strip('_')}_{disc}"
        # external table at the warehouse location: a MANAGED
        # saveAsTable refuses a leftover directory from a previous
        # process (LOCATION_ALREADY_EXISTS — the local derby catalog
        # is per-JVM but the warehouse dir persists), while an
        # external overwrite replaces it
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        loc = spark.conf.get(
            "spark.sql.warehouse.dir").rstrip("/") + "/" + tbl
        write_bucketed_table(df, tbl,
                             list(bucket_cols or df.columns[:1]),
                             path=loc)
        df = spark.table(tbl)
    else:
        df = df.localCheckpoint(eager=True)
    df.createOrReplaceTempView(view_name)
    return df


def register_session_plane(state: dict, spark: SparkSession, key: object,
                           view_name: str, df_factory,
                           bucket_cols: list[str] | None = None) -> str:
    """The common single-view plane shape: build a DataFrame once per
    (session, dataset, plane mode), materialize it per ``_PLANE_MODE``
    (:func:`materialize_plane_df`), register it under ``view_name``,
    pin it in ``state``. The multi-view planes (shingle + its
    ride-alongs, the prefix/span/cluster index families) keep their
    custom ``build`` functions but share the same materialization and
    (key, mode) cache-key discipline through
    :func:`materialize_plane_df` / :func:`plane_cache_key` /
    :func:`plane_key_ok`; everything else collapses to one call of
    this."""

    def build(spark):
        return [materialize_plane_df(spark, df_factory(spark), view_name,
                                     key, bucket_cols)]

    build.plane_label = view_name.strip("_")
    ensure_session_plane(state, spark, plane_cache_key(key), build,
                         key_ok=plane_key_ok(key))
    return view_name
