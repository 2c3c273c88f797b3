"""Training-data shard I/O round-trips: JSONL and WebDataset-style tar
shards must reproduce the source relation exactly (keys, payload
bytes), shard sizing must respect samples_per_shard, and shard names
must be retry-stable."""

from __future__ import annotations

import os
import tarfile

from pyspark.sql import functions as F

from aws_trusted_advisor_explorer_spark.sinks import shards
from tests.conftest import SF_DIR


def test_jsonl_round_trip(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    shards.write_jsonl(src.select("doc_id", "text", "lang", "source"),
                       out, partitions=4)
    back = shards.read_jsonl(spark, out)
    a = {(r.doc_id, r.text, r.lang, r.source) for r in src.collect()}
    b = {(r.doc_id, r.text, r.lang, r.source) for r in back.collect()}
    assert a == b
    assert back.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string>")


def test_webdataset_round_trip_and_shard_sizing(spark, tmp_path):
    src = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
           .select("doc_id", F.expr("cast(text as binary)").alias("payload")))
    out = str(tmp_path / "wds")
    n_docs = src.count()
    shards.write_webdataset_shards(src.repartition(4), out,
                                   samples_per_shard=50)
    files = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert files, "no shards written"
    # every shard respects the cap; names are (partition, chunk)-stable
    for f in files:
        with tarfile.open(os.path.join(out, f)) as tar:
            members = tar.getmembers()
            assert 0 < len(members) <= 50
            assert all(m.mtime == 0 for m in members)  # deterministic bytes
        part, chunk = f[len("shard-"):-len(".tar")].split("-")
        assert part.isdigit() and chunk.isdigit()

    back = shards.read_webdataset_shards(spark, out)
    assert back.count() == n_docs
    a = {(r.doc_id, bytes(r.payload)) for r in src.collect()}
    b = {(r.doc_id, bytes(r.payload)) for r in back.collect()}
    assert a == b


def test_webdataset_stale_temp_sweep_is_age_gated(spark, tmp_path):
    """ADVICE r7: the stale-temp sweep must reclaim ONLY orphans older
    than STALE_TEMP_AGE_S — a fresh '.inprogress-*' (a live attempt's
    staging file under the single-writer contract's edge cases) is
    left alone; a prior crashed run's old orphan is removed."""
    import time

    out = tmp_path / "wds_sweep"
    os.makedirs(out)
    old = out / "shard-00000-0000.tar.inprogress-1"
    fresh = out / "shard-00001-0000.tar.inprogress-2"
    old.write_bytes(b"stale")
    fresh.write_bytes(b"live")
    stale_t = time.time() - shards.STALE_TEMP_AGE_S - 60
    os.utime(old, (stale_t, stale_t))

    src = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
           .select("doc_id", F.expr("cast(text as binary)").alias("payload"))
           .limit(2))
    shards.write_webdataset_shards(src, str(out), samples_per_shard=10)
    assert not old.exists(), "old orphan must be swept"
    assert fresh.exists(), "fresh staging file must survive the sweep"


def test_webdataset_empty_partitions_ok(spark, tmp_path):
    src = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
           .select("doc_id", F.expr("cast(text as binary)").alias("payload"))
           .limit(3))
    out = str(tmp_path / "wds_small")
    # more partitions than rows -> most partitions are empty
    shards.write_webdataset_shards(src.repartition(8), out,
                                   samples_per_shard=10)
    back = shards.read_webdataset_shards(spark, out)
    assert back.count() == 3


def test_compact_table_reduces_files_and_preserves_rows(spark, tmp_path):
    from aws_trusted_advisor_explorer_spark.sinks import writers

    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "fragmented")
    # land deliberately fragmented: one file per row-ish
    src.repartition(64).write.parquet(path)
    n_rows = src.count()
    before = len([f for f in os.listdir(path) if f.startswith("part-")])
    assert before >= 32

    n_after = writers.compact_table(spark, path)
    after = len([f for f in os.listdir(path) if f.startswith("part-")])
    assert after == n_after
    assert after < before
    back = spark.read.parquet(path)
    assert back.count() == n_rows
    assert {r.doc_id for r in back.select("doc_id").collect()} == \
        {r.doc_id for r in src.select("doc_id").collect()}


def test_range_sorted_layout_enables_file_skipping(spark, tmp_path):
    """The written files must cover pairwise-disjoint ts ranges (the
    property parquet min/max skipping needs), and a narrow ts filter
    must reach the scan as a pushed filter."""
    import pyarrow.parquet as pq

    from aws_trusted_advisor_explorer_spark.session import load_tables
    from aws_trusted_advisor_explorer_spark.sinks import writers

    load_tables(spark, SF_DIR)
    path = str(tmp_path / "events_ranged")
    writers.write_range_sorted(spark.table("events"), path, "ts", n_files=8)

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.startswith("part-"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        schema_idx = md.schema.names.index("ts")
        lo = min(md.row_group(i).column(schema_idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(schema_idx).statistics.max
                 for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file ranges overlap — skipping impossible"

    back = spark.read.parquet(path)
    mid = ranges[len(ranges) // 2]
    plan = (back.filter(back.ts >= mid[0])._jdf.queryExecution()
            .executedPlan().toString())
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in plan
    # row counts preserved
    assert back.count() == spark.table("events").count()


def test_zorder_layout_boxes_both_dims(spark, tmp_path):
    """Z-ordered files must cover compact boxes in (doc_id, n_chars)
    space: a box predicate on BOTH columns and a narrow predicate on
    EACH single column alike must be satisfiable from a strict subset
    of files (by parquet min/max stats), and the data must round-trip
    exactly."""
    import pyarrow.parquet as pq

    from aws_trusted_advisor_explorer_spark.session import load_tables
    from aws_trusted_advisor_explorer_spark.sinks import writers

    load_tables(spark, SF_DIR)
    src = spark.table("documents").select("doc_id", "n_chars", "lang")
    path = str(tmp_path / "docs_zordered")
    writers.write_zorder(src, path, "doc_id", "n_chars", n_files=16)

    boxes = []
    for f in sorted(os.listdir(path)):
        if not f.startswith("part-"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        ia = md.schema.names.index("doc_id")
        ib = md.schema.names.index("n_chars")
        boxes.append((
            min(md.row_group(i).column(ia).statistics.min
                for i in range(md.num_row_groups)),
            max(md.row_group(i).column(ia).statistics.max
                for i in range(md.num_row_groups)),
            min(md.row_group(i).column(ib).statistics.min
                for i in range(md.num_row_groups)),
            max(md.row_group(i).column(ib).statistics.max
                for i in range(md.num_row_groups)),
        ))
    assert len(boxes) >= 8

    lo_a = min(b[0] for b in boxes); hi_a = max(b[1] for b in boxes)
    lo_b = min(b[2] for b in boxes); hi_b = max(b[3] for b in boxes)
    qa = (lo_a, lo_a + (hi_a - lo_a) // 8)          # narrow doc_id slice
    qb = (lo_b, lo_b + (hi_b - lo_b) // 8)          # narrow n_chars slice

    hit_a = sum(1 for b in boxes if not (b[1] < qa[0] or b[0] > qa[1]))
    hit_b = sum(1 for b in boxes if not (b[3] < qb[0] or b[2] > qb[1]))
    hit_box = sum(1 for b in boxes
                  if not (b[1] < qa[0] or b[0] > qa[1])
                  and not (b[3] < qb[0] or b[2] > qb[1]))
    # each single-dim predicate skips files; the box skips even more
    assert hit_a < len(boxes)
    assert hit_b < len(boxes)
    assert hit_box <= min(hit_a, hit_b)
    assert hit_box <= len(boxes) // 2

    back = spark.read.parquet(path)
    assert back.count() == src.count()
    assert ({(r.doc_id, r.n_chars) for r in back.collect()} ==
            {(r.doc_id, r.n_chars) for r in src.collect()})


def test_compact_table_csv_preserves_header_and_rows(spark, tmp_path):
    """Regression (review finding): CSV compaction must treat part-file
    header lines as headers on read AND write them back — pre-fix the
    headerless round-trip folded each part file's header into the data
    and shifted every column to _c0.._cN."""
    import pandas as pd

    from aws_trusted_advisor_explorer_spark.sinks import writers

    pdf = pd.DataFrame({"k": list(range(20)),
                        "v": [f"val{i}" for i in range(20)]})
    src = spark.createDataFrame(pdf)
    path = str(tmp_path / "csv_frag")
    src.repartition(8).write.option("header", True).csv(path)

    writers.compact_table(spark, path, fmt="csv")
    back = spark.read.option("header", True).csv(path)
    assert back.columns == ["k", "v"]
    assert back.count() == 20
    assert {(int(r.k), r.v) for r in back.collect()} == \
        {(int(r.k), f"val{int(r.k)}") for _, r in pdf.iterrows()}


def test_zorder_key_survives_nanosecond_spans(spark):
    """Regression (review finding): (v - lo) * grid overflowed int64
    for spans past ~1.4e14 (nanosecond epochs); the divide-by-stride
    key must evaluate under ANSI, stay within the grid, and remain
    monotone in each input."""
    from aws_trusted_advisor_explorer_spark.sinks import writers

    lo, hi = 1_700_000_000_000_000_000, 1_760_000_000_000_000_000  # ns
    vals = [lo, lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3, hi]
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], ["ts_ns", "k"])
    key = writers.zorder_key_expr("ts_ns", "k", (lo, hi, 0, 3))
    rows = df.select("ts_ns", key.alias("z")).orderBy("ts_ns").collect()
    zs = [r.z for r in rows]
    assert all(z >= 0 for z in zs)
    assert zs == sorted(zs)        # monotone along the a-axis (b fixed-ish)
    assert zs[-1] < 1 << 34        # interleave of two 16-bit grids


def test_zorder_stride_is_ceiling_for_spans_just_past_grid(spark):
    """Regression (review finding): a FLOOR stride maps up to half the
    domain onto the single top grid cell for spans in (grid, 2*grid)
    — e.g. span 100000 with grid 65535 clamped every value past 65535
    into cell 65535. With the ceiling stride, values spread across
    distinct cells over the whole range and the key stays monotone."""
    from aws_trusted_advisor_explorer_spark.sinks import writers

    lo, hi = 0, 100_000             # span 100000, grid 65535 -> stride 2
    vals = [0, 65_000, 70_000, 80_000, 90_000, 100_000]
    df = spark.createDataFrame(
        [(v, 0) for v in vals], ["a", "b"])
    key = writers.zorder_key_expr("a", "b", (lo, hi, 0, 1))
    rows = df.select("a", key.alias("z")).orderBy("a").collect()
    zs = [r.z for r in rows]
    assert zs == sorted(zs)
    # the top-region values must land in DISTINCT cells, not one
    # clamped top cell (pre-fix zs[2:] were all identical)
    assert len(set(zs[2:])) == len(zs[2:])
