#!/usr/bin/env python
"""Measured evidence for the IVF serving-probe claim (r9): the ANN
index is parquet PARTITIONED BY the coarse bucket
(similarity.build_ivf_index), and the docstring claims "a probe of
bucket b touches only bucket=b files". This script measures exactly
that, with file counts taken from the EXECUTED scan's numFiles metric
(never inputFiles(), which lists pre-pruning) — the single-query
serving shape, not the batch evaluation join the bench rows time.

Workload: sf0.1 embeddings landed two ways — (a) the real
bucket-partitioned IVF index, (b) the same rows flat (one file per
bucket's worth of rows, NOT bucket-aligned) — then ONE query vector's
top-k probe of its own cell. The partitioned probe must touch only
its cell's files (PartitionFilters prune the tree); the flat probe
reads every file and row-filters after the fact. Result equality
(identical top-k neighbor ids + cosines) is asserted between layouts.

Writes bench_results/IVF_PRUNING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_MD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_results", "IVF_PRUNING.md")


def files_read(df) -> int:
    """Executed FileSourceScanExec numFiles total (same walk as
    scripts/bench_partition_pruning.py: descend AdaptiveSparkPlanExec
    via executedPlan() and *QueryStageExec via plan() — query stages
    report empty children())."""
    df.collect()
    jplan = df._jdf.queryExecution().executedPlan()
    total = 0
    stack = [jplan]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        if cls == "FileSourceScanExec":
            total += node.metrics().apply("numFiles").value()
        kids = node.children()
        for i in range(kids.length()):
            stack.append(kids.apply(i))
    return int(total)


def _time_noop(df) -> float:
    best = None
    for _ in range(3):  # 1 warm + min of 2
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from aws_trusted_advisor_explorer_spark.functions import vectorized as V
    from aws_trusted_advisor_explorer_spark.operators.similarity import (
        N_PLANES, QUERY_MOD, TOP_K, build_filtered_ivf_index,
        build_ivf_index,
    )
    from aws_trusted_advisor_explorer_spark.session import (
        get_spark, load_tables,
    )

    spark = get_spark("ivf_pruning_bench")
    load_tables(spark, SF_DIR)
    idx = build_ivf_index(spark, SF_DIR)
    part = spark.read.parquet(idx)
    n_buckets = part.select("bucket").distinct().count()

    # one deterministic query vector + its cell
    qrow = (part.where(f"vec_id % {QUERY_MOD} = 0")
            .orderBy("vec_id").limit(1).collect()[0])
    qdf = spark.createDataFrame(
        [(int(qrow.vec_id), [float(x) for x in qrow.embedding])],
        "query_id bigint, q_emb array<double>")

    with tempfile.TemporaryDirectory() as tmp:
        flat_path = f"{tmp}/flat"
        # same rows, bucket as a plain column, one file per bucket's
        # worth of rows but NOT bucket-aligned
        part.repartition(n_buckets).write.parquet(flat_path)

        def probe(path):
            corpus = (spark.read.parquet(path)
                      .where(F.col("bucket") == int(qrow.bucket))
                      .where(f"vec_id % {QUERY_MOD} != 0"))
            scored = (corpus.crossJoin(F.broadcast(qdf))
                      .select("query_id",
                              F.col("vec_id").alias("neighbor_id"),
                              V.pair_cosine("q_emb", "embedding")
                              .alias("cosine")))
            return (scored.orderBy(F.desc("cosine"), "neighbor_id")
                    .limit(TOP_K))

        # files_read must run on a FRESH DataFrame as its FIRST action:
        # a re-execution of an already-finalized adaptive plan can
        # leave the scan's numFiles metric at 0 (measured — the first
        # execution reports 1, a collect-then-re-walk reports 0), so
        # each measurement gets its own plan
        n_files_pruned = files_read(probe(idx))
        n_files_flat = files_read(probe(flat_path))
        total_files = len(part.inputFiles())

        # multi-probe widening: own cell + the N_PLANES hamming-1
        # cells — the PartitionFilters set grows to O(probes), still
        # never the corpus
        probes = [int(qrow.bucket)] + [int(qrow.bucket) ^ (1 << j)
                                       for j in range(N_PLANES)]
        mp = (spark.read.parquet(idx)
              .where(F.col("bucket").isin(probes))
              .where(f"vec_id % {QUERY_MOD} != 0")
              .crossJoin(F.broadcast(qdf))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      V.pair_cosine("q_emb", "embedding").alias("cosine"))
              .orderBy(F.desc("cosine"), "neighbor_id").limit(TOP_K))
        n_files_multi = files_read(mp)
        assert n_files_pruned <= n_files_multi <= len(probes), \
            (n_files_pruned, n_files_multi, probes)

        pruned_q, flat_q = probe(idx), probe(flat_path)
        got_p = [(int(r.neighbor_id), float(r.cosine))
                 for r in pruned_q.collect()]
        got_f = [(int(r.neighbor_id), float(r.cosine))
                 for r in flat_q.collect()]
        assert got_p == got_f and len(got_p) > 0, (got_p, got_f)

        plan = pruned_q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan, plan
        assert n_files_pruned < n_files_flat, (n_files_pruned,
                                               n_files_flat)

        t_pruned = _time_noop(pruned_q)
        t_flat = _time_noop(flat_q)

    # FILTERED search (r9): the two-level (bucket, label) layout —
    # one (bucket=b, label=l) probe must touch strictly fewer files
    # than the bucket-only probe touches for the same cell
    fidx = build_filtered_ivf_index(spark, SF_DIR)
    fpart = spark.read.parquet(fidx)
    total_files_f = len(fpart.inputFiles())
    frow = (fpart.where(f"vec_id % {QUERY_MOD} = 0")
            .orderBy("vec_id").limit(1).collect()[0])
    fprobe = (fpart
              .where((F.col("bucket") == int(frow.bucket))
                     & (F.col("label") == int(frow.label)))
              .where(f"vec_id % {QUERY_MOD} != 0"))
    n_files_filtered = files_read(fprobe.select("vec_id"))
    n_files_cell_only = files_read(
        fpart.where(F.col("bucket") == int(frow.bucket))
        .select("vec_id"))
    # STRICTLY fewer — the generated prose claims the label prunes
    # within the cell; a degenerate single-label cell must fail the
    # run loudly rather than publish evidence the run didn't show
    assert n_files_filtered < n_files_cell_only, (
        n_files_filtered, n_files_cell_only)

    result = {
        "sf_dir": SF_DIR, "bucket": int(qrow.bucket),
        "n_buckets": n_buckets,
        "files_pruned": n_files_pruned, "files_flat": n_files_flat,
        "files_multiprobe": n_files_multi,
        "n_probes": len(probes),
        "files_total": total_files,
        "sec_pruned": round(t_pruned, 3), "sec_flat": round(t_flat, 3),
        "files_filtered_probe": n_files_filtered,
        "files_cell_only_probe": n_files_cell_only,
        "files_total_filtered_index": total_files_f,
    }
    os.makedirs(os.path.dirname(OUT_MD), exist_ok=True)
    with open(OUT_MD, "w") as f:
        f.write(f"""# IVF_PRUNING — measured serving-probe file skipping (r9)

GENERATED by `scripts/bench_ivf_pruning.py` at {SF_DIR}: ONE query
vector's top-{TOP_K} probe of its own coarse cell, against (a) the
real bucket-partitioned IVF index (`similarity.build_ivf_index`) and
(b) the identical rows landed flat; file counts from the executed
scan's own numFiles metric, top-k ids + cosines asserted identical
between layouts.

| layout | files touched | wall |
|---|---|---|
| flat parquet (bucket filter after full scan) | {n_files_flat} | {t_flat:.2f}s |
| bucket-partitioned index (PartitionFilters prune) | {n_files_pruned} of {total_files} | {t_pruned:.2f}s |
| same index, multi-probe (own + {len(probes) - 1} hamming-1 cells) | {n_files_multi} of {total_files} | — |
| two-level (bucket, label) index: whole-cell scan | {n_files_cell_only} of {total_files_f} | — |
| two-level index: FILTERED (bucket, label) probe | {n_files_filtered} of {total_files_f} | — |

Reading: the serving probe opens only its cell's partition
({n_files_pruned} file(s) of {total_files} across {n_buckets}
buckets) — the directory tree IS the coarse quantizer, which is what
lets a single ANN lookup against a 100 TB corpus read
corpus/{n_buckets} bytes instead of the corpus. Multi-probe widens
the PartitionFilters set to the hamming-1 neighbor cells and the scan
grows to {n_files_multi} files — O(probes), never the corpus. The
batch bench rows (`knn_ivf`, `knn_ivf_multiprobe`) time the
all-queries evaluation join, which legitimately touches every cell;
this artifact pins the per-query serving shape the index exists for.
FILTERED search (r9, `knn_filtered_df`): the two-level
(bucket, label) layout turns the metadata predicate into a second
PartitionFilters column — the filtered probe reads
{n_files_filtered} of {total_files_f} files where the whole-cell
scan of the same index reads {n_files_cell_only}; at 100 TB the
predicate prunes data the way the coarse cell does, instead of
post-filtering an unconstrained candidate read.
""")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
