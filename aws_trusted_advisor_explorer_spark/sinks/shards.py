"""Training-data shard I/O: JSONL and WebDataset-style tar shards.

LLM training pipelines consume corpora as line-delimited JSON (text
datasets) or tar shards of per-sample files (multimodal, the
WebDataset convention: ``<key>.<ext>`` members, samples grouped by
key, shards consumed sequentially by data loaders). Neither needs
anything beyond Spark's JSON source and the stdlib ``tarfile`` — the
shard writer is a ``mapPartitions`` pass, one shard file per
partition-chunk, so shard production parallelism == task parallelism
and no sample ever passes through the driver.

Scale posture (100 TB):
- JSONL rides Spark's native json source — distributed read/write,
  predicate/column pruning on read via the explicit schema (a
  schema-less ``spark.read.json`` would pay an extra inference scan).
- Tar shards write ``samples_per_shard`` samples per ``.tar`` from
  each input partition (``repartition`` upstream controls shard count
  and size; data loaders want shards of O(100 MB)–O(1 GB)). Shard
  names embed (partition id, chunk no) so distinct tasks never
  collide; a retried/speculative attempt stages under an
  attempt-unique temp name and atomically renames on completion, so
  two attempts at the same partition never interleave bytes in one
  file.
- The reader lists shards as a DataFrame of paths and expands them
  with ``mapPartitions`` — each task streams whole tar files, the
  natural unit of locality for shard-based loaders.
"""

from __future__ import annotations

import io
import os
import tarfile
import time

from pyspark.sql import DataFrame, Row, SparkSession

JSONL_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING"

# '.inprogress-*' staging files older than this are orphans of a
# crashed prior run and safe to reclaim; younger ones may belong to a
# live attempt and are left alone (see write_webdataset_shards)
STALE_TEMP_AGE_S = 3600.0


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Land a corpus as line-delimited JSON (one object per line, one
    file per partition) — the lingua franca of text-corpus exchange."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: str = JSONL_SCHEMA) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema — no inference scan,
    and corrupt lines surface in the standard ``_corrupt_record``
    pattern rather than silently widening types."""
    return spark.read.schema(schema).json(path)


def write_webdataset_shards(df: DataFrame, path: str,
                            samples_per_shard: int = 1000,
                            key_col: str = "doc_id",
                            payload_col: str = "payload",
                            ext: str = "bin") -> None:
    """WebDataset-style shard writer: tar files whose members are
    ``<key>.<ext>``, ``samples_per_shard`` samples per shard, written
    via ``mapPartitions`` (shard parallelism == task parallelism; the
    driver never sees a payload). Shards are named
    ``shard-<partition>-<chunk>.tar`` — unique per task AND stable
    across retries; each shard is staged under an attempt-unique temp
    name and PUBLISHED with an atomic rename, so a speculative twin
    and the original never interleave writes into one file (the
    last complete shard wins). NULL payloads are skipped (the media
    kernels' rule — no bytes, no member). ``path`` must be storage
    every executor can reach (shared FS / object-store mount); on
    local[n] any directory works.

    Concurrency contract: ONE writer job per ``path`` at a time (the
    WebDataset convention — a shard directory is produced by a single
    job, then consumed read-only). The stale-temp sweep below enforces
    it conservatively: it only removes ``.inprogress-*`` files older
    than ``STALE_TEMP_AGE_S``, so the live staging files of a writer
    that violates the contract (or of THIS job's own just-launched
    tasks on a shared-FS relisting) are never swept — only orphans
    from a prior crashed run are."""
    os.makedirs(path, exist_ok=True)
    # stale-temp sweep: a killed speculative/failed attempt from a
    # PRIOR run may have orphaned its staged file (the attempt can die
    # between open and the finally). Age-gated (ADVICE r7): a fresh
    # run reclaims old orphans without racing any concurrent writer's
    # seconds-old staging files.
    now = time.time()
    for f in os.listdir(path):
        if ".inprogress-" in f:
            full = os.path.join(path, f)
            try:
                if now - os.path.getmtime(full) > STALE_TEMP_AGE_S:
                    os.unlink(full)
            except OSError:
                pass
    cols = [key_col, payload_col]

    def write_partition(idx: int, rows):
        from pyspark import TaskContext

        attempt = TaskContext.get().taskAttemptId() \
            if TaskContext.get() else 0
        n_shards = 0
        tar, chunk, count = None, 0, 0
        tmp_name = final_name = None

        def publish():
            os.replace(tmp_name, final_name)

        try:
            for row in rows:
                if row[1] is None:
                    continue
                if tar is None:
                    final_name = os.path.join(
                        path, f"shard-{idx:05d}-{chunk:04d}.tar")
                    tmp_name = f"{final_name}.inprogress-{attempt}"
                    tar = tarfile.open(tmp_name, "w")
                payload = bytes(row[1])
                info = tarfile.TarInfo(name=f"{row[0]}.{ext}")
                info.size = len(payload)
                info.mtime = 0  # deterministic shard bytes
                tar.addfile(info, io.BytesIO(payload))
                count += 1
                if count >= samples_per_shard:
                    tar.close()
                    publish()
                    n_shards += 1
                    tar, chunk, count = None, chunk + 1, 0
            if tar is not None:
                tar.close()
                publish()
                tar = None
                n_shards += 1
        finally:
            # a failing attempt removes its own staged file instead of
            # leaking one '.inprogress-*' per in-flight shard per retry
            if tar is not None:
                try:
                    tar.close()
                    os.unlink(tmp_name)
                except OSError:
                    pass
        yield n_shards

    (df.select(*cols).rdd
       .mapPartitionsWithIndex(write_partition)
       .sum())  # action; per-task shard counts reduce to a total


def read_webdataset_shards(spark: SparkSession, path: str,
                           ext: str = "bin") -> DataFrame:
    """Expand tar shards back to (key, payload) rows: the shard list
    is parallelized as a DataFrame of paths and each task streams its
    whole shards — the same shard-level locality a training data
    loader uses."""
    shard_paths = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".tar"))

    def read_shards(rows):
        for row in rows:
            with tarfile.open(row.shard_path, "r") as tar:
                for member in tar.getmembers():
                    if not member.name.endswith(f".{ext}"):
                        continue
                    payload = tar.extractfile(member).read()
                    key = int(member.name[: -len(ext) - 1])
                    yield Row(doc_id=key, payload=bytearray(payload))

    paths_df = spark.createDataFrame(
        [(p,) for p in shard_paths], "shard_path STRING")
    return paths_df.rdd.mapPartitions(read_shards).toDF(
        "doc_id BIGINT, payload BINARY")
