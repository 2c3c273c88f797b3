#!/usr/bin/env python
"""Core-count scaling measurement at a ~10x-sf0.1 stretch corpus
(r12 verdict item 6: at sf0.1 every key is fixed-overhead-bound and
the 8-vs-32-core ratios sit at ~1, so the local bench cannot
demonstrate scaling; this builds a dataset big enough to bend).

Stretch build (deterministic, one-time, /tmp): each row-scaled table
is the sf0.1 table unioned with 9 perturbed replicas.

- ``documents``: per-replica vowel ROTATION of the text (replica r
  translates 'aeiou' to a rotation of itself), so tokens differ
  across replicas and the near-dup cluster structure is preserved
  WITHIN each replica but not multiplied ACROSS replicas — pair
  relations grow ~10x like the corpus, not ~100x.
- ``embeddings``: vec_id offset + per-replica deterministic sign flip
  pattern over dims (norms preserved; cross-replica cosines decorrelate
  so cluster sizes stay ~constant and within-cluster pair counts grow
  ~10x).
- ``events``/``lineitem``/``orders``/``customer``/``part``/
  ``supplier``: id/key offsets only (grouping keys stay disjoint per
  replica).

Method: for each core count (32, 8) run a fresh session over the
stretch dir, one warm pass + min of 2 timed passes (bench.py's
methodology) over a fixed subset of the heaviest keys. Writes one JSON
line to stdout (redirect to bench_results/core_scaling.json);
SCALING.md's core-scaling section reads it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1_scale"
REPLICAS = 10
KEYS = (
    "dedup_clusters",            # triggers shingle/gram_fold/minhash planes
    "dedup_band_tuning",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "docs_contamination",
    "docs_span_scrub",
    "docs_release_refresh",
    "docs_ccnet_buckets",
    "text_bpe_tokenize_count",
    "docs_dsir_importance",
    "knn_pca_prefix",
    "events_sessionize",
    "tpch_q9",
    "view_low_util_ec2",
)


def build_stretch_dir() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    done = os.path.join(DST, "_DONE")
    if os.path.exists(done):
        return
    con = duckdb.connect()

    def reps(sql_for_r) -> str:
        return "\nUNION ALL\n".join(sql_for_r(r) for r in range(REPLICAS))

    vowels = "aeiou"

    def docs_r(r: int) -> str:
        rot = vowels[r % 5:] + vowels[:r % 5]
        src = f"'{SRC}/documents.parquet'"
        if r == 0:
            return f"SELECT * FROM {src}"
        return (f"SELECT doc_id + {r} * (SELECT max(doc_id) + 1 FROM {src})"
                f" AS doc_id, translate(text, '{vowels}', '{rot}') AS text,"
                f" lang, source, n_chars FROM {src}")

    def emb_r(r: int) -> str:
        src = f"'{SRC}/embeddings.parquet'"
        if r == 0:
            return f"SELECT * FROM {src}"
        # deterministic per-replica dim ROTATION: norms unchanged,
        # cross-replica cosines decorrelated (a rotated generic vector
        # is near-orthogonal to its original)
        k = (7 * r) % 63 + 1
        cols = con.sql(f"SELECT * FROM {src} LIMIT 0").columns
        sel = ", ".join(
            (f"vec_id + {r} * (SELECT max(vec_id) + 1 FROM {src})"
             f" AS vec_id") if c == "vec_id" else
            (f"list_concat(embedding[{k + 1}:], embedding[1:{k}])"
             f" AS embedding") if c == "embedding" else c
            for c in cols)
        return f"SELECT {sel} FROM {src}"

    def offset_r(table: str, id_cols: list[str], r: int) -> str:
        src = f"'{SRC}/{table}.parquet'"
        if r == 0:
            return f"SELECT * FROM {src}"
        cols = con.sql(f"SELECT * FROM {src} LIMIT 0").columns
        sel = ", ".join(
            (f"{c} + {r} * (SELECT max({c}) + 1 FROM {src}) AS {c}"
             if c in id_cols else c) for c in cols)
        return f"SELECT {sel} FROM {src}"

    jobs = {
        "documents": reps(docs_r),
        "embeddings": reps(emb_r),
        "events": reps(lambda r: offset_r("events", ["user_id"], r)),
        "lineitem": reps(lambda r: offset_r("lineitem", ["l_orderkey"], r)),
        "orders": reps(lambda r: offset_r(
            "orders", ["o_orderkey", "o_custkey"], r)),
        "customer": reps(lambda r: offset_r("customer", ["c_custkey"], r)),
        "part": reps(lambda r: offset_r("part", ["p_partkey"], r)),
        "supplier": reps(lambda r: offset_r("supplier", ["s_suppkey"], r)),
    }
    for t, sql in jobs.items():
        out = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(out):
            con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    for t in ("region", "nation"):
        link = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    with open(done, "w") as f:
        f.write("ok")


def run_at(cpus: int) -> dict:
    # fresh interpreter state per core count would need a subprocess;
    # a fresh SparkSession per core count is enough because every
    # session-plane cache is keyed by session id (a new session
    # rebuilds its planes)
    import subprocess

    child = os.path.join(os.path.dirname(__file__),
                         "_core_scaling_child.py")
    out = subprocess.run(
        [sys.executable, child, DST, str(cpus), ",".join(KEYS)],
        capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-4000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    t0 = time.perf_counter()
    build_stretch_dir()
    build_sec = round(time.perf_counter() - t0, 1)
    res = {"stretch_dir": DST, "replicas": REPLICAS,
           "build_sec": build_sec, "keys": {}}
    per_cpu = {}
    for cpus in (32, 8):
        per_cpu[cpus] = run_at(cpus)
    for k in KEYS:
        t32 = per_cpu[32]["timings"].get(k)
        t8 = per_cpu[8]["timings"].get(k)
        res["keys"][k] = {
            "sec_32": t32, "sec_8": t8,
            "ratio_8_over_32": (round(t8 / t32, 2)
                                if t32 and t8 else None)}
    res["total_32"] = per_cpu[32]["total"]
    res["total_8"] = per_cpu[8]["total"]
    res["planes_32"] = per_cpu[32]["planes"]
    res["planes_8"] = per_cpu[8]["planes"]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
