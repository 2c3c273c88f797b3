#!/usr/bin/env python
"""Cross-engine parity check for the extension operators: run each
dual-dialect builder in Spark and DuckDB over the same parquet and
compare canonicalized results exactly (values, not approximations).

Usage: python scripts/check_ext_parity.py [sf_dir] [only_substring]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from aws_trusted_advisor_explorer_spark.functions.dual import SPARK, DUCK
from aws_trusted_advisor_explorer_spark.operators import (
    clusterops, corpusops, dedup, eventops, masking, multimodal,
    similarity, textops,
)
from aws_trusted_advisor_explorer_spark.session import get_spark, load_tables

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    spark = get_spark("ext_parity", cpus=8)
    load_tables(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    builders = {}
    for mod in (textops, dedup, similarity, eventops, multimodal, masking,
                corpusops, clusterops):
        builders.update(mod.BUILDERS)

    failures = []
    for name, build in builders.items():
        if only and only not in name:
            continue
        try:
            sdf = spark.sql(build(SPARK)).toPandas()
            ddf = con.sql(build(DUCK)).df()
            s, dd = canon(sdf), canon(ddf)
            if list(s.columns) != list(dd.columns):
                raise AssertionError(f"columns {list(s.columns)} vs {list(dd.columns)}")
            if len(s) != len(dd):
                raise AssertionError(f"rows {len(s)} vs {len(dd)}")
            for c in s.columns:
                a, b = s[c], dd[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    same = (a.astype("float64").fillna(-1) == b.astype("float64").fillna(-1)).all()
                else:
                    same = (a.astype(str) == b.astype(str)).all()
                if not same:
                    bad = (a.astype(str) != b.astype(str))
                    idx = bad[bad].index[:3]
                    raise AssertionError(
                        f"col {c} differs, e.g. {list(zip(a[idx], b[idx]))}")
            print(f"OK   {name:28s} rows={len(s)}")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name:28s} {type(e).__name__}: {str(e)[:300]}")

    # mapInPandas path (Spark-only impl, DuckDB oracle)
    if not only or "byte_stats" in only:
        try:
            s = canon(multimodal.media_byte_stats_df(spark).toPandas())
            dd = canon(con.sql(multimodal.media_byte_stats_oracle(DUCK)).df())
            assert len(s) == len(dd), f"rows {len(s)} vs {len(dd)}"
            for c in s.columns:
                assert (s[c].astype("float64") == dd[c].astype("float64")).all(), c
            print(f"OK   {'media_byte_stats':28s} rows={len(s)}")
        except Exception as e:  # noqa: BLE001
            failures.append("media_byte_stats")
            print(f"FAIL {'media_byte_stats':28s} {type(e).__name__}: {str(e)[:300]}")

    spark.stop()
    if failures:
        sys.exit(f"{len(failures)} failures: {failures}")
    print("all extension operators parity-clean")


if __name__ == "__main__":
    main()
