"""Mimic the driver's verify: entry() smoke + every queries() vs oracle_sql()
at sf0.01 (row count + sorted-column schema + order-insensitive values)."""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent
from aws_trusted_advisor_explorer_spark.session import get_spark
from tests.conftest import TABLE_NAMES, canonicalize

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark("verify_entry")

    t0 = time.time()
    n = ent.entry(spark).count()
    print(f"entry(): {n} rows in {time.time() - t0:.1f}s")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, os_ = ent.queries(), ent.oracle_sql()
    rc, n_ok = 0, 0
    for key, fn in qs.items():
        t0 = time.time()
        try:
            sdf = canonicalize(fn(spark, SF).toPandas())
            if key not in os_:
                print(f"  {key}: rows-only ({len(sdf)}) [{time.time()-t0:.1f}s]")
                n_ok += 1
                continue
            ddf = canonicalize(con.sql(os_[key]).df())
            assert list(sdf.columns) == list(ddf.columns), (
                f"cols\n  s={list(sdf.columns)}\n  d={list(ddf.columns)}")
            assert len(sdf) == len(ddf), f"rows {len(sdf)} vs {len(ddf)}"
            if len(sdf) and not sdf.equals(ddf):
                neq = (sdf != ddf).any(axis=0)
                raise AssertionError(f"values differ in {list(neq[neq].index)}")
            print(f"  {key}: OK {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_ok += 1
        except Exception as e:
            print(f"  {key}: FAIL {str(e)[:300]}")
            rc = 1
    print(f"{n_ok}/{len(qs)} queries pass")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
