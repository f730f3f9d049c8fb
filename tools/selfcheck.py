"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, compares row count, sorted-column
value hash, and prints one line per query. Exit code 1 on any mismatch.

Usage: python tools/selfcheck.py [sf_dir] [query_prefix]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb


def _canon(pdf):
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def _hash(pdf) -> str:
    return hashlib.md5(
        _canon(pdf).to_csv(index=False, float_format="%.12g").encode()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from mmw_geoprocessing_spark.session import get_spark
    from mmw_geoprocessing_spark.sources.tables import TABLE_NAMES

    spark = get_spark(shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if prefix and not name.startswith(prefix):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t1 - t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        # dtype-kind strictness: the driver's hasher is dtype-sensitive
        # (DuckDB HUGEINT -> float64 vs Spark int64 caused r01 hash fails
        # that '%.12g' formatting hid locally), so flag kind mismatches.
        ok_kinds = ok_cols and all(
            sdf[c].dtype.kind == ddf[c].dtype.kind for c in sdf.columns
        )
        ok_hash = ok_rows and ok_cols and ok_kinds and _hash(sdf) == _hash(ddf)
        status = "OK  " if ok_hash else "FAIL"
        failures += not ok_hash
        kinds = "" if ok_kinds else " DTYPE-KIND MISMATCH: " + ", ".join(
            f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}"
            for c in (sdf.columns if ok_cols else [])
            if ddf[c].dtype.kind != sdf[c].dtype.kind
        )
        print(
            f"{status}  {name}: spark {len(sdf)} rows / duck {len(ddf)} rows, "
            f"cols_match={ok_cols} hash_match={ok_hash} [{t1 - t0:.1f}s]{kinds}"
        )
        if not ok_hash and ok_cols and ok_rows:
            s, d = _canon(sdf), _canon(ddf)
            neq = (s != d).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                print(f"      first diff row {i}:\n      spark: {s.iloc[i].to_dict()}\n      duck : {d.iloc[i].to_dict()}")
    print(f"\n{failures} failures / {len([k for k in qs if k.startswith(prefix)])} queries")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
