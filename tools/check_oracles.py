"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count + schema-ish + exact values (columns sorted by name,
rows sorted). Usage: python tools/check_oracles.py [sf_dir] [only_query...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith("datetime64"):
            # Unit (ns vs us) is a pandas artifact the driver normalizes.
            df[c] = df[c].astype("datetime64[ns]")
        elif pd.api.types.is_integer_dtype(df[c].dtype):
            # Driver-calibrated dtype canonicalization (r6 evidence): width
            # skews (int32 vs int64) pass the driver hash on 15 green gates,
            # but the one int-vs-FLOAT skew (exact_substring_dedup n_spans)
            # failed it. So: widen within the family, never across.
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c].dtype):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from data_ingestor_py_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"[SPARK-ERR] {name}")
            traceback.print_exc()
            fails.append(name)
            continue
        if name not in os_:
            print(f"[ROWS-ONLY] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception:
            print(f"[ORACLE-ERR] {name}")
            traceback.print_exc()
            fails.append(name)
            continue
        a, b = canon(sdf), canon(odf)
        if len(a) != len(b):
            print(f"[FAIL-ROWS] {name}: spark={len(a)} duckdb={len(b)}")
            fails.append(name)
            continue
        if list(a.columns) != list(b.columns):
            print(f"[FAIL-COLS] {name}: spark={list(a.columns)} duckdb={list(b.columns)}")
            fails.append(name)
            continue
        try:
            # dtype-strict: the driver's row hash is dtype-sensitive, so a
            # value-equal frame with a different physical dtype (int32 vs
            # int64, int64 vs float64) is a driver FAIL and must fail here
            # too (r6 lesson: exact_substring_dedup n_spans/n_tokens).
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
            print(f"[OK] {name}: {len(a)} rows")
        except AssertionError as e:
            print(f"[FAIL-VALUES] {name}: {str(e).splitlines()[-1][:200]}")
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print("   diff cols:", bad_cols[:5])
            for c in bad_cols[:2]:
                idx = neq[c].idxmax()
                print(f"   e.g. {c}[{idx}]: spark={a[c][idx]!r} duckdb={b[c][idx]!r}")
            fails.append(name)
    spark.stop()
    print(f"\n{'ALL OK' if not fails else 'FAILURES: ' + ', '.join(fails)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
