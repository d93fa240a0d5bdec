#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle over the same
parquet tables, aligns columns by sorted name, sorts rows, and compares
values exactly. Usage:

    python tools/check_correctness.py [--sf DIR] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(df, side, problems):
    """Driver-mimic canonicalization — STRICTER than the driver.

    The driver sorts rows by every column (pandas sort_values) and
    value-hashes the frame. That means (a) list/ndarray cells CRASH it
    (unhashable in lexsort), and (b) dtype differences between the two
    engines (e.g. DuckDB HUGEINT -> float64 vs Spark bigint -> int64)
    change the hash even when values compare equal. We flag both here
    instead of papering over them.
    """
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (list, np.ndarray, dict))).any()
            if bad:
                problems.append(
                    f"col {c} ({side}): array/map-typed cells — driver canonicalizer "
                    f"crashes on these (unhashable in sort)")
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(name, spark_pdf, oracle_pdf, problems):
    import numpy as np
    if list(spark_pdf.columns) != list(oracle_pdf.columns):
        problems.append(f"columns differ: spark={list(spark_pdf.columns)} "
                        f"oracle={list(oracle_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    for c in spark_pdf.columns:
        a, b = spark_pdf[c], oracle_pdf[c]
        ka, kb = a.dtype.kind, b.dtype.kind
        if str(a.dtype) != str(b.dtype) and not (ka == kb == "O"):
            problems.append(f"col {c}: DTYPE mismatch spark={a.dtype} oracle={b.dtype} "
                            f"(hash-diverges in driver even if values equal)")
        try:
            eq = (a.isna() & b.isna()) | (a == b)
            neq = (~eq).sum()
        except Exception as e:
            problems.append(f"col {c}: compare error {e}; dtypes {a.dtype} vs {b.dtype}")
            continue
        if neq:
            idx = (~eq).idxmax()
            problems.append(f"col {c}: {neq} mismatches; first at row {idx}: "
                            f"spark={a[idx]!r} oracle={b[idx]!r} "
                            f"(dtypes {a.dtype} vs {b.dtype})")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    from go_triton_spark.session import get_spark
    from go_triton_spark.operators import REGISTRY

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    names = args.names or list(REGISTRY)
    passed = failed = skipped = 0
    for name in names:
        qd = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = qd.spark(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            failed += 1
            continue
        if qd.oracle is None:
            print(f"skip  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            skipped += 1
            continue
        try:
            odf = con.sql(qd.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0][:160]}")
            failed += 1
            continue
        problems = []
        ndf_s = normalize(sdf, "spark", problems)
        ndf_o = normalize(odf, "oracle", problems)
        compare(name, ndf_s, ndf_o, problems)
        if problems:
            print(f"FAIL  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems[:4]:
                print(f"      {p}")
            failed += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
