"""Local mirror of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same sf dir, compare row count,
column names, and values (column-name-sorted, row-sorted).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def compare(name, sdf, ddf_rows, ddf_cols):
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf_cols)
    if s_cols != d_cols:
        return f"SCHEMA: spark={s_cols} duck={d_cols}"
    s_rows = [tuple(norm(r[c]) for c in s_cols) for r in sdf.collect()]
    d_idx = {c: i for i, c in enumerate(ddf_cols)}
    d_rows = [tuple(norm(r[d_idx[c]]) for c in s_cols) for r in ddf_rows]
    if len(s_rows) != len(d_rows):
        return f"ROWS: spark={len(s_rows)} duck={len(d_rows)}"
    s_sorted = sorted(s_rows, key=repr)
    d_sorted = sorted(d_rows, key=repr)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            return f"VALUES at sorted-row {i}: spark={a} duck={b}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # the golden-parquet oracles are scale-keyed: point them at this run's sf
    os.environ["SPARK_GRAFT_CORRECTNESS_SF"] = sf_dir

    import __spark_entry__ as entrymod
    from binlog_spark.session import get_spark_shipped

    spark = get_spark_shipped("contract-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                res = con.execute(oracles[name])
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
                err = compare(name, sdf, d_rows, d_cols)
                status = err or f"OK ({len(d_rows)} rows)"
            else:
                n = sdf.count()
                err = None if n >= 0 else "NEGATIVE"
                status = f"rows-only OK ({n} rows)"
        except Exception as e:
            err = f"EXCEPTION: {type(e).__name__}: {e}"
            status = err
        dt = time.time() - t0
        print(f"{name:28s} {dt:6.1f}s  {status[:200]}")
        if err:
            failures.append((name, err))
    print()
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for n, e in failures:
            print(f"  {n}: {e[:500]}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
