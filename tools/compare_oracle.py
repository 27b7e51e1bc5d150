"""Dev harness mirroring the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compare row-count + schema(names) + order-insensitive values.

Usage: python tools/compare_oracle.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def canon(rows, cols):
    def cell(v):
        if v is None:
            return "\0"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(bool(v)).lower()
        return str(v)

    return sorted("|".join(cell(r[c]) for c in cols) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from multi_task_offensive_language_detection_spark.session import build_session

    spark = build_session(app_name="oracle-compare", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"create view {t} as select * from parquet_scan('{sf}/{t}.parquet')"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, sf)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols_raw = rel.columns
            orows = [dict(zip(ocols_raw, t)) for t in rel.fetchall()]
            ocols = sorted(ocols_raw)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: cols spark={scols} duck={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(orows)}")
            n_fail += 1
            continue
        a, b = canon(srows, scols), canon(orows, scols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch e.g. {diff}")
            n_fail += 1
            continue
        print(f"PASS  {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
