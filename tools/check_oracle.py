"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB at sf0.01, compare row counts + column names + order-insensitive
values. Run before committing new queries.

Usage: python tools/check_oracle.py [sf_dir] [only_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from great_expectations_spark.skew import build_session


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=8,
                          extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_cols = sorted(sdf.columns)
        spark_rows = sorted(
            tuple(_norm(r[c]) for c in spark_cols) for r in sdf.collect()
        )
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_rows)} rows, cols={spark_cols}")
            continue
        res = con.execute(oracles[name])
        duck_cols_raw = [d[0] for d in res.description]
        duck_all = res.fetchall()
        order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
        duck_cols = sorted(duck_cols_raw)
        duck_rows = sorted(tuple(_norm(row[i]) for i in order) for row in duck_all)

        ok = True
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns differ spark={spark_cols} duck={duck_cols}")
            ok = False
        elif len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: row counts {len(spark_rows)} vs {len(duck_rows)}")
            ok = False
        elif spark_rows != duck_rows:
            print(f"FAIL {name}: values differ")
            for a, b in list(zip(spark_rows, duck_rows))[:5]:
                if a != b:
                    print(f"   spark={a}\n   duck ={b}")
            ok = False
        if ok:
            print(f"  OK {name} ({len(spark_rows)} rows)")
        else:
            failures += 1

    spark.stop()
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
