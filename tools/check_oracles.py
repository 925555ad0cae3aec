"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive multiset of stringified rows. Run:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from routing_algorithm_for_graph_dbs_spark.driver_surface import ORACLES, QUERIES
from routing_algorithm_for_graph_dbs_spark.session import get_spark
from routing_algorithm_for_graph_dbs_spark.sources.testdata import TABLES


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        import math

        if not math.isfinite(v):  # int(nan/inf) raises, outside the
            return repr(v)  # per-query try blocks -> would kill the run
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def row_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in idx) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    unknown = only - set(QUERIES)
    if unknown:  # a typo'd filter must not produce a false-green run
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark(app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(ORACLES[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns {sorted(s_cols)} vs {sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
            ok = False
        else:
            ms, md = row_multiset(s_cols, s_rows), row_multiset(d_cols, d_rows)
            if ms != md:
                diff_s = list((ms - md).items())[:3]
                diff_d = list((md - ms).items())[:3]
                print(f"FAIL {name}: values differ; spark-only {diff_s}; duck-only {diff_d}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
    print(f"\n{n_fail} failures / {len(only) if only else len(QUERIES)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
