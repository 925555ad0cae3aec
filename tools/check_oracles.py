"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive multiset of stringified rows. Run:

    python tools/check_oracles.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a per-query dict in the driver's
CORRECTNESS_r{N}.json shape (rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err) so full-registry runs can be committed as
CORRECTNESS_local_r{N}.json.
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
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
    report: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = report[name] = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            rec["err"] = f"spark error: {e}"
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            rec["rows_match"] = True  # weaker rows-only check, as the driver records
            continue
        try:
            rel = con.sql(ORACLES[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
            rec["oracle_rows"] = len(d_rows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            rec["err"] = f"duckdb error: {e}"
            n_fail += 1
            continue
        rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
        rec["rows_match"] = len(s_rows) == len(d_rows)
        ok = True
        if not rec["schema_match"]:
            print(f"FAIL {name}: columns {sorted(s_cols)} vs {sorted(d_cols)}")
            ok = False
        elif not rec["rows_match"]:
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
            ok = False
        else:
            ms, md = row_multiset(s_cols, s_rows), row_multiset(d_cols, d_rows)
            rec["hash_match"] = ms == md
            if ms != md:
                diff_s = list((ms - md).items())[:3]
                diff_d = list((md - ms).items())[:3]
                print(f"FAIL {name}: values differ; spark-only {diff_s}; duck-only {diff_d}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out}")
    print(f"\n{n_fail} failures / {len(only) if only else len(QUERIES)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
