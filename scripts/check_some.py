"""Check a SUBSET of parity queries against their DuckDB oracles.

Usage: python scripts/check_some.py [--sf /root/testdata/sf0.01] name1 name2 ...
Same comparison rules as check_oracles.py (which remains the full sweep).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from arango_etl_spark.session import get_spark  # noqa: E402
from scripts.check_oracles import TABLES, _norm  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = get_spark("check_some", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entry_mod.oracle_sql()
    qmap = entry_mod.queries()
    bad = []
    for name in args:
        df = qmap[name](spark, sf_dir)
        sdata, scols = [tuple(r) for r in df.collect()], df.columns
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        ddata = res.fetchall()
        si = sorted(range(len(scols)), key=lambda i: scols[i])
        di = sorted(range(len(dcols)), key=lambda i: dcols[i])
        srows = sorted(tuple(_norm(r[i]) for i in si) for r in sdata)
        drows = sorted(tuple(_norm(r[i]) for i in di) for r in ddata)
        if sorted(scols) != sorted(dcols) or srows != drows:
            bad.append((name, len(sdata), len(ddata)))
        else:
            print(f"ok {name} ({len(sdata)} rows)", flush=True)
    if bad:
        print("FAILURES:", bad)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
