"""Dump .explain("formatted") for named parity queries to files.

Usage:
  python scripts/dump_plans.py --repo /root/repo --out plans/r06 --suffix _after q1 q2 ...

--repo lets the round-start tree (a git worktree) be dumped with the
same tool for the _before files; --out/--suffix control naming
(<out>/<query><suffix>.txt).
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--out", default="plans/r06")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from arango_etl_spark import parity  # noqa: E402
    from arango_etl_spark.session import get_spark  # noqa: E402

    spark = get_spark("dump_plans", cores=32, shuffle_partitions=32)
    qmap = parity.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = qmap[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
