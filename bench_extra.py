"""Extra benchmarks (guide §1.4 noop-sink isolation) — NOT the graded bench.

Times individual parity query legs in isolation, repeats each N times in one
session, and optionally dumps .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py minhash_lsh_candidates graph_pagerank
  BENCH_EXTRA_REPEATS=5 python bench_extra.py minhash_lsh_candidates
  BENCH_EXTRA_EXPLAIN=plans/r06 python bench_extra.py q5_local_supplier_volume

The graded bench (bench.py) is frozen; numbers printed here are for the
optimization log (OPTIMIZATION_r06.md) only.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from arango_etl_spark import parity  # noqa: E402
from arango_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
    explain_dir = os.environ.get("BENCH_EXTRA_EXPLAIN")
    names = sys.argv[1:]
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    qmap = parity.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        if name not in qmap:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        samples = []
        for r in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            t0 = time.monotonic()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = samples
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qmap[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
    print(json.dumps({"samples": out, "load1": os.getloadavg()[0]}))
    spark.stop()


if __name__ == "__main__":
    main()
