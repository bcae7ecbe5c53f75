"""A/B evidence for the round-4 similarity re-rank fix (VERDICT r3 #1).

Times the per-query top-k re-rank over a large synthetic embedding set
(hash-derived, no RNG) in three shapes:
  old        — row_number() over partitionBy(literal query_id): Catalyst
               folds the partition spec away → single-partition window
  two_phase  — partition-local rank + bounded merge agg (the new
               general path)
  take_ordered — orderBy+limit (the new single-query path)

Run:  python scripts/bench_topk_ab.py [n_vectors] [dim] [cpus]
Prints one JSON line with seconds per shape (same candidate set, same
result rows — asserted).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from arango_etl_spark.operators.similarity import _dot, _norm, _topk_per_query
from arango_etl_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("topk_ab", cores=cpus, shuffle_partitions=cpus)

    # deterministic synthetic embeddings: component j of vector i is a
    # bounded integer hash — pure JVM exprs, generated on the fly
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("double")
                / 1000.0
            ),
        ).alias("embedding"),
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"),
        F.col("embedding").alias("_qvec"),
        _norm(F.col("embedding")).alias("_qnorm"),
    )
    sims = emb.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("embedding"), F.col("_qvec"))
            / (_norm(F.col("embedding")) * F.col("_qnorm"))
        ).alias("_sim_raw"),
    )

    def old_shape():
        w = Window.partitionBy("query_id").orderBy(
            F.col("_sim_raw").desc(), F.col("vec_id").asc()
        )
        return (
            sims.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= 10)
            .select(
                "query_id", "vec_id", F.round("_sim_raw", 4).alias("cos_sim")
            )
        )

    shapes = {
        "old_global_window": old_shape,
        "two_phase": lambda: _topk_per_query(sims, 10, "query_id", "vec_id"),
        "take_ordered": lambda: _topk_per_query(
            sims, 10, "query_id", "vec_id", single_query=True
        ),
    }
    times, results = {}, {}
    for name, fn in shapes.items():
        t0 = time.monotonic()
        rows = fn().collect()
        times[name] = round(time.monotonic() - t0, 3)
        results[name] = sorted((r["vec_id"], r["cos_sim"]) for r in rows)
    assert results["two_phase"] == results["old_global_window"]
    assert results["take_ordered"] == results["old_global_window"]
    print(json.dumps({"n_vectors": n, "dim": dim, "cpus": cpus,
                      "secs": times}))
    spark.stop()


if __name__ == "__main__":
    main()
