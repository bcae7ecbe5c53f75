"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship CDC final-state query on sf0.001.
queries()     — one (spark, sf_dir) -> DataFrame per operator family from
                SURVEY.md §2 plus the training-data ops
                (implemented in arango_etl_spark/parity.py).
oracle_sql()  — matching DuckDB SQL for EVERY query (zero rows-only
                entries since round 2 moved all hashing to the portable
                md5-affine family). Emission order is curated
                (parity._GATE_ORDER): the driver gates the first 50
                entries, so one representative per operator family
                registers first; twins past 50 are still swept by
                tests/test_entry.py and scripts/check_oracles.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from arango_etl_spark import parity  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC replay final state over the sf0.001 documents universe
    (synthesized 5-version change log → (doc_id, seq_no) window dedup →
    LWW + delete filter)."""
    return parity.cdc_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return parity.queries()


def oracle_sql() -> dict[str, str]:
    return parity.oracle_sql()
