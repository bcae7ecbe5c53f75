"""Real-Iceberg adapter: the same engine contract on iceberg-spark-runtime.

This image ships no Iceberg jar (SURVEY.md §7.0), so `SnapshotTable`
implements the contract on parquet+manifests and THIS module is the
cluster-side drop-in. It activates only when the session has an Iceberg
catalog configured (`spark.sql.catalog.<name>` + the runtime jar on the
classpath); `is_available()` gates every entry point and the test suite
skips cleanly without the jar.

Mapping (engine concept → Iceberg):
- bucket layout            → `PARTITIONED BY (bucket(N, doc_id))`
- CoW MERGE                → `MERGE INTO t USING s ON t.doc_id = s.doc_id
                              WHEN MATCHED AND s is newer …` (below)
- cross-batch LWW + tombstones → same stored META columns; Iceberg rows
  carry _seq_no/_event_ts/_batch_id/_op/_deleted exactly like
  SnapshotTable, so the MERGE condition is identical
- fence                    → table property `fence.<stream_id>`; written
  AFTER the data commit. NOTE: two snapshots, not one — the write is
  ordered data-then-fence, and the MERGE itself is idempotent under
  re-application (LWW absorbs replayed winners), so a crash between the
  two commits re-applies a no-op batch rather than losing one
  (SURVEY.md §7.3 fence-atomicity note; the pure-SQL surface has no
  public one-commit summary-property hook)
- compaction               → `CALL <catalog>.system.rewrite_data_files`
- expire                   → `CALL <catalog>.system.expire_snapshots`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from arango_etl_spark.operators.merge_into import CDC_META  # noqa: F401
from arango_etl_spark.plans.lakehouse import META_NAMES


def is_available(spark: SparkSession, catalog: str = "iceberg") -> bool:
    try:
        jvm_class = "org.apache.iceberg.spark.SparkCatalog"
        spark._jvm.java.lang.Class.forName(jvm_class)
    except Exception:
        return False
    return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None


LWW_NEWER = (
    "(s.seq_no, s.event_ts, s.batch_id, s.op) > "
    "(t._seq_no, t._event_ts, t._batch_id, t._op)"
)


def create_table(
    spark: SparkSession, ident: str, n_buckets: int = 64
) -> None:
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {ident} (
            doc_id string, tokens array<int>, n_tok int, source string,
            _seq_no bigint, _event_ts timestamp, _batch_id bigint,
            _op string, _deleted boolean
        )
        USING iceberg
        PARTITIONED BY (bucket({n_buckets}, doc_id))
        TBLPROPERTIES (
            'write.merge.mode' = 'merge-on-read',
            'write.distribution-mode' = 'hash',
            'format-version' = '2'
        )
        """
    )


def last_batch_id(spark: SparkSession, ident: str, stream_id: str) -> int | None:
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {ident}").collect()
    }
    v = props.get(f"fence.{stream_id}")
    return None if v is None else int(v)


def merge_batch(
    spark: SparkSession,
    ident: str,
    deduped_events: DataFrame,
    batch_id: int | None = None,
    fence_stream_id: str | None = None,
) -> bool:
    """Apply one deduped batch via MERGE INTO; returns False if fenced.

    `deduped_events` must already be one winning event per doc_id (use
    operators.dedup_window.dedup_events) with the CDC columns
    (op, seq_no, batch_id, event_ts) present.
    """
    if fence_stream_id is not None and batch_id is not None:
        last = last_batch_id(spark, ident, fence_stream_id)
        if last is not None and batch_id <= last:
            return False
    deduped_events.createOrReplaceTempView("_merge_src")
    payload_cols = [
        c for c in deduped_events.columns
        if c not in ("op", "seq_no", "batch_id", "event_ts")
    ]
    set_cols = ", ".join(
        [f"t.{c} = s.{c}" for c in payload_cols if c != "doc_id"]
        + [
            "t._seq_no = s.seq_no", "t._event_ts = s.event_ts",
            "t._batch_id = s.batch_id", "t._op = s.op",
            "t._deleted = (s.op = 'delete')",
        ]
    )
    insert_cols = ", ".join(
        payload_cols + ["_seq_no", "_event_ts", "_batch_id", "_op", "_deleted"]
    )
    insert_vals = ", ".join(
        [f"s.{c}" for c in payload_cols]
        + ["s.seq_no", "s.event_ts", "s.batch_id", "s.op", "(s.op = 'delete')"]
    )
    spark.sql(
        f"""
        MERGE INTO {ident} t
        USING _merge_src s
        ON t.doc_id = s.doc_id
        WHEN MATCHED AND {LWW_NEWER} THEN UPDATE SET {set_cols}
        WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})
        """
    )
    if fence_stream_id is not None and batch_id is not None:
        # second commit (see module docstring: ordered data-then-fence,
        # idempotent MERGE is the crash backstop)
        spark.sql(
            f"ALTER TABLE {ident} SET TBLPROPERTIES "
            f"('fence.{fence_stream_id}' = '{int(batch_id)}')"
        )
    return True


def read_public(spark: SparkSession, ident: str) -> DataFrame:
    df = spark.table(ident)
    return df.where(~df["_deleted"]).drop(*META_NAMES)


def compact(spark: SparkSession, ident: str, catalog: str = "iceberg") -> None:
    spark.sql(
        f"CALL {catalog}.system.rewrite_data_files(table => '{ident}')"
    )


def expire_snapshots(
    spark: SparkSession, ident: str, catalog: str = "iceberg", retain_last: int = 2
) -> None:
    spark.sql(
        f"CALL {catalog}.system.expire_snapshots("
        f"table => '{ident}', retain_last => {retain_last})"
    )
