"""Streaming twin of the training-data curation filters: quality gate +
exact near-real-time dedup over a document FEED (readStream) instead of
a static corpus.

The batch pipeline (operators/pipeline.py) curates a full corpus; this
module is the ingest-time complement — documents arrive continuously and
each micro-batch emits only the rows that (a) pass the columnar quality
gate and (b) are the first arrival of their content fingerprint within
the watermark horizon. Clustering/decontamination stay batch jobs (they
need corpus-wide state); quality + exact dedup are the filters worth
paying for before data ever lands.

Spark-first shape:
- the quality gate is pure columnar SQL — stateless, fuses into the scan;
- dedup uses ``dropDuplicatesWithinWatermark`` on the md5 content
  fingerprint: state holds one (hash → expiry) entry per distinct doc
  seen inside the watermark, NOT the documents themselves, and Spark
  evicts entries past the horizon — bounded state on an unbounded
  stream (an unwatermarked dropDuplicates would grow state forever);
- on a batch DataFrame the same function keeps the DETERMINISTIC
  first arrival per content hash — min_by over (ingest_ts, id), the
  same winner the streaming path's arrival order produces when event
  time tracks arrival order (ADVICE r3: a bare dropDuplicates keeps an
  arbitrary row, so survivor ids varied across runs) — making it
  unit-testable without a stream and usable for backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_stream(
    docs: DataFrame,
    min_len: int = 100,
    min_alpha_ratio: float = 0.81,
    watermark: str = "10 minutes",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-gate + content-dedup a document stream (or batch frame).

    Emits the input columns plus ``content_hash``. Dedup keys on the md5
    of the text, not the doc id, so re-crawled / re-submitted identical
    content is dropped even under new ids — the ingest-time half of
    exact dedup (the batch half catches duplicates farther apart than
    the watermark horizon). Batch survivors are the deterministic first
    arrival by (``ts_col``, ``id_col``) — one partial-aggregating
    min_by shuffle, re-runs always keep the same rows. Frames without
    ``id_col`` fall back to ordering by ``ts_col`` alone (still far
    more deterministic than dropDuplicates; exact ``ts_col`` ties then
    keep an arbitrary-but-single row) — batch callers are not required
    to carry a doc id (ADVICE r4 #5). Output appends ``content_hash``
    as the LAST column.
    """
    lt = F.length(F.col(text_col))
    alpha = (
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
        .cast("double") / lt
    )
    gated = docs.where((lt >= min_len) & (alpha >= min_alpha_ratio))
    hashed = gated.withColumn("content_hash", F.md5(F.col(text_col)))
    if hashed.isStreaming:
        return hashed.withWatermark(ts_col, watermark)\
            .dropDuplicatesWithinWatermark(["content_hash"])
    cols = [c for c in hashed.columns if c != "content_hash"]
    order_cols = [F.col(ts_col)]
    if id_col in cols:
        order_cols.append(F.col(id_col))
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.min_by(
                F.struct(*[F.col(c) for c in cols]),
                F.struct(*order_cols),
            ).alias("_w")
        )
        .select(*[F.col(f"_w.{c}").alias(c) for c in cols], "content_hash")
    )
