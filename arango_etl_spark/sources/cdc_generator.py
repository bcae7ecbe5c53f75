"""Deterministic synthetic CDC change-event generator (FIXTURES.md §2).

Plays the role of the reference's timestamped S3 file log + in-file
protobuf record stream (/root/reference/src/handler/arangodb_handler.rs:74-75,
:281-294): a log of insert/update/delete events on doc_id-keyed rows of
pre-tokenized sequences.

Fully Spark-native (``spark.range`` + hash arithmetic — no driver-side
loops, no RNG objects, no wall clock), so it generates 10^8+ events
distributed, and the same seed always produces byte-identical output.

Event schema (FIXTURES.md §2):
    op:string  doc_id:string  seq_no:long  tokens:array<int>  n_tok:int
    source:string  batch_id:long  event_ts:timestamp
    [+ quality_score:double for events with seq_no >= evolution_onset]

Semantics knobs:
- ``n_batches``: events are scattered across batches by hash → a given
  doc's events arrive out-of-order across micro-batches (reference
  processes files fully async out-of-order, /root/reference/README.md:7).
- ``dup_permille``: that fraction of events is re-emitted verbatim into a
  *different* batch (same seq_no + payload) — duplicate-delivery test.
- ``delete_permille``: fraction of events that are deletes.
- ``hot_doc_permille``: fraction of events hitting doc 0 (hot-key skew,
  north rule).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arango_etl_spark.functions.tokenizer import n_tok_expr, tokens_expr

EPOCH = "2024-01-01 00:00:00"

# canonical last-writer-wins order (SURVEY.md §2.6): winner per doc_id is
# the max event under this total preference. Residual ties (all four equal)
# carry identical payloads by construction (duplicate delivery).
LWW_ORDER_COLS = ("seq_no", "event_ts", "batch_id", "op")


@dataclass(frozen=True)
class GeneratorConfig:
    n_events: int = 100_000
    n_docs: int = 5_000
    n_batches: int = 8
    seed: int = 42
    delete_permille: int = 50          # 5% deletes
    dup_permille: int = 30             # 3% duplicate deliveries
    hot_doc_permille: int = 0          # skew: share of events on doc 0
    n_sources: int = 8                 # Zipf-ish skewed source labels
    evolution_onset: int | None = None  # seq_no >= onset → quality_score col


def _source_expr(h: F.Column, n_sources: int) -> F.Column:
    """Zipf-ish skew over source labels: source k gets ~2^-(k+1) of events."""
    r = F.pmod(h, F.lit(1 << n_sources))
    # number of trailing slots: source_id = floor(log2(2^n / (r+1))) capped
    sid = (
        F.lit(n_sources)
        - F.floor(F.log2(r.cast("double") + F.lit(1.0)))
        - F.lit(1)
    )
    sid = F.least(F.greatest(sid, F.lit(0)), F.lit(n_sources - 1))
    return F.concat(F.lit("src_"), sid.cast("string"))


def generate_events(spark: SparkSession, cfg: GeneratorConfig) -> DataFrame:
    """Build the deterministic change-event DataFrame (not yet written)."""
    df = spark.range(0, cfg.n_events).withColumnRenamed("id", "event_idx")

    h1 = F.xxhash64(F.col("event_idx"), F.lit(cfg.seed))
    h2 = F.xxhash64(F.col("event_idx"), F.lit(cfg.seed + 1))
    h3 = F.xxhash64(F.col("event_idx"), F.lit(cfg.seed + 2))

    doc_num = F.when(
        F.pmod(h3, F.lit(1000)) < F.lit(cfg.hot_doc_permille), F.lit(0)
    ).otherwise(F.pmod(h1, F.lit(cfg.n_docs)))

    seq_no = F.col("event_idx") + F.lit(1)
    op = F.when(
        F.pmod(h2, F.lit(1000)) < F.lit(cfg.delete_permille), F.lit("delete")
    ).when(F.pmod(h2, F.lit(7)) < F.lit(3), F.lit("insert")).otherwise(
        F.lit("update")
    )

    base = df.select(
        op.alias("op"),
        F.concat(F.lit("doc_"), doc_num.cast("string")).alias("doc_id"),
        seq_no.alias("seq_no"),
        doc_num.alias("_doc_num"),
        F.pmod(
            F.xxhash64(F.col("event_idx"), F.lit(cfg.seed + 3)),
            F.lit(cfg.n_batches),
        ).alias("batch_id"),
        h3.alias("_h3"),
    )

    base = base.withColumn(
        "tokens",
        F.when(
            F.col("op") == "delete", F.lit(None).cast("array<int>")
        ).otherwise(tokens_expr(F.col("_doc_num"), F.col("seq_no"))),
    ).withColumn(
        "n_tok",
        F.when(F.col("op") == "delete", F.lit(None).cast("int")).otherwise(
            n_tok_expr(F.col("_doc_num"), F.col("seq_no"))
        ),
    ).withColumn(
        "source", _source_expr(F.col("_h3"), cfg.n_sources)
    ).withColumn(
        "event_ts",
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(EPOCH).cast("timestamp")) + F.col("seq_no")
        ),
    )

    # duplicate deliveries: re-emit a deterministic subset into another batch
    dups = (
        base.where(F.pmod(F.col("_h3"), F.lit(1000)) < F.lit(cfg.dup_permille))
        .withColumn(
            "batch_id",
            F.pmod(F.col("batch_id") + F.lit(1), F.lit(cfg.n_batches)),
        )
    )
    events = base.unionByName(dups)

    if cfg.evolution_onset is not None:
        events = events.withColumn(
            "quality_score",
            F.when(
                F.col("seq_no") >= F.lit(cfg.evolution_onset),
                (F.pmod(F.col("_h3"), F.lit(1000)) / F.lit(1000.0)),
            ),
        )

    return events.drop("_doc_num", "_h3")


def write_event_batches(
    spark: SparkSession, cfg: GeneratorConfig, out_dir: str,
    files_per_batch: int = 1,
) -> list[str]:
    """Materialize one parquet subdir per batch (the micro-batch file feed).

    Batch dirs are written in batch_id order so a Structured Streaming file
    source with ``maxFilesPerTrigger`` tails them roughly in order — while
    each batch internally contains out-of-order seq_nos (the reference's
    async out-of-order file processing, /root/reference/README.md:7).

    ``files_per_batch`` pins the file count per batch dir (default 1 —
    one file per poc epoch, the reference's feed shape) so
    ``maxFilesPerTrigger`` maps DETERMINISTICALLY to batches-per-epoch:
    the previous partition-derived count made downstream epoch counts
    (and every epoch-cadence assertion) depend on the writing session's
    parallelism.
    """
    events = generate_events(spark, cfg)
    paths = []
    for b in range(cfg.n_batches):
        p = f"{out_dir}/batch={b:05d}"
        batch_df = events.where(F.col("batch_id") == b)
        if cfg.evolution_onset is not None:
            # additive schema evolution: batches made only of pre-onset
            # events are written WITHOUT the new column (old producers)
            has_evolved = (
                batch_df.where(F.col("quality_score").isNotNull()).limit(1).count()
                > 0
            )
            if not has_evolved:
                batch_df = batch_df.drop("quality_score")
        batch_df.coalesce(max(1, files_per_batch)).write.mode(
            "overwrite"
        ).parquet(p)
        paths.append(p)
    return paths
