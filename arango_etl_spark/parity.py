"""Operator-parity queries: (PySpark builder, DuckDB oracle SQL) pairs.

One entry per implemented operator family from SURVEY.md §2, each runnable
over the driver's testdata tables (region nation customer supplier part
orders lineitem events documents embeddings). The driver executes the
Spark query and the oracle SQL side-by-side and compares row-count +
schema + order-insensitive value hash — so every computed column is
aliased identically on both sides, sums are cast to fixed widths, and
floating-point outputs are rounded.

Reference citations (file:line into /root/reference) are given per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arango_etl_spark.functions.tokenizer import n_tok_sql, tokens_sql

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# 1. cdc_final_state — the flagship: synthesize a 5-version change log over
# the documents universe, dedup per key with the (doc_id, seq_no) window,
# apply LWW + deletes (SURVEY.md §2.6 J3/A6; reference UPSERT races at
# /root/reference/src/handler/arangodb.rs:220-241 made deterministic).
# --------------------------------------------------------------------------
_CDC_SQL = f"""
WITH ev AS (
    SELECT
        'doc_' || CAST(d.doc_id AS VARCHAR)       AS doc_id,
        d.doc_id * 5 + t.k                        AS seq_no,
        CASE WHEN (d.doc_id * 3 + t.k) % 11 = 0
             THEN 'delete' ELSE 'update' END      AS op,
        {tokens_sql("d.doc_id", "d.doc_id*5 + t.k")} AS tokens,
        {n_tok_sql("d.doc_id", "d.doc_id*5 + t.k")}  AS n_tok,
        d.source                                  AS source
    FROM documents d CROSS JOIN generate_series(1, 5) t(k)
), ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY seq_no DESC
    ) AS rn FROM ev
)
SELECT doc_id, array_to_string(tokens, ',') AS tokens_csv, n_tok, source
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


@_register("cdc_final_state", _CDC_SQL)
def cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.functions.tokenizer import n_tok_expr, tokens_expr

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    ev = d.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(5))))
    seq = F.col("doc_id") * 5 + F.col("k")
    ev = ev.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_key"),
        seq.alias("seq_no"),
        F.when(
            F.pmod(F.col("doc_id") * 3 + F.col("k"), F.lit(11)) == 0, "delete"
        ).otherwise(F.lit("update")).alias("op"),
        tokens_expr(F.col("doc_id"), seq).alias("tokens"),
        n_tok_expr(F.col("doc_id"), seq).alias("n_tok"),
        F.col("source"),
    )
    w = Window.partitionBy("doc_key").orderBy(F.col("seq_no").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "delete"))
        .select(
            F.col("doc_key").alias("doc_id"),
            # driver's hash compare canonicalizes in pandas, which cannot
            # factorize list cells → emit the array in CSV form (identical
            # array_to_string on the DuckDB side); n_tok keeps the length
            F.array_join("tokens", ",").alias("tokens_csv"),
            "n_tok",
            "source",
        )
    )


# --------------------------------------------------------------------------
# 2. lww_latest_per_key — per-key latest event (SURVEY.md A6; replaces the
# reference's arrival-order LWW, /root/reference/src/handler/arangodb.rs:223-225)
# --------------------------------------------------------------------------
_LWW_SQL = """
WITH ranked AS (
    SELECT user_id, event_id, event_type, round(value, 6) AS last_value,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
)
SELECT user_id, event_id, event_type, last_value FROM ranked WHERE rn = 1
"""


@_register("lww_latest_per_key", _LWW_SQL)
def lww_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id", "event_id", "event_type",
            F.round("value", 6).alias("last_value"),
        )
    )


# --------------------------------------------------------------------------
# 3. anti_join_unprocessed — done-file exclusion anti-join (SURVEY.md F1/J1;
# /root/reference/src/handler/arangodb_handler.rs:159-176)
# --------------------------------------------------------------------------
_ANTI_SQL = """
SELECT c.c_custkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@_register("anti_join_unprocessed", _ANTI_SQL)
def anti_join_unprocessed(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey")


# --------------------------------------------------------------------------
# 4. semi_join_exists — existence predicate (SURVEY.md F4/F5;
# /root/reference/src/handler/arangodb.rs:147-169)
# --------------------------------------------------------------------------
_SEMI_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@_register("semi_join_exists", _SEMI_SQL)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# 5. resume_cursor — min/max timestamp cursors (SURVEY.md A1/A2;
# /root/reference/src/handler/arangodb_handler.rs:144-156)
# --------------------------------------------------------------------------
_CURSOR_SQL = """
SELECT max(ts) AS max_ts, min(ts) AS min_ts,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
"""


@_register("resume_cursor", _CURSOR_SQL)
def resume_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").agg(
        F.max("ts").alias("max_ts"),
        F.min("ts").alias("min_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# 6. retry_cap_filter — cap filter over a counter (SURVEY.md F6;
# /root/reference/src/handler/arangodb_handler.rs:116-142)
# --------------------------------------------------------------------------
_RETRY_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id HAVING count(*) <= 20
"""


@_register("retry_cap_filter", _RETRY_SQL)
def retry_cap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") <= 20)
    )


# --------------------------------------------------------------------------
# 7. set_accumulation — distinct-set accumulate (SURVEY.md A5;
# UNION_DISTINCT at /root/reference/src/handler/arangodb.rs:222)
# --------------------------------------------------------------------------
_SET_SQL = """
SELECT user_id,
       array_to_string(list_sort(list_distinct(array_agg(event_type))), ',')
           AS event_types_csv,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id
"""


@_register("set_accumulation", _SET_SQL)
def set_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # array output serialized to CSV — the driver's pandas canonicalizer
    # can't hash list cells (see cdc_final_state)
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",")
            .alias("event_types_csv"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


# --------------------------------------------------------------------------
# 8. histogram_counts — per-bucket histogram (SURVEY.md A4, exploded form;
# map-additive variant unit-tested in operators/maps.py;
# /root/reference/src/handler/arangodb.rs:309-318)
# --------------------------------------------------------------------------
_HIST_SQL = """
SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY event_type, CAST(floor(value) AS BIGINT)
"""


@_register("histogram_counts", _HIST_SQL)
def histogram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", F.floor("value").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------------------------------------
# 9. lww_greatest_fields — arg-max fields + greatest timestamps
# (SURVEY.md A6; MAX([OLD,new]) at /root/reference/src/handler/arangodb.rs:223,237)
# --------------------------------------------------------------------------
_GREATEST_SQL = """
SELECT user_id, round(arg_max(value, event_id), 6) AS last_value,
       max(ts) AS last_seen
FROM events GROUP BY user_id
"""


@_register("lww_greatest_fields", _GREATEST_SQL)
def lww_greatest_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(F.max_by("value", "event_id"), 6).alias("last_value"),
            F.max("ts").alias("last_seen"),
        )
    )


# --------------------------------------------------------------------------
# 10. explode_words — nested-array flatten keeping parent columns
# (SURVEY.md T4/J2; witness explode at
# /root/reference/src/document/witness.rs:108-127)
# --------------------------------------------------------------------------
_EXPLODE_SQL = """
SELECT doc_id, source, unnest(list_filter(string_split(text, ' '),
                                          w -> w <> '')) AS word
FROM documents
"""


@_register("explode_words", _EXPLODE_SQL)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("word"),
    )


# --------------------------------------------------------------------------
# 11. edge_keys — key-building string transforms (SURVEY.md T9/T10;
# /root/reference/src/document/edge.rs:36-43,
# /root/reference/src/handler/arangodb.rs:305-306)
# --------------------------------------------------------------------------
_EDGE_SQL = """
SELECT event_id,
       'beacon_' || CAST(user_id AS VARCHAR) || '_witness_' || event_type
           AS edge_key,
       'hotspots/' || CAST(user_id AS VARCHAR) AS from_key,
       'hotspots/' || event_type AS to_key
FROM events
"""


@_register("edge_keys", _EDGE_SQL)
def edge_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    return ev.select(
        "event_id",
        F.concat(F.lit("beacon_"), uid, F.lit("_witness_"), F.col("event_type"))
        .alias("edge_key"),
        F.concat_ws("/", F.lit("hotspots"), uid).alias("from_key"),
        F.concat_ws("/", F.lit("hotspots"), F.col("event_type")).alias("to_key"),
    )


# --------------------------------------------------------------------------
# 12. haversine_distance — pure-SQL great-circle distance (SURVEY.md T7;
# /root/reference/src/document/beacon.rs:47-60 via h3o LatLng::distance_km)
# lat/lng synthesized deterministically from user_id.
# --------------------------------------------------------------------------
_HAVERSINE_SQL = """
WITH pts AS (
    SELECT DISTINCT user_id,
           CAST(user_id % 170 AS DOUBLE) - 85.0 + 0.25  AS lat,
           CAST((user_id * 7) % 350 AS DOUBLE) - 175.0 + 0.25 AS lng
    FROM events
)
SELECT user_id,
       round(2.0 * 6371.0088 * asin(sqrt(
           sin(radians(lat) / 2) * sin(radians(lat) / 2)
           + cos(radians(lat)) * cos(radians(0.0))
             * sin(radians(lng) / 2) * sin(radians(lng) / 2)
       )), 6) AS distance_km
FROM pts
"""


@_register("haversine_distance", _HAVERSINE_SQL)
def haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id").distinct()
    lat = (F.pmod(F.col("user_id"), F.lit(170))).cast("double") - 85.0 + 0.25
    lng = (F.pmod(F.col("user_id") * 7, F.lit(350))).cast("double") - 175.0 + 0.25
    rl, rg = F.radians(lat), F.radians(lng)
    dist = 2.0 * 6371.0088 * F.asin(
        F.sqrt(
            F.sin(rl / 2) * F.sin(rl / 2)
            + F.cos(rl) * F.cos(F.radians(F.lit(0.0)))
            * F.sin(rg / 2) * F.sin(rg / 2)
        )
    )
    return ev.select("user_id", F.round(dist, 6).alias("distance_km"))


# --------------------------------------------------------------------------
# 13. unix_millis — timestamp → epoch millis (SURVEY.md T12;
# /root/reference/src/document/beacon.rs:71)
# --------------------------------------------------------------------------
_MILLIS_SQL = """
SELECT event_id, epoch_ms(ts) AS ts_ms FROM events
"""


@_register("unix_millis", _MILLIS_SQL)
def unix_millis(spark: SparkSession, sf_dir: str) -> DataFrame:
    # testdata ts is TIMESTAMP_NTZ; session is pinned UTC so the cast is
    # instant-preserving and matches DuckDB's UTC-naive epoch_ms
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )


# --------------------------------------------------------------------------
# 14. ingest_latency — checked time delta per key (SURVEY.md T11;
# /root/reference/src/document/edge.rs:20-23)
# --------------------------------------------------------------------------
_LATENCY_SQL = """
SELECT event_id,
       CAST(coalesce(epoch_ms(ts) - epoch_ms(
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       ), 0) AS BIGINT) AS latency_ms
FROM events
"""


@_register("ingest_latency", _LATENCY_SQL)
def ingest_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = lambda c: F.unix_millis(c.cast("timestamp"))  # noqa: E731  (NTZ → UTC)
    return ev.select(
        "event_id",
        F.coalesce(
            ms(F.col("ts")) - ms(F.lag("ts").over(w)), F.lit(0)
        ).alias("latency_ms"),
    )


# --------------------------------------------------------------------------
# 15. exact_dedup_docs — exact dedup via content hash (training-data op;
# groupBy content digest, keep first-by-id)
# --------------------------------------------------------------------------
_DEDUP_SQL = """
SELECT md5(text) AS text_md5,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
"""


@_register("exact_dedup_docs", _DEDUP_SQL)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# 16. token_stats — whitespace token counting (training-data op)
# --------------------------------------------------------------------------
_TOKSTATS_SQL = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
            AS BIGINT) AS n_ws_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
"""


@_register("token_stats", _TOKSTATS_SQL)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .cast("long").alias("n_ws_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


# --------------------------------------------------------------------------
# 17. quality_score — text quality heuristics (training-data op)
# --------------------------------------------------------------------------
_QUALITY_SQL = """
SELECT doc_id,
       round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
             / length(text), 6) AS alpha_ratio,
       length(text) >= 100 AS len_ok
FROM documents WHERE length(text) > 0
"""


@_register("quality_score", _QUALITY_SQL)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    return d.select(
        "doc_id",
        F.round(
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
            / F.length("text"),
            6,
        ).alias("alpha_ratio"),
        (F.length("text") >= 100).alias("len_ok"),
    )


# --------------------------------------------------------------------------
# 18. doc_fingerprint — normalized content fingerprint (training-data op)
# --------------------------------------------------------------------------
_FP_SQL = """
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
           AS fingerprint
FROM documents
"""


@_register("doc_fingerprint", _FP_SQL)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
        ).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# 19. embedding_cosine_topk — brute-force ANN baseline (training-data op):
# top-10 cosine neighbors of vec_id=0, tie-broken by vec_id.
# --------------------------------------------------------------------------
_COSINE_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sims AS (
    SELECT e.vec_id,
           round(
             list_dot_product(e.embedding, q.qe)
             / (sqrt(list_dot_product(e.embedding, e.embedding))
                * sqrt(list_dot_product(q.qe, q.qe))), 4) AS cos_sim
    FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id, cos_sim FROM sims
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


@_register("embedding_cosine_topk", _COSINE_SQL)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                dot(F.col("embedding"), F.col("qe"))
                / (
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot(F.col("qe"), F.col("qe")))
                ),
                4,
            ).alias("cos_sim"),
        )
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)


# --------------------------------------------------------------------------
# 19a. cosine_topk_multi — the ACTUAL cosine_topk operator (multi-query:
# per-query broadcast + window rank) under the oracle gate; the older
# embedding_cosine_topk pair checks the single-query inline formulation.
# Ranks on unrounded doubles, rounds only the displayed value.
# --------------------------------------------------------------------------
_COSINE_MULTI_SQL = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe
    FROM embeddings WHERE vec_id IN (0, 1, 2)
), sims AS (
    SELECT q.query_id, e.vec_id,
           list_dot_product(e.embedding, q.qe)
           / (sqrt(list_dot_product(e.embedding, e.embedding))
              * sqrt(list_dot_product(q.qe, q.qe))) AS sim_raw
    FROM embeddings e CROSS JOIN q
), ranked AS (
    SELECT query_id, vec_id, sim_raw,
           row_number() OVER (
               PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC
           ) AS rn
    FROM sims
)
SELECT query_id, vec_id, round(sim_raw, 4) AS cos_sim
FROM ranked WHERE rn <= 5
"""


@_register("cosine_topk_multi", _COSINE_MULTI_SQL)
def cosine_topk_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(e, q, k=5)


# --------------------------------------------------------------------------
# 19b. ivf_topk — the IVF scale path for ANN (operators/similarity.py
# ivf_cosine_topk): hash-seeded deterministic centroids → map-side argmax
# assignment → probe the 4 nearest cells → exact re-rank inside them.
# The full algorithm (centroid choice, assignment tie-breaks, probe set,
# re-rank) is mirrored in DuckDB — the oracle checks the ANN pipeline
# itself, not its recall vs brute force.
# --------------------------------------------------------------------------
_IVF_SQL = """
WITH h AS (
    SELECT vec_id, embedding,
           CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS hh
    FROM embeddings
), cent AS (
    SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
           embedding AS ce
    FROM h ORDER BY hh, vec_id LIMIT 16
), q AS (
    SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), probe AS (
    -- orderings use UNROUNDED doubles: both engines run the identical
    -- IEEE op sequence, so comparisons agree bit-for-bit; round() here
    -- would reintroduce the HALF_UP vs HALF_EVEN tie hazard
    SELECT cid FROM cent, q
    ORDER BY list_dot_product(ce, qe)
             / (sqrt(list_dot_product(ce, ce))
                * sqrt(list_dot_product(qe, qe))) DESC, cid ASC
    LIMIT 4
), assign AS (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding, c.ce)
                        / (sqrt(list_dot_product(e.embedding, e.embedding))
                           * sqrt(list_dot_product(c.ce, c.ce)))
                        DESC, c.cid ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cent c
), cand AS (
    SELECT e.vec_id,
           list_dot_product(e.embedding, q.qe)
           / (sqrt(list_dot_product(e.embedding, e.embedding))
              * sqrt(list_dot_product(q.qe, q.qe))) AS sim_raw
    FROM embeddings e
    JOIN assign a ON a.vec_id = e.vec_id AND a.rn = 1
    JOIN q ON true
    WHERE a.cid IN (SELECT cid FROM probe)
)
SELECT vec_id, round(sim_raw, 4) AS cos_sim FROM cand
ORDER BY sim_raw DESC, vec_id ASC LIMIT 10
"""


@_register("ivf_topk", _IVF_SQL)
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_query,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    # split API (round-3 VERDICT #2): build once, probe per query. The
    # query side is one row → single_query re-rank (orderBy+limit, no
    # window to constant-fold — round-3 VERDICT #1).
    index = build_ivf_index(e, n_centroids=16)
    return ivf_query(index, q, k=10, n_probe=4, single_query=True).drop(
        "query_id"
    )


# --------------------------------------------------------------------------
# 19c. ivf_topk_multi — the MULTI-query IVF path: one shared index, three
# probes, and the general two-phase re-rank (partition-local rank + bounded
# merge aggregate — the round-3 VERDICT #1 fix) under the oracle gate. The
# DuckDB mirror extends _IVF_SQL's centroid/assignment CTEs with per-query
# probe selection and a per-query row_number re-rank.
# --------------------------------------------------------------------------
_IVF_MULTI_SQL = """
WITH h AS (
    SELECT vec_id, embedding,
           CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS hh
    FROM embeddings
), cent AS (
    SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
           embedding AS ce
    FROM h ORDER BY hh, vec_id LIMIT 16
), q AS (
    SELECT vec_id AS query_id, embedding AS qe
    FROM embeddings WHERE vec_id IN (0, 1, 2)
), probe AS (
    SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_dot_product(c.ce, q.qe)
                            / (sqrt(list_dot_product(c.ce, c.ce))
                               * sqrt(list_dot_product(q.qe, q.qe)))
                            DESC, c.cid ASC
               ) AS rn
        FROM cent c CROSS JOIN q
    ) WHERE rn <= 4
), assign AS (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding, c.ce)
                        / (sqrt(list_dot_product(e.embedding, e.embedding))
                           * sqrt(list_dot_product(c.ce, c.ce)))
                        DESC, c.cid ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cent c
), cand AS (
    SELECT q.query_id, e.vec_id,
           list_dot_product(e.embedding, q.qe)
           / (sqrt(list_dot_product(e.embedding, e.embedding))
              * sqrt(list_dot_product(q.qe, q.qe))) AS sim_raw
    FROM embeddings e
    JOIN assign a ON a.vec_id = e.vec_id AND a.rn = 1
    JOIN probe p ON p.cid = a.cid
    JOIN q ON q.query_id = p.query_id
)
SELECT query_id, vec_id, round(sim_raw, 4) AS cos_sim FROM (
    SELECT query_id, vec_id, sim_raw,
           row_number() OVER (
               PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC
           ) AS rn
    FROM cand
) WHERE rn <= 10
"""


@_register("ivf_topk_multi", _IVF_MULTI_SQL)
def ivf_topk_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_query,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    index = build_ivf_index(e, n_centroids=16)
    return ivf_query(index, q, k=10, n_probe=4)


# --------------------------------------------------------------------------
# 20. pricing_summary — TPC-H Q1-style multi-agg (SURVEY.md §2.5 parity /
# bench headline; exercises partial-agg + codegen)
# --------------------------------------------------------------------------
_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@_register("pricing_summary", _Q1_SQL)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# 21. minhash_lsh_candidates — near-dup candidate pairs via MinHash+LSH
# (training-data op). Round 2: the shingle hash is the engine-portable
# md5-prefix affine family (operators/dedup.py:portable_hash60), so the
# full pipeline — shingling, 32 minhashes, 8-band LSH, bucket-capped pair
# generation — has an exact DuckDB oracle.
# --------------------------------------------------------------------------
# CTE block shared by minhash_lsh_candidates and neardup_clusters (the
# clusters oracle runs a recursive transitive closure over these pairs)
_MINHASH_CTES = r"""ws AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '') AS w
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(0, greatest(len(w) - 3, 0)),
                   i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
        FROM ws)
    WHERE shingle <> ''
), hm AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)
               % 9007199254740881 AS h
    FROM sh
), kh AS (
    SELECT doc_id, k,
           min(((2*k + 3) * h + (k*1000003 + 12289)) % 9007199254740881) AS mh
    FROM hm CROSS JOIN generate_series(0, 31) t(k)
    GROUP BY doc_id, k
), sig AS (
    SELECT doc_id, array_agg(mh ORDER BY k) AS s FROM kh GROUP BY doc_id
), bands AS (
    SELECT doc_id, b,
           CAST(('0x' || substr(md5(
               'b|' || CAST(b AS VARCHAR) || '|' ||
               array_to_string(s[b*4+1 : b*4+4], ',')), 1, 15)) AS BIGINT)
               AS band_hash
    FROM sig CROSS JOIN generate_series(0, 7) t(b)
), sized AS (
    SELECT b, band_hash FROM bands GROUP BY b, band_hash
    HAVING count(DISTINCT doc_id) BETWEEN 2 AND 1000
), mem AS (
    SELECT bands.doc_id, bands.b, bands.band_hash
    FROM bands JOIN sized USING (b, band_hash)
)"""

_MINHASH_SQL = f"""
WITH {_MINHASH_CTES}
SELECT m1.doc_id AS doc_a, m2.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_bands
FROM mem m1
JOIN mem m2 ON m1.b = m2.b AND m1.band_hash = m2.band_hash
           AND m1.doc_id < m2.doc_id
GROUP BY m1.doc_id, m2.doc_id
"""


@_register("minhash_lsh_candidates", _MINHASH_SQL)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), n_hashes=32, n_bands=8
    )


# --------------------------------------------------------------------------
# 21b. neardup_clusters — connected components over the LSH candidate
# graph (operators/dedup.py near_dup_clusters): cluster_id = min doc_id
# in the component, singletons label themselves. Spark runs min-label
# propagation to its (unique, order-free) fixpoint; the oracle computes
# the same thing via a RECURSIVE transitive closure over the identical
# pair CTEs — an iterative Spark algorithm under a full SQL oracle.
# --------------------------------------------------------------------------
_CLUSTERS_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES}, pairs AS (
    SELECT m1.doc_id AS doc_a, m2.doc_id AS doc_b
    FROM mem m1
    JOIN mem m2 ON m1.b = m2.b AND m1.band_hash = m2.band_hash
               AND m1.doc_id < m2.doc_id
    GROUP BY m1.doc_id, m2.doc_id
), edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


_REPS_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES}, pairs AS (
    SELECT m1.doc_id AS doc_a, m2.doc_id AS doc_b
    FROM mem m1
    JOIN mem m2 ON m1.b = m2.b AND m1.band_hash = m2.band_hash
               AND m1.doc_id < m2.doc_id
    GROUP BY m1.doc_id, m2.doc_id
), cedges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), reach(a, b) AS (
    SELECT a, b FROM cedges
    UNION
    SELECT r.a, e.b FROM reach r JOIN cedges e ON r.b = e.a
), comp AS (
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
), clusters AS (
    SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
           length(d.text) AS len
    FROM documents d LEFT JOIN comp c USING (doc_id)
)
SELECT cluster_id,
       arg_max(doc_id, len * 1000000000000 - doc_id) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS n_members
FROM clusters GROUP BY cluster_id
"""


@_register("neardup_representatives", _REPS_SQL)
def neardup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-longest dedup decisions per near-dup cluster (the policy a
    quality-preserving pipeline actually wants: near-dups are usually
    truncations of one canonical page)."""
    from arango_etl_spark.operators.dedup import near_dup_representatives

    return near_dup_representatives(
        _t(spark, sf_dir, "documents"), prefer="longest",
        n_hashes=32, n_bands=8,
    )


@_register("neardup_clusters", _CLUSTERS_SQL)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.dedup import near_dup_clusters

    return near_dup_clusters(
        _t(spark, sf_dir, "documents"), n_hashes=32, n_bands=8
    )


# --------------------------------------------------------------------------
# 22. simhash_docs — 64-bit SimHash per document (training-data op).
# Round 2: word hash = two 32-bit halves of md5 → exact DuckDB oracle.
# --------------------------------------------------------------------------
_SIMHASH_SQL = r"""
WITH w AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              x -> x <> '')) AS word
    FROM documents
), h AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT) AS h_lo,
           CAST(('0x' || substr(md5(word), 9, 8)) AS BIGINT) AS h_hi
    FROM w
), votes AS (
    SELECT doc_id, i,
           CAST(sum(CASE WHEN
                (((CASE WHEN i < 32 THEN h_lo ELSE h_hi END) >> (i % 32)) & 1) = 1
                THEN 1 ELSE -1 END) AS BIGINT) AS v
    FROM h CROSS JOIN generate_series(0, 63) t(i)
    GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(sum(CASE WHEN i < 63 AND v > 0
                THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT)
           AS simhash63,
       max(CASE WHEN i = 63 THEN v END) > 0 AS sign_bit
FROM votes GROUP BY doc_id
"""


@_register("simhash_docs", _SIMHASH_SQL)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# 23. base64url_ids — URL-safe base64 key encoding (SURVEY.md T1;
# poc_id = URL_SAFE_NO_PAD base64, /root/reference/src/document/beacon.rs:68)
# --------------------------------------------------------------------------
_B64_SQL = """
SELECT doc_id,
       rtrim(translate(to_base64(encode(substr(text, 1, 24))), '+/', '-_'),
             '=') AS key_b64url
FROM documents
"""


@_register("base64url_ids", _B64_SQL)
def base64url_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.translate(
                F.base64(F.encode(F.substring("text", 1, 24), "utf-8")),
                "+/", "-_",
            ),
            "=+$", "",
        ).alias("key_b64url"),
    )


# --------------------------------------------------------------------------
# 24. deterministic_names — pubkey → readable name (SURVEY.md T8;
# angry-purple-tiger naming, /root/reference/src/document/mod.rs:22-24):
# same words, chosen by pure arithmetic so both engines agree.
# --------------------------------------------------------------------------
_ADJ = ["angry", "brave", "calm", "dapper", "eager", "fancy", "gentle", "happy"]
_COL = ["purple", "red", "blue", "green", "amber", "coral", "ivory", "jade"]
_ANI = ["tiger", "otter", "heron", "lynx", "mole", "newt", "okapi", "panda"]


def _name_sql() -> str:
    adj = "[" + ",".join(f"'{w}'" for w in _ADJ) + "]"
    col = "[" + ",".join(f"'{w}'" for w in _COL) + "]"
    ani = "[" + ",".join(f"'{w}'" for w in _ANI) + "]"
    return f"""
SELECT user_id,
       {adj}[CAST(user_id % 8 AS INT) + 1] || '-' ||
       {col}[CAST((user_id // 8) % 8 AS INT) + 1] || '-' ||
       {ani}[CAST((user_id // 64) % 8 AS INT) + 1] AS animal_name
FROM (SELECT DISTINCT user_id FROM events)
"""


@_register("deterministic_names", _name_sql())
def deterministic_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id").distinct()
    adj = F.array(*[F.lit(w) for w in _ADJ])
    col = F.array(*[F.lit(w) for w in _COL])
    ani = F.array(*[F.lit(w) for w in _ANI])
    u = F.col("user_id")
    return ev.select(
        "user_id",
        F.concat_ws(
            "-",
            F.element_at(adj, F.pmod(u, F.lit(8)).cast("int") + 1),
            F.element_at(col, F.pmod(F.floor(u / 8), F.lit(8)).cast("int") + 1),
            F.element_at(ani, F.pmod(F.floor(u / 64), F.lit(8)).cast("int") + 1),
        ).alias("animal_name"),
    )


# --------------------------------------------------------------------------
# 25. zero_default_lookup — missing-row default fold (SURVEY.md A7/F3;
# retries lookup defaults 0, /root/reference/src/handler/arangodb.rs:140-144)
# --------------------------------------------------------------------------
_ZERO_SQL = """
SELECT c.c_custkey,
       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders
FROM customer c
LEFT JOIN (
    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
) o ON o.o_custkey = c.c_custkey
"""


@_register("zero_default_lookup", _ZERO_SQL)
def zero_default_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders")
    )


# --------------------------------------------------------------------------
# 26. sessionize — gap-based sessionization (beyond-reference OLAP op:
# lag + cumulative sum over gap>30min boundaries)
# --------------------------------------------------------------------------
_SESSION_SQL = """
WITH gaps AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_ms(ts) - epoch_ms(
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           ) > 1800000 THEN 1 ELSE 0 END AS new_session
    FROM events
), sessions AS (
    SELECT user_id,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS session_id
    FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions GROUP BY user_id, session_id
"""


@_register("sessionize", _SESSION_SQL)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = lambda c: F.unix_millis(c.cast("timestamp"))  # noqa: E731
    gaps = ev.withColumn(
        "new_session",
        F.when(
            ms(F.col("ts")) - ms(F.lag("ts").over(w)) > 1_800_000, 1
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# --------------------------------------------------------------------------
# 27. topk_per_group — per-group top-k (beyond-reference OLAP op; Catalyst
# rewrites to WindowGroupLimit: partial top-k before the shuffle)
# --------------------------------------------------------------------------
_TOPK_SQL = """
WITH ranked AS (
    SELECT event_type, event_id, round(value, 6) AS value,
           row_number() OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id ASC
           ) AS rk
    FROM events
)
SELECT event_type, event_id, value, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3
"""


@_register("topk_per_group", _TOPK_SQL)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "event_type", "event_id",
            F.round("value", 6).alias("value"), F.col("rk").cast("int"),
        )
    )


# --------------------------------------------------------------------------
# 28. pivot_event_counts — manual pivot (conditional aggregation; stable
# across engines unlike native PIVOT column naming)
# --------------------------------------------------------------------------
_PIVOT_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase
FROM events GROUP BY user_id
"""


@_register("pivot_event_counts", _PIVOT_SQL)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cnt = lambda t: F.count(  # noqa: E731
        F.when(F.col("event_type") == t, F.lit(1))
    )
    return ev.groupBy("user_id").agg(
        cnt("click").alias("n_click"),
        cnt("view").alias("n_view"),
        cnt("purchase").alias("n_purchase"),
    )


# --------------------------------------------------------------------------
# 29. rollup_pricing — hierarchical totals (beyond-reference: ROLLUP
# grouping sets, subtotal rows labeled 'ALL')
# --------------------------------------------------------------------------
_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@_register("rollup_pricing", _ROLLUP_SQL)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty", "n_rows",
        )
    )


# --------------------------------------------------------------------------
# 30. cursor_by_day — grouped min/max cursors (SURVEY.md A1/A2 per
# partition; the reference's resume-cursor fold applied per event-time day)
# --------------------------------------------------------------------------
_CURSOR_DAY_SQL = """
SELECT CAST(ts AS DATE) AS day, max(ts) AS max_ts, min(ts) AS min_ts,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY CAST(ts AS DATE)
"""


@_register("cursor_by_day", _CURSOR_DAY_SQL)
def cursor_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.max("ts").alias("max_ts"),
        F.min("ts").alias("min_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# 31. unknown_coalesce_keys — null-tolerant key building (SURVEY.md T9:
# edge key uses 'unknown' when a location is absent,
# /root/reference/src/document/edge.rs:36-43)
# --------------------------------------------------------------------------
_UNKNOWN_SQL = """
SELECT doc_id,
       'doc_' || coalesce(nullif(lang, 'en'), 'unknown')
           || '_' || source AS group_key
FROM documents
"""


@_register("unknown_coalesce_keys", _UNKNOWN_SQL)
def unknown_coalesce_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit("doc_"),
            F.coalesce(F.nullif(F.col("lang"), F.lit("en")), F.lit("unknown")),
            F.lit("_"),
            F.col("source"),
        ).alias("group_key"),
    )


# --------------------------------------------------------------------------
# 32. asof_join_views — point-in-time join (beyond-reference operator the
# guide flags as missing from Spark): each purchase event gets the latest
# at-or-before view's value for the same user. Implemented as the
# union + last(ignorenulls) window composition (operators/asof.py); the
# oracle states the identical window in DuckDB SQL.
# --------------------------------------------------------------------------
_ASOF_SQL = """
WITH u AS (
    SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE) AS quote, 1 AS is_left
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT user_id, ts, event_id, value, 0 FROM events
    WHERE event_type = 'view'
), w AS (
    SELECT *, last_value(quote IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY ts, event_id, is_left
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS q
    FROM u
)
SELECT user_id, event_id, round(q, 6) AS view_value_asof
FROM w WHERE is_left = 1
"""


@_register("asof_join_views", _ASOF_SQL)
def asof_join_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.col("value").alias("quote")
    )
    joined = asof_join(
        purchases, views,
        key_cols=["user_id"], ts_col="ts",
        value_cols=["quote"], tiebreak_col="event_id",
    )
    return joined.select(
        "user_id", "event_id",
        F.round(F.col("quote_asof"), 6).alias("view_value_asof"),
    )


# --------------------------------------------------------------------------
# 33. geo_cell_enrich — T5/T6 geo enrichment: point → cell id → center
# lat/lng → GeoJSON boundary polygon → res-5 parent cell
# (/root/reference/src/document/loc_data.rs:31-48,76-99; deterministic
# stand-in grid for H3 — decision record in operators/geo.py docstring).
# lat/lng synthesized from user_id like haversine_distance.
# --------------------------------------------------------------------------
_GEO_PTS_SQL = """
SELECT DISTINCT user_id,
       CAST(user_id % 170 AS DOUBLE) - 85.0 + 0.25  AS lat,
       CAST((user_id * 7) % 350 AS DOUBLE) - 175.0 + 0.25 AS lng
FROM events
"""


def _geo_sql() -> str:
    from arango_etl_spark.operators.geo import geo_enrich_oracle_sql

    return geo_enrich_oracle_sql(_GEO_PTS_SQL, "lat", "lng")


@_register("geo_cell_enrich", _geo_sql())
def geo_cell_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.geo import geo_enrich

    ev = _t(spark, sf_dir, "events").select("user_id").distinct()
    lat = (F.pmod(F.col("user_id"), F.lit(170))).cast("double") - 85.0 + 0.25
    lng = (F.pmod(F.col("user_id") * 7, F.lit(350))).cast("double") - 175.0 + 0.25
    pts = ev.select("user_id", lat.alias("lat"), lng.alias("lng"))
    return geo_enrich(pts, "lat", "lng").drop("lat", "lng")


# --------------------------------------------------------------------------
# 34. wav_features — REAL multimodal decode: deterministic RIFF/WAV bytes
# synthesized per doc (stdlib wave writer inside mapInPandas), then parsed
# back by the wave reader and reduced to amplitude features. The synthesis
# formula (n = 64 + doc_id%64; sample_i = (doc_id*31+i*7)%256) is mirrored
# in DuckDB, so the oracle checks the actual binary decode end-to-end.
# --------------------------------------------------------------------------
_WAV_SQL = """
WITH d AS (
    SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
), s AS (
    SELECT doc_id, n, (doc_id*31 + i*7) % 256 AS amp
    FROM d CROSS JOIN generate_series(0, 127) t(i)
    WHERE i < n
)
SELECT doc_id,
       CAST(max(n) AS INTEGER) AS n_frames,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(1 AS INTEGER) AS sample_width,
       round(avg(amp), 6) AS mean_amp,
       round(sqrt(avg(amp*amp)), 6) AS rms
FROM s GROUP BY doc_id
"""


@_register("wav_features", _WAV_SQL)
def wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.multimodal import (
        decode_wav_features,
        synthesize_wav,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = decode_wav_features(synthesize_wav(docs))
    return feats.select(
        "doc_id", "n_frames", "sample_rate", "n_channels", "sample_width",
        F.round("mean_amp", 6).alias("mean_amp"),
        F.round("rms", 6).alias("rms"),
    )


# --------------------------------------------------------------------------
# 34b. bmp_features — REAL image decode: deterministic 24-bit BMP bytes
# synthesized per doc (struct-packed headers, bottom-up padded rows inside
# mapInPandas), then parsed back by the numpy decoder. The pixel formula
# (w = 4 + doc_id%5, h = 4 + doc_id%3; channel value
# (doc_id*31 + p*7 + c*13) % 256 for raster pixel p, channel c∈{B,G,R})
# is mirrored in DuckDB, so the oracle value-checks the actual binary
# decode — including row padding (w ∈ {5,6,7}) and the bottom-up flip
# (top_left_sum is the IMAGE-top-left pixel, which lives in the LAST
# file row).
# --------------------------------------------------------------------------
_BMP_SQL = """
WITH d AS (
    SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h FROM documents
), px AS (
    SELECT doc_id, w, h, i // 3 AS p, i % 3 AS c,
           (doc_id*31 + (i // 3)*7 + (i % 3)*13) % 256 AS v
    FROM d CROSS JOIN generate_series(0, 143) t(i)
    WHERE i < 3 * w * h
)
SELECT doc_id,
       CAST(max(w) AS INTEGER) AS width,
       CAST(max(h) AS INTEGER) AS height,
       round(avg(CASE WHEN c = 0 THEN v END), 6) AS mean_b,
       round(avg(CASE WHEN c = 1 THEN v END), 6) AS mean_g,
       round(avg(CASE WHEN c = 2 THEN v END), 6) AS mean_r,
       CAST(sum(CASE WHEN p = 0 THEN v ELSE 0 END) AS BIGINT) AS top_left_sum
FROM px GROUP BY doc_id
"""


@_register("bmp_features", _BMP_SQL)
def bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.multimodal import (
        decode_bmp_features,
        synthesize_bmp,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = decode_bmp_features(synthesize_bmp(docs))
    return feats.select(
        "doc_id", "width", "height",
        F.round("mean_b", 6).alias("mean_b"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_r", 6).alias("mean_r"),
        "top_left_sum",
    )


# --------------------------------------------------------------------------
# 40b. mixture_sampled — dataset-mixture sampling (operators/packing.py
# mixture_sample): per-source permille weights over the portable hash
# gate + a shuffle_key for deterministic training order. src0 kept in
# full, src1 at 50%, src2 at 10%, everything else dropped.
# --------------------------------------------------------------------------
_MIXTURE_SQL = """
WITH h AS (
    SELECT doc_id, source,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS hh
    FROM documents
)
SELECT doc_id, source, hh AS shuffle_key
FROM h
WHERE hh % 1000 < CASE source
                  WHEN 'src0' THEN 1000
                  WHEN 'src1' THEN 500
                  WHEN 'src2' THEN 100
                  ELSE 0 END
"""


@_register("mixture_sampled", _MIXTURE_SQL)
def mixture_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.packing import mixture_sample

    return mixture_sample(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        weights={"src0": 1000, "src1": 500, "src2": 100},
    )


# --------------------------------------------------------------------------
# 34c. repetition_signals — Gopher-style repetition quality filter
# (operators/text.py repetition_signals): duplicate-word / top-word /
# top-bigram fractions as EXACT integer ppm (floor((1e6*k)/n)) — integer
# outputs sidestep the round() HALF_UP vs HALF_EVEN tie class entirely
# (e.g. 1/128 ties at the 7th decimal).
# --------------------------------------------------------------------------
_REPETITION_SQL = r"""
WITH ws AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '') AS w
    FROM documents
), words AS (
    SELECT doc_id, unnest(w) AS g FROM ws
), wc AS (
    SELECT doc_id, g, count(*) AS c FROM words GROUP BY doc_id, g
), wagg AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS w_total,
           CAST(count(*) AS BIGINT) AS w_distinct,
           CAST(max(c) AS BIGINT) AS w_top
    FROM wc GROUP BY doc_id
), bigrams AS (
    SELECT doc_id,
           unnest(list_transform(
               generate_series(0, greatest(len(w) - 2, 0)),
               i -> array_to_string(w[i+1:i+2], ' '))) AS g
    FROM ws
), bc AS (
    SELECT doc_id, g, count(*) AS c FROM bigrams GROUP BY doc_id, g
), bagg AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS b_total,
           CAST(max(c) AS BIGINT) AS b_top
    FROM bc GROUP BY doc_id
)
SELECT w.doc_id, w.w_total AS n_words, w.w_distinct AS n_distinct_words,
       CAST(floor((1000000.0 * (w.w_total - w.w_distinct)) / w.w_total)
            AS BIGINT) AS dup_word_ppm,
       CAST(floor((1000000.0 * w.w_top) / w.w_total) AS BIGINT)
           AS top_word_ppm,
       CAST(floor((1000000.0 * b.b_top) / b.b_total) AS BIGINT)
           AS top_bigram_ppm
FROM wagg w JOIN bagg b USING (doc_id)
"""


@_register("repetition_signals", _REPETITION_SQL)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.text import repetition_signals as _rep

    return _rep(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# 35. jaccard_pairs — exact n-gram Jaccard over inverted-index candidates
# (training-data op; operators/dedup.py jaccard_ngram_pairs). Pure
# set-arithmetic → full DuckDB oracle.
# --------------------------------------------------------------------------
_JACCARD_SQL = r"""
WITH ws AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '') AS w
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(0, greatest(len(w) - 3, 0)),
                   i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
        FROM ws)
    WHERE shingle <> ''
), sizes AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
), buckets AS (
    SELECT shingle FROM sh GROUP BY shingle
    HAVING count(*) BETWEEN 2 AND 1000
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS inter
    FROM sh a JOIN buckets USING (shingle)
    JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM (
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6)
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
)
WHERE jaccard >= 0.2
"""


@_register("jaccard_pairs", _JACCARD_SQL)
def jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.dedup import jaccard_ngram_pairs

    return jaccard_ngram_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.2
    )


# --------------------------------------------------------------------------
# 36. language_id_docs — stopword-marker language heuristic
# (operators/text.py language_id; pure length arithmetic → DuckDB oracle).
# --------------------------------------------------------------------------
def _lang_sql() -> str:
    from arango_etl_spark.operators.text import LANG_MARKERS

    def cnt(m: str) -> str:
        esc = m.replace("'", "''")
        return (f"(length(p) - length(replace(p, '{esc}', '')))"
                f" / {len(m)}")

    score = {
        lang: " + ".join(cnt(m) for m in ms)
        for lang, ms in LANG_MARKERS.items()
    }
    # fold langs in dict order with strict > (mirrors the Spark fold:
    # later lang wins only when strictly greater)
    langs = list(score.keys())
    best_score, best_lang = f"({score[langs[0]]})", f"'{langs[0]}'"
    for lang in langs[1:]:
        s = f"({score[lang]})"
        best_lang = (f"CASE WHEN {s} > {best_score} THEN '{lang}' "
                     f"ELSE {best_lang} END")
        best_score = f"greatest({s}, {best_score})"
    return f"""
WITH p0 AS (
    SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents
)
SELECT doc_id,
       CASE WHEN {best_score} > 0 THEN {best_lang}
            ELSE 'unknown' END AS predicted_lang
FROM p0
"""


@_register("language_id_docs", _lang_sql())
def language_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.text import language_id

    return language_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "predicted_lang"
    )


# --------------------------------------------------------------------------
# 37. cdc_engine_replay — the ACTUAL ENGINE under the oracle gate: the same
# synthesized 5-version change log as cdc_final_state, but applied through
# the real path — SnapshotTable + apply_changes (MoR, batch fences,
# compaction) — then read back LWW-resolved. cdc_final_state checks the
# QUERY semantics; this row checks the TABLE/MERGE machinery end-to-end.
# --------------------------------------------------------------------------
@_register("cdc_engine_replay", _CDC_SQL)
def cdc_engine_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from arango_etl_spark.functions.tokenizer import n_tok_expr, tokens_expr
    from arango_etl_spark.operators.merge_into import apply_changes, compact
    from arango_etl_spark.plans.lakehouse import SnapshotTable

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    ev = d.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(5))))
    seq = F.col("doc_id") * 5 + F.col("k")
    ev = ev.select(
        # distinct alias: Spark 4 lateral column aliases would otherwise
        # resolve the tokens_expr doc_id reference to the STRING key
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_key"),
        seq.alias("seq_no"),
        F.when(
            F.pmod(F.col("doc_id") * 3 + F.col("k"), F.lit(11)) == 0, "delete"
        ).otherwise(F.lit("update")).alias("op"),
        tokens_expr(F.col("doc_id"), seq).alias("tokens"),
        n_tok_expr(F.col("doc_id"), seq).alias("n_tok"),
        F.col("source"),
        # batch k-1: version k of every doc arrives in micro-batch k-1 →
        # multi-batch replay with genuine cross-batch LWW updates
        (F.col("k") - 1).cast("long").alias("batch_id"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("event_ts"),
    ).withColumnRenamed("doc_key", "doc_id")
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    table = SnapshotTable.create(
        tempfile.mkdtemp(prefix="parity_engine_") + "/t", payload, n_buckets=16
    )
    for b in range(5):
        apply_changes(
            spark, table, ev.where(F.col("batch_id") == b),
            batch_id=b, fence_stream_id="parity", strategy="mor",
            compact_every=0,
        )
    compact(spark, table)  # exercise the maintenance path too
    return table.read(spark).select(
        "doc_id",
        F.array_join("tokens", ",").alias("tokens_csv"),
        "n_tok",
        "source",
    )


# --------------------------------------------------------------------------
# 38. embedding_near_dups — cosine near-duplicate pairs via multi-table
# hyperplane LSH + exact confirm (training-data op). Round 2: plane
# weights are driver-side literals and the bucket hash is md5-portable,
# so the FULL pipeline — 48 hyperplane signs, 6 tables × 8-bit buckets,
# capped pair generation, exact cosine confirm — has a DuckDB oracle
# (weights embedded as literal arrays; dim=64 across all testdata sfs).
# --------------------------------------------------------------------------
def _emb_neardup_sql(dim: int = 64, n_planes: int = 8, n_tables: int = 6,
                     threshold: float = 0.25) -> str:
    from arango_etl_spark.operators.similarity import _plane_weights

    ws = _plane_weights(dim, n_planes * n_tables, seed=7)
    rows = ",\n ".join(f"({p}, {ws[p]})" for p in range(n_planes * n_tables))
    return f"""
WITH planes AS (SELECT * FROM (VALUES {rows}) pl(p, w)),
bits AS (
    SELECT e.vec_id, pl.p,
           CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.w)
                     >= 0 THEN 1 ELSE 0 END AS b
    FROM embeddings e CROSS JOIN planes pl
), tb AS (
    SELECT vec_id, p // {n_planes} AS t,
           string_agg(CAST(b AS VARCHAR), '' ORDER BY p) AS bs
    FROM bits GROUP BY vec_id, p // {n_planes}
), bucketed AS (
    SELECT vec_id,
           CAST(('0x' || substr(md5('t|' || CAST(t AS VARCHAR) || '|' || bs),
                                1, 15)) AS BIGINT) AS bucket
    FROM tb
), sized AS (
    SELECT bucket FROM bucketed GROUP BY bucket
    HAVING count(DISTINCT vec_id) BETWEEN 2 AND 1000
), pairs AS (
    SELECT DISTINCT m1.vec_id AS doc_a, m2.vec_id AS doc_b
    FROM bucketed m1 JOIN sized USING (bucket)
    JOIN bucketed m2 ON m1.bucket = m2.bucket AND m1.vec_id < m2.vec_id
)
SELECT doc_a, doc_b, cos_sim FROM (
    SELECT doc_a, doc_b,
           round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                          CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])))),
                 6) AS cos_sim
    FROM pairs
    JOIN embeddings a ON a.vec_id = doc_a
    JOIN embeddings b ON b.vec_id = doc_b
)
WHERE cos_sim >= {threshold}
"""


@_register("embedding_near_dups", _emb_neardup_sql())
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.dedup import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, dim=64, threshold=0.25, n_planes=8, n_tables=6
    )


# --------------------------------------------------------------------------
# 39. pack_chunks — sequence packing: concatenate per-doc token arrays in
# doc order per source and split into fixed 256-token training chunks
# (operators/packing.py; the standard pre-training packing step). Chunk
# stats compared (count/first/last/sum) — full oracle.
# --------------------------------------------------------------------------
_PACK_SQL = f"""
WITH d AS (
    SELECT source, doc_id,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     AS BIGINT) % 4 AS INTEGER) AS shard,
           {tokens_sql("doc_id", "doc_id")} AS tokens,
           {n_tok_sql("doc_id", "doc_id")}  AS n
    FROM documents
), off AS (
    SELECT source, shard, tokens,
           sum(n) OVER (PARTITION BY source, shard ORDER BY doc_id) - n AS o
    FROM d
), tok AS (
    -- no WITH ORDINALITY in this DuckDB build: index via generate_series
    -- (token arrays are <= 65 long by the tokenizer formula)
    SELECT source, shard, o + i - 1 AS gpos, tokens[i] AS tok
    FROM off CROSS JOIN generate_series(1, 65) t(i)
    WHERE i <= len(tokens)
)
SELECT source, shard,
       CAST(floor(gpos / 256.0) AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       arg_min(tok, gpos) AS first_token,
       arg_max(tok, gpos) AS last_token,
       CAST(sum(tok) AS BIGINT) AS token_sum
FROM tok GROUP BY source, shard, CAST(floor(gpos / 256.0) AS BIGINT)
"""


@_register("pack_chunks", _PACK_SQL)
def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.functions.tokenizer import tokens_expr
    from arango_etl_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        tokens_expr(F.col("doc_id"), F.col("doc_id")).alias("tokens"),
    )
    return pack_sequences(
        d, chunk_len=256, order_col="doc_id", group_cols=["source"],
        n_shards=4,
    )


# --------------------------------------------------------------------------
# 40. sampled_docs — deterministic hash sampling at an exact permille
# (operators/packing.py deterministic_sample; replayable, no RNG state).
# --------------------------------------------------------------------------
_SAMPLE_SQL = """
SELECT doc_id, source FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % 1000 < 250
"""


@_register("sampled_docs", _SAMPLE_SQL)
def sampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.packing import deterministic_sample

    return deterministic_sample(
        _t(spark, sf_dir, "documents"), permille=250
    ).select("doc_id", "source")


# --------------------------------------------------------------------------
# 41. windowed_event_counts — tumbling event-time window aggregation (the
# batch form of streaming/windows.py's watermarked metrics; SURVEY ST8).
# Epoch-aligned 1-hour windows == DuckDB time_bucket. Aggregates are
# order-independent (count/min/max) so the compare is float-exact.
# --------------------------------------------------------------------------
_WINDOWED_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY 1, 2
"""


@_register("windowed_event_counts", _WINDOWED_SQL)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "min_value", "max_value",
        )
    )


# --------------------------------------------------------------------------
# 41a. range_join_windows — interval-containment join via the binned
# range-join operator (operators/rangejoin.py): events against derived
# per-day 02:00-04:00 maintenance windows, half-open [start, end). The
# oracle is the plain inequality join — the bin bucketing must be
# invisible in the result. Output is exact-integer/timestamp (no float
# hazard).
# --------------------------------------------------------------------------
_RANGE_JOIN_SQL = """
WITH w AS (
    SELECT DISTINCT
           date_trunc('day', ts) + INTERVAL 2 HOUR AS start_ts,
           date_trunc('day', ts) + INTERVAL 4 HOUR AS end_ts
    FROM events
)
SELECT e.event_id, w.start_ts AS win_start
FROM events e
JOIN w ON e.ts >= w.start_ts AND e.ts < w.end_ts
"""


@_register("range_join_windows", _RANGE_JOIN_SQL)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    wins = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("_day"))
        .distinct()
        .select(
            (F.col("_day") + F.expr("INTERVAL 2 HOURS")).alias("start_ts"),
            (F.col("_day") + F.expr("INTERVAL 4 HOURS")).alias("end_ts"),
        )
    )
    return range_join(
        ev.select("event_id", "ts"), wins, ts_col="ts",
        bin_seconds=3600,
    ).select("event_id", F.col("start_ts").alias("win_start"))


# --------------------------------------------------------------------------
# 41a-left. range_join_left — the left mode of the binned range join:
# every event kept, null window for events outside any 02:00-04:00
# maintenance window. Single-pass: ONE left_outer equi-join on the bin
# key with containment in the join condition (the fact side is scanned
# once — plan-asserted in test_plans.py).
# --------------------------------------------------------------------------
# ORACLE SHAPE NOTE: the obvious formulation (events LEFT JOIN windows
# ON two inequalities) intermittently LIVELOCKS DuckDB's inequality-
# left-join path under a multithreaded process (reproduced twice in
# full-suite runs, hang always at this query's fetchall; the inner
# inequality join used by range_join_windows has been stable for three
# rounds). Decompose instead: inner inequality join for the matches,
# then an EQUALITY left join to re-attach unmatched events — identical
# semantics (multi-window events replicate through the equality join),
# no inequality-outer-join plan anywhere.
_RANGE_JOIN_LEFT_SQL = """
WITH w AS (
    SELECT DISTINCT
           date_trunc('day', ts) + INTERVAL 2 HOUR AS start_ts,
           date_trunc('day', ts) + INTERVAL 4 HOUR AS end_ts
    FROM events
), m AS (
    SELECT e.event_id, w.start_ts
    FROM events e
    JOIN w ON e.ts >= w.start_ts AND e.ts < w.end_ts
)
SELECT e.event_id, m.start_ts AS win_start
FROM events e
LEFT JOIN m ON m.event_id = e.event_id
"""


@_register("range_join_left", _RANGE_JOIN_LEFT_SQL)
def range_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    wins = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("_day"))
        .distinct()
        .select(
            (F.col("_day") + F.expr("INTERVAL 2 HOURS")).alias("start_ts"),
            (F.col("_day") + F.expr("INTERVAL 4 HOURS")).alias("end_ts"),
        )
    )
    return range_join(
        ev.select("event_id", "ts"), wins, ts_col="ts",
        bin_seconds=3600, how="left",
    ).select("event_id", F.col("start_ts").alias("win_start"))


# --------------------------------------------------------------------------
# 41b. vocab_topk — global token-vocabulary top-50 by frequency over the
# synthesized token arrays: map-side explode + partial-aggregating count,
# then a DISTRIBUTED global top-k (TakeOrderedAndProject — local k-row
# heaps per partition, driver merge; never a global window). Exact
# integer output.
# --------------------------------------------------------------------------
_VOCAB_SQL = f"""
WITH d AS (
    SELECT doc_id, {tokens_sql("doc_id", "doc_id")} AS tokens FROM documents
), t AS (
    SELECT unnest(tokens) AS token FROM d
)
SELECT CAST(token AS INTEGER) AS token, CAST(count(*) AS BIGINT) AS cnt
FROM t GROUP BY token
ORDER BY cnt DESC, token ASC LIMIT 50
"""


@_register("vocab_topk", _VOCAB_SQL)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.functions.tokenizer import tokens_expr

    d = _t(spark, sf_dir, "documents").select(
        F.explode(
            tokens_expr(F.col("doc_id"), F.col("doc_id"))
        ).alias("token")
    )
    return (
        d.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(50)
    )


# --------------------------------------------------------------------------
# session_window_stats — Spark's NATIVE session_window operator (dynamic
# gap-merged event-time sessions; the streaming-capable form of the
# gaps-and-islands sessionize query). Session end = last event + gap;
# two windows merge iff the later start < earlier start + gap, i.e. a
# NEW session begins exactly when the gap from the previous event is
# >= 30 min — which is what the DuckDB islands CTE mirrors.
# --------------------------------------------------------------------------
_SESSION_WINDOW_SQL = """
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
    SELECT user_id, ts,
           sum(new_s) OVER (
               -- event_id tie-break matches the flag window: on a
               -- duplicate (user_id, ts) the running sum must see the
               -- new_s=1 row first or simultaneous events split across
               -- sessions (ADVICE r4 #4; ROWS frame keeps the sum exact)
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sid
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM islands GROUP BY user_id, sid
"""


@_register("session_window_stats", _SESSION_WINDOW_SQL)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window(F.col("ts"), "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# q18_large_volume_customers — TPC-H Q18 shape: the HAVING subquery is a
# broadcast semi-join of the large-order keys (one partial-aggregating
# pass over lineitem produces the key set; the fact re-scan joins it),
# then a three-table join and per-order re-aggregation, top-50.
# --------------------------------------------------------------------------
_Q18_SQL = """
WITH big AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 220
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 50
"""


@_register("q18_large_volume_customers", _Q18_SQL)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .where(F.col("_sq") > 220)
        .select("l_orderkey")
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(big.withColumnRenamed("l_orderkey", "_big_key")),
            F.col("o_orderkey") == F.col("_big_key"),
            "left_semi",
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


# --------------------------------------------------------------------------
# truncate_pad — token-sequence shaping for fixed-length training input:
# truncate to max_len and right-pad with pad_id; emits the attention
# length alongside. Pure columnar slice/concat — map-only at any scale.
# --------------------------------------------------------------------------
_TRUNCPAD_SQL = f"""
WITH d AS (
    SELECT doc_id, {tokens_sql("doc_id", "doc_id")} AS tokens FROM documents
), shaped AS (
    SELECT doc_id,
           tokens[1:LEAST(len(tokens), 32)] AS kept,
           LEAST(len(tokens), 32) AS attn_len
    FROM d
)
SELECT doc_id,
       CAST(attn_len AS INTEGER) AS attn_len,
       array_to_string(
           list_concat(kept,
               list_transform(generate_series(1, 32 - attn_len), i -> -1)),
           ',') AS padded_csv
FROM shaped
"""


@_register("truncate_pad", _TRUNCPAD_SQL)
def truncate_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.functions.tokenizer import tokens_expr

    max_len, pad_id = 32, -1
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr(F.col("doc_id"), F.col("doc_id")).alias("tokens")
    )
    kept = F.slice(F.col("tokens"), 1, max_len)
    attn = F.least(F.size("tokens"), F.lit(max_len))
    # array_repeat, NOT sequence+transform: Spark's sequence(1, n) infers
    # step -1 when n < 1 and yields [1, 0] instead of an empty pad
    pad = F.array_repeat(F.lit(pad_id), (F.lit(max_len) - attn).cast("int"))
    return d.select(
        "doc_id",
        attn.cast("int").alias("attn_len"),
        F.array_join(F.concat(kept, pad), ",").alias("padded_csv"),
    )


# --------------------------------------------------------------------------
# value_histogram — fixed-width histogram of the event value per type
# (the profiling companion to length_quantiles): floor-binning is pure
# arithmetic, the count is a partial-aggregating groupBy — the whole
# query is one shuffle of (type, bin) partial counts at any scale.
# --------------------------------------------------------------------------
_VALUE_HIST_SQL = """
SELECT event_type,
       CAST(floor(value / 10.0) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type, bin
"""


@_register("value_histogram", _VALUE_HIST_SQL)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / 10.0).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# bigram_counts — n-gram LM count table over the token streams (the
# count-aggregation step of classic LM smoothing pipelines): explode
# each sequence's adjacent token pairs map-side, partial-aggregate the
# counts, distributed top-50. Exact integers.
# --------------------------------------------------------------------------
_BIGRAM_SQL = f"""
WITH d AS (
    SELECT doc_id, {tokens_sql("doc_id", "doc_id")} AS tokens FROM documents
), b AS (
    SELECT tokens[i] AS t1, tokens[i + 1] AS t2
    FROM d CROSS JOIN generate_series(1, 64) g(i)
    WHERE i <= len(tokens) - 1
)
SELECT CAST(t1 AS INTEGER) AS t1, CAST(t2 AS INTEGER) AS t2,
       CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY t1, t2
ORDER BY cnt DESC, t1 ASC, t2 ASC LIMIT 50
"""


@_register("bigram_counts", _BIGRAM_SQL)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.functions.tokenizer import tokens_expr

    toks = tokens_expr(F.col("doc_id"), F.col("doc_id"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda i: F.struct(
            F.element_at(toks, i).alias("t1"),
            F.element_at(toks, i + 1).alias("t2"),
        ),
    )
    d = _t(spark, sf_dir, "documents").select(
        F.explode(pairs).alias("_p")
    ).where(F.col("_p.t2").isNotNull())
    return (
        d.groupBy(
            F.col("_p.t1").alias("t1"), F.col("_p.t2").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("cnt").desc(), F.col("t1").asc(), F.col("t2").asc()
        )
        .limit(50)
    )


# --------------------------------------------------------------------------
# 41f. split_assignment — deterministic train/val/test assignment by
# portable-hash permille bucket (operators/packing.assign_splits):
# membership is a pure function of the doc id, so eval sets survive
# corpus refreshes. Map-only.
# --------------------------------------------------------------------------
_SPLIT_SQL = """
SELECT doc_id,
       CASE
         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1000 < 10  THEN 'test'
         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1000 < 990 THEN 'train'
         ELSE 'val'
       END AS split
FROM documents
"""


@_register("split_assignment", _SPLIT_SQL)
def split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.packing import assign_splits

    return assign_splits(
        _t(spark, sf_dir, "documents").select("doc_id"),
        {"train": 980, "val": 10, "test": 10},
    )


# --------------------------------------------------------------------------
# 41d. scd2_history — SCD-type-2 validity intervals over the synthesized
# 5-version change log (operators/scd2.py): each version valid from its
# seq until the key's next seq (exclusive); open non-delete intervals are
# the LWW-current rows. The per-key lead() window partitions on the real
# doc key.
# --------------------------------------------------------------------------
_SCD2_SQL = f"""
WITH ev AS (
    SELECT
        'doc_' || CAST(d.doc_id AS VARCHAR)       AS doc_id,
        d.doc_id * 5 + t.k                        AS seq_no,
        CASE WHEN (d.doc_id * 3 + t.k) % 11 = 0
             THEN 'delete' ELSE 'update' END      AS op,
        {n_tok_sql("d.doc_id", "d.doc_id*5 + t.k")}  AS n_tok
    FROM documents d CROSS JOIN generate_series(1, 5) t(k)
)
SELECT doc_id, seq_no, op, n_tok,
       lead(seq_no) OVER (PARTITION BY doc_id ORDER BY seq_no)
           AS valid_to_seq,
       (lead(seq_no) OVER (PARTITION BY doc_id ORDER BY seq_no) IS NULL
        AND op <> 'delete') AS is_current
FROM ev
"""


@_register("scd2_history", _SCD2_SQL)
def scd2_history_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.functions.tokenizer import n_tok_expr
    from arango_etl_spark.operators.scd2 import scd2_history

    d = _t(spark, sf_dir, "documents").select("doc_id")
    ev = d.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(5))))
    seq = F.col("doc_id") * 5 + F.col("k")
    ev = ev.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias(
            "doc_id"
        ),
        seq.alias("seq_no"),
        F.when(
            F.pmod(F.col("doc_id") * 3 + F.col("k"), F.lit(11)) == 0,
            "delete",
        ).otherwise(F.lit("update")).alias("op"),
        n_tok_expr(F.col("doc_id"), seq).alias("n_tok"),
    )
    return scd2_history(ev)


# --------------------------------------------------------------------------
# 41e. snapshot_diff_states — change-data-feed GENERATION: the per-key
# insert/update/delete delta between two LWW-final states of the same
# log (versions 1-3 vs all 5) via one null-safe full-outer key join
# (operators/scd2.snapshot_diff). Unchanged keys drop out.
# --------------------------------------------------------------------------
_DIFF_SQL = f"""
WITH ev AS (
    SELECT
        'doc_' || CAST(d.doc_id AS VARCHAR)       AS doc_id,
        d.doc_id * 5 + t.k                        AS seq_no,
        CASE WHEN (d.doc_id * 3 + t.k) % 11 = 0
             THEN 'delete' ELSE 'update' END      AS op,
        {tokens_sql("d.doc_id", "d.doc_id*5 + t.k")} AS tokens,
        {n_tok_sql("d.doc_id", "d.doc_id*5 + t.k")}  AS n_tok
    FROM documents d CROSS JOIN generate_series(1, 5) t(k)
), old_state AS (
    SELECT doc_id, array_to_string(tokens, ',') AS tokens_csv, n_tok
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY seq_no DESC
        ) AS rn FROM ev WHERE seq_no % 5 IN (1, 2, 3)
    ) WHERE rn = 1 AND op <> 'delete'
), new_state AS (
    SELECT doc_id, array_to_string(tokens, ',') AS tokens_csv, n_tok
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY seq_no DESC
        ) AS rn FROM ev
    ) WHERE rn = 1 AND op <> 'delete'
)
SELECT doc_id, change_type FROM (
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'insert'
                WHEN n.doc_id IS NULL THEN 'delete'
                WHEN (o.tokens_csv IS DISTINCT FROM n.tokens_csv)
                  OR (o.n_tok IS DISTINCT FROM n.n_tok) THEN 'update'
           END AS change_type
    FROM old_state o FULL OUTER JOIN new_state n ON o.doc_id = n.doc_id
) WHERE change_type IS NOT NULL
"""


@_register("snapshot_diff_states", _DIFF_SQL)
def snapshot_diff_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.functions.tokenizer import n_tok_expr, tokens_expr
    from arango_etl_spark.operators.scd2 import snapshot_diff

    d = _t(spark, sf_dir, "documents").select("doc_id")
    ev = d.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(5))))
    seq = F.col("doc_id") * 5 + F.col("k")
    # keep the string key under a DISTINCT name while the numeric doc_id
    # is still referenced: shadowing it here and full-outer-SELF-joining
    # downstream lets Spark's self-join attribute dedup rebind the
    # numeric reference to the string column (runtime CAST error)
    ev = ev.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias(
            "doc_key"
        ),
        seq.alias("seq_no"),
        F.col("k"),
        F.when(
            F.pmod(F.col("doc_id") * 3 + F.col("k"), F.lit(11)) == 0,
            "delete",
        ).otherwise(F.lit("update")).alias("op"),
        F.array_join(
            tokens_expr(F.col("doc_id"), seq), ","
        ).alias("tokens_csv"),
        n_tok_expr(F.col("doc_id"), seq).alias("n_tok"),
    )

    def final_state(events: DataFrame) -> DataFrame:
        w = Window.partitionBy("doc_key").orderBy(F.col("seq_no").desc())
        return (
            events.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col("op") != "delete"))
            .select("doc_key", "tokens_csv", "n_tok")
        )

    return snapshot_diff(
        final_state(ev.where(F.col("k") <= 3)),
        final_state(ev),
        key_col="doc_key",
        compare_cols=["tokens_csv", "n_tok"],
    ).select(F.col("doc_key").alias("doc_id"), "change_type")


# --------------------------------------------------------------------------
# 41c. length_quantiles — per-source document-length distribution (the
# corpus-profiling step before setting curation thresholds). EXACT
# percentiles: Spark's `percentile` and DuckDB's `quantile_cont` both
# compute the same linear-interpolation definition in doubles, so the
# values agree bit-for-bit on integer inputs (unlike approx_percentile /
# t-digest, which is engine-specific and would never hash-match). At
# 100 TB swap in approx_percentile — exact percentile needs a per-group
# sort; the parity pair pins the exact semantics.
# --------------------------------------------------------------------------
_QUANTILES_SQL = """
SELECT source,
       round(quantile_cont(len(text), 0.25), 6) AS p25,
       round(quantile_cont(len(text), 0.50), 6) AS p50,
       round(quantile_cont(len(text), 0.75), 6) AS p75,
       round(quantile_cont(len(text), 0.95), 6) AS p95,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source
"""


@_register("length_quantiles", _QUANTILES_SQL)
def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "source", F.length("text").alias("_len")
    )
    return d.groupBy("source").agg(
        F.round(F.expr("percentile(_len, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(_len, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(_len, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(_len, 0.95)"), 6).alias("p95"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# --------------------------------------------------------------------------
# 42. redact_pii_docs — pre-training PII scrub (emails/URLs/phones →
# placeholder tokens) + per-doc redaction count (operators/text.py;
# lookaround-free patterns run identically under Java regex and RE2).
# --------------------------------------------------------------------------
def _pii_sql() -> str:
    from arango_etl_spark.operators.text import PII_PATTERNS

    lines, counts = [], []
    for i, (pat, token) in enumerate(PII_PATTERNS.values(), start=1):
        carried = "".join(f", c{j}" for j in range(1, i))
        lines.append(
            f", s{i} AS (SELECT doc_id"
            f", len(regexp_split_to_array(t{i-1}, '{pat}')) - 1 AS c{i}"
            f", regexp_replace(t{i-1}, '{pat}', '{token}', 'g') AS t{i}"
            f"{carried} FROM s{i-1})"
        )
        counts.append(f"c{i}")
    n = len(counts)
    return (
        "WITH s0 AS (SELECT doc_id, text AS t0 FROM documents)"
        + "".join(lines)
        + f" SELECT doc_id, t{n} AS clean_text,"
          f" CAST({' + '.join(counts)} AS BIGINT) AS n_redactions FROM s{n}"
    )


@_register("redact_pii_docs", _pii_sql())
def redact_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.text import redact_pii

    return redact_pii(_t(spark, sf_dir, "documents")).select(
        "doc_id", "clean_text", "n_redactions"
    )


# --------------------------------------------------------------------------
# 43. contamination_check — benchmark decontamination: flag training docs
# sharing word n-grams with a (simulated) eval set = docs with
# doc_id % 20 == 0 (operators/dedup.py contamination_flags; the standard
# exact n-gram-overlap test, benchmark side broadcast).
# --------------------------------------------------------------------------
_CONTAM_SQL = r"""
WITH ws AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '') AS w
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(0, greatest(len(w) - 3, 0)),
                   i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
        FROM ws)
    WHERE shingle <> ''
), bench AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0
), hits AS (
    SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
    FROM sh JOIN bench USING (shingle)
    GROUP BY sh.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shared_ngrams, 0) AS n_shared_ngrams,
       COALESCE(h.n_shared_ngrams, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
"""


@_register("contamination_check", _CONTAM_SQL)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.dedup import contamination_flags

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.pmod("doc_id", F.lit(20)) == 0)
    return contamination_flags(docs, bench, ngram=3, min_overlap=1)


# --------------------------------------------------------------------------
# 20b/20c. Join-heavy analytics parity (TPC-H Q3/Q10 shapes): 3- and
# 4-table join trees with selective filters — exercises Catalyst's join
# reordering, broadcast of the nation dim, partial aggregation, and
# filter pushdown (plan-asserted in tests/test_plans.py). LIMIT rows are
# fully tie-broken (unique key last) so both engines select the same set.
# --------------------------------------------------------------------------
_Q3_SQL = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
"""


@_register("q3_shipping_priority", _Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


_Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


@_register("q10_returned_items", _Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")  # tiny dim → broadcast explicitly
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# q5_local_supplier_volume — TPC-H Q5: 6-table join tree (customer ⋈
# orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) with the classic
# same-nation customer/supplier equi-condition. Exercises join ordering
# over two tiny broadcast dims + three fact-side joins and a final
# one-row-per-nation aggregate.
# --------------------------------------------------------------------------
_Q5_SQL = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@_register("q5_local_supplier_volume", _Q5_SQL)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # region/nation are tiny → broadcast; the supplier dim is small at
    # every sf (suppliers ≪ lineitems) → broadcast too, so the only
    # shuffles are the two fact-side hash joins + the final 1-row-per-
    # nation aggregate (partial map-side).
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# 48. curated_training_set — the END-TO-END curation pipeline
# (operators/pipeline.py curate_training_set): quality gate → near-dup
# cluster representative → benchmark decontamination → mixture sample,
# composed into ONE oracle (the recursive clusters closure and the
# contamination join share the same shingle CTEs), so the driver gate
# verifies the pipeline composition, not just its stages.
# --------------------------------------------------------------------------
_CURATE_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES}, pairs AS (
    SELECT m1.doc_id AS doc_a, m2.doc_id AS doc_b
    FROM mem m1
    JOIN mem m2 ON m1.b = m2.b AND m1.band_hash = m2.band_hash
               AND m1.doc_id < m2.doc_id
    GROUP BY m1.doc_id, m2.doc_id
), cedges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), reach(a, b) AS (
    SELECT a, b FROM cedges
    UNION
    SELECT r.a, e.b FROM reach r JOIN cedges e ON r.b = e.a
), comp AS (
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
), bench AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0
), contam AS (
    -- substantial overlap only (>= 5 shared 3-grams): single shared
    -- grams are vocabulary noise at scale, not eval leakage
    SELECT sh.doc_id FROM sh JOIN bench USING (shingle)
    GROUP BY sh.doc_id HAVING count(*) >= 5
)
SELECT d.doc_id, d.source,
       CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) AS shuffle_key
FROM documents d
LEFT JOIN comp c ON c.doc_id = d.doc_id
LEFT JOIN contam ct ON ct.doc_id = d.doc_id
WHERE coalesce(c.cluster_id, d.doc_id) = d.doc_id
  AND ct.doc_id IS NULL
  AND length(d.text) >= 100
  AND CAST(length(regexp_replace(d.text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      / length(d.text) >= 0.81
  AND CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % 1000 < CASE WHEN CAST(substr(d.source, 4) AS INTEGER) % 2 = 0
                    THEN 1000 ELSE 500 END
"""


@_register("curated_training_set", _CURATE_SQL)
def curated_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.pipeline import curate_training_set

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.pmod("doc_id", F.lit(20)) == 0)
    weights = {f"src{i}": (1000 if i % 2 == 0 else 500) for i in range(20)}
    return curate_training_set(docs, bench, weights, min_overlap=5)


# --------------------------------------------------------------------------
# 50b. rollup_incremental — the incrementally-maintained continuous
# aggregate (streaming/rollup.py): replay the same 5-version change log
# as cdc_engine_replay through maintain_rollup (per-batch delta +
# retraction via snapshot time travel), then return the ROLLUP table.
# The oracle is the declarative groupBy over the final LWW state — the
# incremental path must land on exactly the same numbers after updates
# AND deletes.
# --------------------------------------------------------------------------
_ROLLUP_INC_SQL = f"""
WITH ev AS (
    SELECT
        'doc_' || CAST(d.doc_id AS VARCHAR)       AS doc_id,
        d.doc_id * 5 + t.k                        AS seq_no,
        CASE WHEN (d.doc_id * 3 + t.k) % 11 = 0
             THEN 'delete' ELSE 'update' END      AS op,
        {n_tok_sql("d.doc_id", "d.doc_id*5 + t.k")}  AS n_tok,
        d.source                                  AS source
    FROM documents d CROSS JOIN generate_series(1, 5) t(k)
), ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY seq_no DESC
    ) AS rn FROM ev
), final AS (
    SELECT * FROM ranked WHERE rn = 1 AND op <> 'delete'
)
SELECT source, CAST(count(*) AS BIGINT) AS cnt,
       CAST(coalesce(sum(CAST(n_tok AS DOUBLE)), 0.0) AS DOUBLE) AS total
FROM final GROUP BY source
"""


@_register("rollup_incremental", _ROLLUP_INC_SQL)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from arango_etl_spark.functions.tokenizer import n_tok_expr, tokens_expr
    from arango_etl_spark.plans.lakehouse import SnapshotTable
    from arango_etl_spark.streaming.rollup import (
        create_rollup_table,
        maintain_rollup,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    ev = d.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(5))))
    seq = F.col("doc_id") * 5 + F.col("k")
    ev = ev.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_key"),
        seq.alias("seq_no"),
        F.when(
            F.pmod(F.col("doc_id") * 3 + F.col("k"), F.lit(11)) == 0, "delete"
        ).otherwise(F.lit("update")).alias("op"),
        tokens_expr(F.col("doc_id"), seq).alias("tokens"),
        n_tok_expr(F.col("doc_id"), seq).alias("n_tok"),
        F.col("source"),
        (F.col("k") - 1).cast("long").alias("batch_id"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("event_ts"),
    ).withColumnRenamed("doc_key", "doc_id")
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="parity_rollup_")
    base = SnapshotTable.create(work + "/base", payload, n_buckets=16)
    rollup = create_rollup_table(work + "/rollup", "source", T.StringType())
    for b in range(5):
        maintain_rollup(
            spark, base, rollup, ev.where(F.col("batch_id") == b),
            batch_id=b, group_col="source", measure_col="n_tok",
            compact_every=0,
        )
    return rollup.read(spark).select(
        "source", F.col("cnt"), F.col("total")
    )


# --------------------------------------------------------------------------
# 51. kmv_distinct_users — deterministic KMV distinct-count sketch
# (operators/sketches.py): per event_type, estimate the distinct user
# count from the k=64 smallest portable hashes. The oracle reproduces
# the SKETCH MATH (hash, rank, (k-1)*P // h_k), not just the answer —
# estimates are bit-identical across engines. ~150 true distinct users
# per type at every sf > 0.001, so the estimation (not exact-count)
# path is exercised.
# --------------------------------------------------------------------------
_KMV_SQL = """
WITH h AS (
    SELECT DISTINCT event_type,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 9007199254740881 AS hv
    FROM events
), ranked AS (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM h
), agg AS (
    SELECT event_type, count(*) AS n, max(hv) AS kth
    FROM ranked WHERE rn <= 64 GROUP BY event_type
)
SELECT event_type,
       CAST(CASE WHEN n < 64 THEN n
                 ELSE (63 * CAST(9007199254740881 AS BIGINT)) // kth
            END AS BIGINT) AS n_distinct_est
FROM agg
"""


@_register("kmv_distinct_users", _KMV_SQL)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.sketches import kmv_distinct_count

    ev = _t(spark, sf_dir, "events")
    return kmv_distinct_count(ev, "user_id", ["event_type"], k=64)


# --------------------------------------------------------------------------
# 52. cms_token_counts — count-min frequency sketch
# (operators/sketches.py): build a depth=4 × width=512 CMS over the
# documents word stream (cell table shuffles <= 2048 rows no matter the
# corpus size), then probe the 10 most frequent words. width=512 forces
# real collisions, so est_count > exact_count for some probes — and the
# oracle reproduces the identical overestimates (same md5-affine rows,
# same buckets).
# --------------------------------------------------------------------------
_CMS_SQL = """
WITH words AS (
    SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
    FROM documents
), base AS (
    SELECT word,
        CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT)
          % 9007199254740881 AS hv
    FROM words
), dims AS (
    SELECT unnest(generate_series(0, 3)) AS d
), cells AS (
    SELECT dims.d AS row,
           ((base.hv * (2*dims.d + 3) + dims.d*1000003 + 12289)
             % 9007199254740881) % 512 AS bucket,
           count(*) AS cnt
    FROM base CROSS JOIN dims
    GROUP BY 1, 2
), top AS (
    SELECT word, CAST(count(*) AS BIGINT) AS exact_count
    FROM words GROUP BY word
    ORDER BY exact_count DESC, word ASC LIMIT 10
), probe AS (
    SELECT t.word, t.exact_count, dims.d AS row,
           ((CAST(('0x' || substr(md5(t.word), 1, 15)) AS BIGINT)
               % 9007199254740881 * (2*dims.d + 3)
             + dims.d*1000003 + 12289) % 9007199254740881) % 512 AS bucket
    FROM top t CROSS JOIN dims
)
SELECT p.word, p.exact_count,
       CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est_count
FROM probe p LEFT JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
GROUP BY p.word, p.exact_count
"""


@_register("cms_token_counts", _CMS_SQL)
def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.sketches import cms_build, cms_query

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("word")
    )
    sketch = cms_build(words, "word", depth=4, width=512)
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("word"))
        .limit(10)
    )
    est = cms_query(sketch, top, "word", depth=4, width=512)
    return top.join(est, "word").select("word", "exact_count", "est_count")


# --------------------------------------------------------------------------
# 53. q6_forecast_revenue — TPC-H Q6 shape: the pure scan-aggregate with
# every predicate PUSHED to the parquet scan (shipdate window + discount
# band + quantity cap) — zero joins, zero shuffles beyond the final
# 1-row partial-agg merge; the canonical predicate-pushdown showcase
# (plan-asserted in test_plans.py).
# --------------------------------------------------------------------------
_Q6_SQL = """
SELECT round(coalesce(sum(l_extendedprice * l_discount), 0.0), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


@_register("q6_forecast_revenue", _Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.col("l_extendedprice") * F.col("l_discount")),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# 54. q14_promo_revenue — TPC-H Q14 shape: lineitem × part equi-join
# (part broadcast — the dim side), conditional aggregation for the promo
# revenue share over one shipdate month window.
# --------------------------------------------------------------------------
_Q14_SQL = """
SELECT round(
         100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0.0 END)
         / sum(l.l_extendedprice * (1 - l.l_discount)), 4
       ) AS promo_revenue_pct,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@_register("q14_promo_revenue", _Q14_SQL)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# 55. q7_volume_shipping — TPC-H Q7 shape: the 6-relation tree with the
# nation dim joined TWICE under different roles (supplier nation /
# customer nation) and a symmetric two-nation predicate; per-year
# revenue between the pair. Exercises dual-alias broadcast of one dim.
# --------------------------------------------------------------------------
_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders   o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation  n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation  n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@_register("q7_volume_shipping", _Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sup = _t(spark, sf_dir, "supplier")
    cus = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    joined = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cus), orders["o_custkey"] == cus["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_3")
             & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7")
               & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            # DuckDB year() is BIGINT — match widths for the value hash
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                ),
                2,
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# 56. q4_order_priority — TPC-H Q4 shape: EXISTS-correlated semi-join
# (orders with at least one lineitem shipped after the order date) +
# priority histogram. Catalyst rewrites the existence predicate to a
# LEFT SEMI hash join with the non-equi conjunct evaluated inside the
# join — no correlated per-row subquery execution survives.
# (Adapted: testdata has no l_commitdate/l_receiptdate, so "late" is
# l_shipdate > o_orderdate; reference scan-filter family
# /root/reference/src/s3.rs:113-149.)
# --------------------------------------------------------------------------
_Q4_SQL = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
"""


@_register("q4_order_priority", _Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"]),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


# --------------------------------------------------------------------------
# 57. q8_market_share — TPC-H Q8 shape: the widest join tree in the suite
# (lineitem × part × supplier × orders × customer × nation×2 × region,
# 8 relations) with a conditional-share aggregate: NATION_3 suppliers'
# fraction of PROMO-part revenue sold to ASIA customers, per order year.
# Every dim side is broadcast; lineitem is the only shuffled relation.
# --------------------------------------------------------------------------
_Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END)
             / sum(volume), 4) AS mkt_share
FROM (
    SELECT year(o.o_orderdate)                    AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n2.n_name                              AS nation
    FROM lineitem l
    JOIN part     p  ON p.p_partkey   = l.l_partkey
    JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
    JOIN orders   o  ON o.o_orderkey  = l.l_orderkey
    JOIN customer c  ON c.c_custkey   = o.o_custkey
    JOIN nation   n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region   r  ON r.r_regionkey  = n1.n_regionkey
    JOIN nation   n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@_register("q8_market_share", _Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cus = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cus), orders["o_custkey"] == cus["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(region), F.col("n1_region") == region["r_regionkey"]
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    return (
        joined.groupBy(
            F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", volume).otherwise(
                        0.0
                    )
                )
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# 58. q13_customer_distribution — TPC-H Q13 shape: LEFT OUTER join with a
# predicate on the NULL-producing side (only non-urgent orders count),
# then a two-level aggregation: orders per customer → customers per
# order-count. Customers with zero qualifying orders must survive with
# c_count = 0 — the outer join is load-bearing, not decoration.
# --------------------------------------------------------------------------
_Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@_register("q13_customer_distribution", _Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cus = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cus.join(orders, cus["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# --------------------------------------------------------------------------
# 59. q15_top_supplier — TPC-H Q15 shape: an aggregate view (quarterly
# revenue per supplier) reused twice — once for the rows, once for the
# scalar max — joined back to the supplier dim. The scalar side is a
# 1-row broadcast, NOT a driver collect; rounding to cents on BOTH
# engines before the equality makes the max-match portable.
# --------------------------------------------------------------------------
_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@_register("q15_top_supplier", _Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                ),
                2,
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["_mx"])
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# 60. q17_small_quantity — TPC-H Q17 shape: a per-key correlated scalar
# subquery (each lineitem compared to HALF the average quantity of ITS
# part) decorrelated into a partial-aggregated self-join — the classic
# "aggregate once, join back" rewrite. Quantities are integer-valued
# doubles, so avg() is exact in both engines and the < compare is
# portable. (Adapted: 0.5×avg and brand-only filter — no container
# column in testdata.)
# --------------------------------------------------------------------------
_Q17_SQL = """
SELECT round(coalesce(sum(l.l_extendedprice), 0.0) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@_register("q17_small_quantity", _Q17_SQL)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    # decorrelated: per-part threshold aggregated once, joined back
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# 61. q19_disjunctive_pushdown — TPC-H Q19 shape: a disjunction of
# conjunctive bands spanning BOTH join sides. Catalyst factors the
# common l_partkey = p_partkey equi-key out of the OR (the join stays a
# hash join, not a nested loop) and pushes the derivable per-side
# residuals (brand ∈ {...}, quantity ≤ 30) below the join.
# --------------------------------------------------------------------------
_Q19_SQL = """
SELECT round(coalesce(sum(l.l_extendedprice * (1 - l.l_discount)), 0.0), 2)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@_register("q19_disjunctive_pushdown", _Q19_SQL)
def q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .where(band)
        .agg(
            F.round(
                F.coalesce(
                    F.sum(
                        F.col("l_extendedprice")
                        * (F.lit(1) - F.col("l_discount"))
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# 62. q21_sole_returner — TPC-H Q21 shape: the double-correlated
# existence test (EXISTS another supplier in the order, NOT EXISTS
# another supplier who ALSO returned) expressed as a LEFT SEMI then
# LEFT ANTI self-join of lineitem — the join-based decorrelation Spark
# and the reference's done-file scans both rely on. (Adapted: "kept
# waiting" = sole R-returnflag supplier in a multi-supplier F order —
# no receipt/commit dates in testdata.)
# --------------------------------------------------------------------------
_Q21_SQL = """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey  = l1.l_suppkey
JOIN orders   o  ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
"""


@_register("q21_sole_returner", _Q21_SQL)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.where(F.col("l_returnflag") == "R")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(orders, sole["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(sup), sole["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


# --------------------------------------------------------------------------
# 63. q22_dormant_customers — TPC-H Q22 shape: a global scalar aggregate
# subquery (average positive balance, rounded identically on both
# engines to make the > compare portable) broadcast against every
# customer, plus a NOT EXISTS anti-join to orders; per-segment counts
# of rich-but-dormant customers. (Adapted: c_mktsegment stands in for
# the phone country code — no c_phone in testdata — and dormancy is a
# DATE-WINDOWED NOT EXISTS (no order since 1999) because every testdata
# customer has some order; the pushed-down date filter keeps the
# anti-join's build side small.)
# --------------------------------------------------------------------------
_Q22_SQL = """
WITH avg_bal AS (
    SELECT round(avg(c_acctbal), 4) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY c.c_mktsegment
"""


@_register("q22_dormant_customers", _Q22_SQL)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cus = _t(spark, sf_dir, "customer")
    avg_bal = cus.where(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("_a")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        cus.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_a"))
        .join(orders, cus["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# 64. quantize_embeddings — int8 symmetric quantization of the embedding
# column (operators/similarity.quantize_embeddings): map-only, cast to
# double before ALL arithmetic so both engines run identical IEEE ops.
# --------------------------------------------------------------------------
_QUANT_SQL = """
WITH v AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
    FROM embeddings
), s AS (
    SELECT vec_id, vd,
           greatest(list_max(list_transform(vd, x -> abs(x))) / 127.0,
                    1e-30) AS sc
    FROM v
)
SELECT vec_id,
       sc AS q_scale,
       list_transform(vd, x -> CAST(round(x / sc) AS INTEGER)) AS qvec
FROM s
"""


@_register("quantize_embeddings", _QUANT_SQL)
def quantize_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.similarity import quantize_embeddings

    return quantize_embeddings(_t(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# 65. unigram_logprob_quality — corpus-unigram LM quality scoring
# (operators/text.unigram_logprob, CCNet-style filtering signal). The
# per-doc mean is a short double sum → rounded to 4dp for portability.
# --------------------------------------------------------------------------
_UNIGRAM_SQL = """
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS tok
    FROM documents
), counts AS (
    SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), total AS (
    SELECT sum(cnt) AS tot FROM counts
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       round(avg(-log2(CAST(c.cnt AS DOUBLE) / tot)), 4) AS mean_nll
FROM toks t JOIN counts c USING (tok) CROSS JOIN total
GROUP BY t.doc_id
"""


@_register("unigram_logprob_quality", _UNIGRAM_SQL)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.text import unigram_logprob

    scored = unigram_logprob(_t(spark, sf_dir, "documents"))
    return scored.select(
        "doc_id", "n_tok", F.round("mean_nll", 4).alias("mean_nll")
    )


# --------------------------------------------------------------------------
# 66. source_overlap_matrix — cross-source corpus overlap via shared
# distinct 5-gram shingles + containment ratio (operators/dedup.
# source_overlap): the dedup-order planning signal for multi-source
# training corpora. Shingle definition mirrors the minhash oracle CTE.
# --------------------------------------------------------------------------
_OVERLAP_SQL = r"""
WITH ws AS (
    SELECT source,
           list_filter(regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '') AS w
    FROM documents
), sh AS (
    SELECT DISTINCT source, shingle FROM (
        SELECT source,
               unnest(list_transform(
                   generate_series(0, greatest(len(w) - 5, 0)),
                   i -> array_to_string(w[i+1:i+5], ' '))) AS shingle
        FROM ws)
    WHERE shingle <> ''
), sizes AS (
    SELECT source, count(*) AS n FROM sh GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS shared_shingles,
       round(count(*) / least(min(sa.n), min(sb.n)), 4) AS containment
FROM sh a
JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
JOIN sizes sa ON sa.source = a.source
JOIN sizes sb ON sb.source = b.source
GROUP BY a.source, b.source
"""


@_register("source_overlap_matrix", _OVERLAP_SQL)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.dedup import source_overlap

    return source_overlap(_t(spark, sf_dir, "documents"), ngram=5)


# --------------------------------------------------------------------------
# 67. q2_min_cost_supplier — TPC-H Q2 shape: the correlated MIN subquery
# ("the supplier offering this part at the region's minimum price")
# decorrelated into aggregate-then-equality-rejoin. (Adapted: no
# partsupp — the offer relation is avg sale price per (part, supplier)
# derived from lineitem; rounded to cents BEFORE the min/equality so
# both engines compare identical values.)
# --------------------------------------------------------------------------
_Q2_SQL = """
WITH offers AS (
    SELECT l_partkey AS p_key, l_suppkey AS s_key,
           round(avg(l_extendedprice), 2) AS offer_price
    FROM lineitem GROUP BY l_partkey, l_suppkey
), regional AS (
    SELECT o.p_key, o.offer_price, s.s_name, s.s_acctbal, n.n_name
    FROM offers o
    JOIN supplier s ON s.s_suppkey  = o.s_key
    JOIN nation   n ON n.n_nationkey = s.s_nationkey
    JOIN region   r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
), best AS (
    SELECT p_key, min(offer_price) AS min_price FROM regional GROUP BY p_key
)
SELECT p.p_partkey, p.p_name, reg.s_name, reg.n_name,
       reg.offer_price AS min_price, reg.s_acctbal
FROM regional reg
JOIN best b ON b.p_key = reg.p_key AND reg.offer_price = b.min_price
JOIN part p ON p.p_partkey = reg.p_key
WHERE p.p_size = 15 AND p.p_type = 'PROMO'
"""


@_register("q2_min_cost_supplier", _Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    offers = li.groupBy(
        F.col("l_partkey").alias("p_key"), F.col("l_suppkey").alias("s_key")
    ).agg(F.round(F.avg("l_extendedprice"), 2).alias("offer_price"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    regional = (
        offers.join(F.broadcast(sup), F.col("s_key") == sup["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
        .select("p_key", "offer_price", "s_name", "s_acctbal", "n_name")
    )
    best = regional.groupBy("p_key").agg(
        F.min("offer_price").alias("min_price")
    ).withColumnRenamed("p_key", "b_key")
    return (
        regional.join(
            best,
            (F.col("p_key") == F.col("b_key"))
            & (F.col("offer_price") == F.col("min_price")),
        )
        .join(F.broadcast(part), F.col("p_key") == part["p_partkey"])
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("offer_price").alias("min_price"), "s_acctbal",
        )
    )


# --------------------------------------------------------------------------
# 68. q9_product_type_profit — TPC-H Q9 shape: name-pattern part filter
# through a 6-relation tree, profit per (supplier nation, order year).
# (Adapted: no ps_supplycost — cost stand-in is 0.5 × p_retailprice ×
# quantity, keeping the two-sided profit expression.)
# Profit is accumulated in EXACT INT64 units of 1e-4 dollars —
# ext_cents×(100−disc_pct) − 50×rp_cents×qty — because a double sum of
# this many signed products is summation-order-sensitive: at sf0.1 the
# Spark partial-agg order vs DuckDB's single-threaded order drifted past
# the 2-dp rounding boundary (caught by the cross-scale sweep). Same
# integer-exactness design as q11. The one double op (÷1e4, round) runs
# on identical integers on both engines.
# --------------------------------------------------------------------------
_Q9_SQL = """
SELECT nation, o_year, round(sum(amount_e4) / 10000.0, 2) AS sum_profit
FROM (
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * CAST(100 - round(l.l_discount * 100) AS BIGINT)
             - 50 * CAST(round(p.p_retailprice * 100) AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT) AS amount_e4
    FROM lineitem l
    JOIN part     p ON p.p_partkey   = l.l_partkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN orders   o ON o.o_orderkey  = l.l_orderkey
    JOIN nation   n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
"""


@_register("q9_product_type_profit", _Q9_SQL)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    # exact int64 units of 1e-4 dollars (see _Q9_SQL note); summed as
    # decimal(38,0) so the partial aggregate can never overflow at scale
    amount_e4 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long"))
        - F.lit(50)
        * F.round(F.col("p_retailprice") * 100, 0).cast("long")
        * F.col("l_quantity").cast("long")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(amount_e4.cast("decimal(38,0)")) / F.lit(10000.0), 2
            ).alias("sum_profit")
        )
    )


# --------------------------------------------------------------------------
# 69. q11_important_stock — TPC-H Q11 shape: per-part value within one
# nation, kept only when above a FRACTION of the nation's total (the
# HAVING-against-global-scalar pattern). Values are computed in INTEGER
# CENTS (bigint) so the fraction compare (value × 1000 > total) is
# exact on both engines — no floating-point boundary flake by design.
# --------------------------------------------------------------------------
_Q11_SQL = """
WITH stock AS (
    SELECT l.l_partkey,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * CAST(l.l_quantity AS BIGINT)) AS value_cents
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN nation   n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_5'
    GROUP BY l.l_partkey
), total AS (
    SELECT sum(value_cents) AS tot FROM stock
)
SELECT l_partkey, value_cents
FROM stock, total
WHERE value_cents * 1000 > tot
"""


@_register("q11_important_stock", _Q11_SQL)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    cents = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
    )
    stock = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = stock.agg(F.sum("value_cents").alias("_tot"))
    return (
        stock.join(F.broadcast(total))
        .where(F.col("value_cents") * 1000 > F.col("_tot"))
        .select("l_partkey", "value_cents")
    )


# --------------------------------------------------------------------------
# 70. q12_shipmode_priority — TPC-H Q12 shape: orders × lineitem join
# with dual conditional counts per category. (Adapted: l_returnflag
# stands in for l_shipmode — no shipmode/commitdate in testdata.)
# --------------------------------------------------------------------------
_Q12_SQL = """
SELECT l.l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_returnflag
"""


@_register("q12_shipmode_priority", _Q12_SQL)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0))
            .cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# 71. q16_supplier_count — TPC-H Q16 shape: supplier diversity per part
# attribute triple, with a NOT-IN supplier blacklist (anti-join) and a
# COUNT DISTINCT. (Adapted: lineitem is the part↔supplier bridge — no
# partsupp; the blacklist is negative-balance suppliers — no comment
# column to pattern-match.)
# --------------------------------------------------------------------------
_Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@_register("q16_supplier_count", _Q16_SQL)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    blacklist = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(blacklist),
            li["l_suppkey"] == blacklist["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# 72. q20_excess_suppliers — TPC-H Q20 shape: the nested IN-subquery
# chain (suppliers ⟵ heavy shipments ⟵ pattern-matched parts) as a
# semi-join over an aggregate with HAVING. Quantity sums are
# integer-valued doubles — exact in both engines, so the > 50 compare
# is portable. (Adapted: "excess stock" = shipped more than 50 units
# of one bolt part in 1996 — no partsupp availqty.)
# --------------------------------------------------------------------------
_Q20_SQL = """
SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
    )
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > 50
)
"""


@_register("q20_excess_suppliers", _Q20_SQL)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    bolt_parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    heavy = (
        li.join(
            F.broadcast(bolt_parts),
            li["l_partkey"] == bolt_parts["p_partkey"],
            "leftsemi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 50)
        .select("l_suppkey")
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.join(heavy, sup["s_suppkey"] == heavy["l_suppkey"], "leftsemi")
        .select(
            "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal")
        )
    )


# --------------------------------------------------------------------------
# 91. hll_distinct_users — deterministic HyperLogLog cardinality sketch
# (operators/sketches.py): per event_type, m=32 registers over the
# portable 60-bit md5 hash. The oracle reproduces the REGISTER MATH —
# bucket = low 5 bits, rho = 1 + leading zeros via length(bin(w)) (both
# engines strip leading zeros), register sum as EXACT int64
# (2^(40-rho) terms) — so v_zero and reg_sum hash-match as integers and
# the single double division / ln is IEEE-identical. Third sketch
# family next to KMV (order statistics) and count-min (frequency):
# HLL is the mergeable fixed-size register form (5 KB at p=12 covers
# 1e9 distinct — the shape object-store table stats actually use).
# --------------------------------------------------------------------------
_HLL_SQL = """
WITH h AS (
    SELECT event_type,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
          AS hv
    FROM events
), rho AS (
    SELECT event_type, hv & 31 AS bucket,
           CASE WHEN (hv >> 5) = 0 THEN 56
                ELSE 56 - length(bin(hv >> 5)) END AS r
    FROM h
), regs AS (
    SELECT event_type, bucket, max(r) AS mj
    FROM rho GROUP BY event_type, bucket
), agg AS (
    SELECT event_type,
           CAST(32 - count(*) AS INTEGER) AS v_zero,
           CAST(sum(CAST(1 AS BIGINT) << (40 - least(mj, 40)))
                + (32 - count(*)) * (CAST(1 AS BIGINT) << 40)
                AS BIGINT) AS reg_sum
    FROM regs GROUP BY event_type
)
SELECT event_type, v_zero, reg_sum,
       round(CASE WHEN 784752235069308.9 / reg_sum <= 80.0 AND v_zero > 0
                  THEN 32.0 * ln(32.0 / v_zero)
                  ELSE 784752235069308.9 / reg_sum END, 2) AS n_distinct_est
FROM agg
"""


@_register("hll_distinct_users", _HLL_SQL)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.sketches import hll_distinct_count

    ev = _t(spark, sf_dir, "events")
    return hll_distinct_count(ev, "user_id", ["event_type"], p=5)


# --------------------------------------------------------------------------
# 92. cdc_change_feed — the ENGINE's change-data-feed read under the
# oracle gate: replay the deterministic 5-version feed in two phases
# (batches k<=3, then k=4..5) through the real MoR merge path, then
# SnapshotTable.read_changes between the two committed snapshots. The
# oracle computes the same diff declaratively: LWW state at k<=3
# full-outer-joined with final state → insert (re-appeared after a
# phase-1 delete), update (payload changed), delete (phase-2 tombstone);
# after-image columns from the final state (null for deletes). Every
# change type is exercised at every sf by the (3d+k) % 11 delete rule.
# --------------------------------------------------------------------------
_CDC_CDF_SQL = f"""
WITH ev AS (
    SELECT
        'doc_' || CAST(d.doc_id AS VARCHAR)       AS doc_id,
        d.doc_id * 5 + t.k                        AS seq_no,
        t.k                                       AS k,
        CASE WHEN (d.doc_id * 3 + t.k) % 11 = 0
             THEN 'delete' ELSE 'update' END      AS op,
        {{tokens}} AS tokens,
        {{n_tok}}  AS n_tok,
        d.source                                  AS source
    FROM documents d CROSS JOIN generate_series(1, 5) t(k)
), r1 AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY seq_no DESC
    ) AS rn FROM ev WHERE k <= 3
), s1 AS (
    SELECT doc_id, array_to_string(tokens, ',') AS tokens_csv, n_tok, source
    FROM r1 WHERE rn = 1 AND op <> 'delete'
), r2 AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY seq_no DESC
    ) AS rn FROM ev
), s2 AS (
    SELECT doc_id, array_to_string(tokens, ',') AS tokens_csv, n_tok, source
    FROM r2 WHERE rn = 1 AND op <> 'delete'
)
SELECT
    coalesce(s2.doc_id, s1.doc_id) AS doc_id,
    CASE WHEN s1.doc_id IS NULL THEN 'insert'
         WHEN s2.doc_id IS NULL THEN 'delete'
         WHEN s1.tokens_csv IS DISTINCT FROM s2.tokens_csv
              OR s1.n_tok IS DISTINCT FROM s2.n_tok
              OR s1.source IS DISTINCT FROM s2.source THEN 'update'
    END AS change_type,
    s2.tokens_csv, s2.n_tok, s2.source
FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id
WHERE (CASE WHEN s1.doc_id IS NULL THEN 'insert'
            WHEN s2.doc_id IS NULL THEN 'delete'
            WHEN s1.tokens_csv IS DISTINCT FROM s2.tokens_csv
                 OR s1.n_tok IS DISTINCT FROM s2.n_tok
                 OR s1.source IS DISTINCT FROM s2.source THEN 'update'
       END) IS NOT NULL
"""


@_register(
    "cdc_change_feed",
    _CDC_CDF_SQL.format(
        tokens=tokens_sql("d.doc_id", "d.doc_id*5 + t.k"),
        n_tok=n_tok_sql("d.doc_id", "d.doc_id*5 + t.k"),
    ),
)
def cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from arango_etl_spark.functions.tokenizer import n_tok_expr, tokens_expr
    from arango_etl_spark.operators.merge_into import apply_changes
    from arango_etl_spark.plans.lakehouse import SnapshotTable

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    ev = d.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(5))))
    seq = F.col("doc_id") * 5 + F.col("k")
    ev = ev.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_key"),
        seq.alias("seq_no"),
        F.when(
            F.pmod(F.col("doc_id") * 3 + F.col("k"), F.lit(11)) == 0, "delete"
        ).otherwise(F.lit("update")).alias("op"),
        tokens_expr(F.col("doc_id"), seq).alias("tokens"),
        n_tok_expr(F.col("doc_id"), seq).alias("n_tok"),
        F.col("source"),
        (F.col("k") - 1).cast("long").alias("batch_id"),
        F.col("k").alias("k"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("event_ts"),
    ).withColumnRenamed("doc_key", "doc_id")
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    table = SnapshotTable.create(
        tempfile.mkdtemp(prefix="parity_cdf_") + "/t", payload, n_buckets=16
    )
    apply_changes(
        spark, table, ev.where(F.col("k") <= 3).drop("k"),
        strategy="mor", compact_every=0,
    )
    v_mid = table.current_version()
    apply_changes(
        spark, table, ev.where(F.col("k") > 3).drop("k"),
        strategy="mor", compact_every=0,
    )
    return table.read_changes(spark, v_mid).select(
        "doc_id",
        F.col("_change_type").alias("change_type"),
        F.array_join("tokens", ",").alias("tokens_csv"),
        "n_tok",
        "source",
    )


# --------------------------------------------------------------------------
# 93. bloom_point_lookup — the ENGINE's Bloom-indexed equality lookup on a
# non-key column (plans/lakehouse.py analyze_bloom/read_eq; the hash-index
# half of the reference's sink-side persistent indexes,
# /root/reference/src/handler/arangodb.rs:440-524): load documents into a
# CoW snapshot table, build per-file Bloom filters on `source`, and point-
# look-up one source value through the pruned path. Correctness of the
# PRUNED read is the point under the oracle (file skipping must never
# change the answer); the pruning ratio itself is pinned in
# tests/test_maintenance.py::test_bloom_point_lookup_pruning.
# --------------------------------------------------------------------------
_BLOOM_LOOKUP_SQL = """
SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id,
       array_to_string({tokens}, ',') AS tokens_csv,
       {n_tok} AS n_tok,
       source
FROM documents
WHERE source = 'src7'
"""


@_register(
    "bloom_point_lookup",
    _BLOOM_LOOKUP_SQL.format(
        tokens=tokens_sql("doc_id", "doc_id"),
        n_tok=n_tok_sql("doc_id", "doc_id"),
    ),
)
def bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from arango_etl_spark.functions.tokenizer import n_tok_expr, tokens_expr
    from arango_etl_spark.operators.merge_into import apply_changes
    from arango_etl_spark.plans.lakehouse import SnapshotTable

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    ev = d.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("key"),
        F.col("doc_id").alias("seq_no"),
        F.lit("insert").alias("op"),
        tokens_expr(F.col("doc_id"), F.col("doc_id")).alias("tokens"),
        n_tok_expr(F.col("doc_id"), F.col("doc_id")).alias("n_tok"),
        F.col("source"),
        F.lit(0).cast("long").alias("batch_id"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("event_ts"),
    ).withColumnRenamed("key", "doc_id")
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    table = SnapshotTable.create(
        tempfile.mkdtemp(prefix="parity_bloom_") + "/t", payload, n_buckets=16
    )
    apply_changes(spark, table, ev, strategy="cow", compact_every=0)
    table.analyze_bloom(spark, ["source"])
    return table.read_eq(spark, "source", "src7").select(
        "doc_id",
        F.array_join("tokens", ",").alias("tokens_csv"),
        "n_tok",
        "source",
    )


# --------------------------------------------------------------------------
# cube_event_matrix — full CUBE grouping sets (§2.7 sibling of
# rollup_pricing's ROLLUP): every (event_type × day) subtotal combination
# in ONE pass. Spark plans CUBE as a single Expand + partial-aggregating
# hash agg — 4 grouping sets cost one scan, not four.
# --------------------------------------------------------------------------
_CUBE_SQL = """
SELECT coalesce(event_type, 'ALL') AS etype,
       coalesce(CAST(day AS VARCHAR), 'ALL') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
GROUP BY CUBE(event_type, day)
"""


@_register("cube_event_matrix", _CUBE_SQL)
def cube_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day"), "value"
    )
    return (
        ev.cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
            "n_events", "sum_value",
        )
    )


# --------------------------------------------------------------------------
# funnel_set_ops — INTERSECT then EXCEPT (§2.7 set operations): users who
# both viewed AND clicked but never made a high-value (>150) purchase.
# Spark compiles intersect/subtract to distinct + left-semi/left-anti
# shuffle joins on the full row — the scale shape is the same
# hash-partitioned join as any key equi-join, no materialized
# intermediate sets. (The value filter keeps the result non-trivial at
# every sf: plain "never purchased" is empty — each user purchases.)
# --------------------------------------------------------------------------
_SET_OPS_SQL = """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
"""


@_register("funnel_set_ops", _SET_OPS_SQL)
def funnel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    by = lambda c: ev.where(c).select("user_id")  # noqa: E731
    t = F.col("event_type")
    return (
        by(t == "view")
        .intersect(by(t == "click"))
        .subtract(by((t == "purchase") & (F.col("value") > 150)))
    )


# --------------------------------------------------------------------------
# moving_avg_value — bounded sliding window frame (§2.7: ROWS BETWEEN 4
# PRECEDING AND CURRENT ROW), the frame shape running sums don't cover.
# Per-user frames shuffle once on user_id and sort within partitions —
# state is O(frame), not O(partition). Tie-broken by event_id so the
# frame contents are engine-independent; 4dp display rounding per the
# float-output policy.
# --------------------------------------------------------------------------
_MOVING_AVG_SQL = """
SELECT user_id, event_id,
       round(avg(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS avg5
FROM events
"""


@_register("moving_avg_value", _MOVING_AVG_SQL)
def moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id",
        F.round(F.avg("value").over(w), 4).alias("avg5"),
    )


# --------------------------------------------------------------------------
# trailing_hour_count — RANGE window frame by VALUE (§2.7: RANGE BETWEEN
# 3600 PRECEDING over epoch seconds), the peers-inclusive frame ROWS
# frames can't express: every event counts ALL events of the same user in
# the trailing hour, simultaneous events included symmetrically. Epoch
# integers keep the frame arithmetic engine-portable (Spark's DataFrame
# rangeBetween is numeric-only; DuckDB matches on the same integers).
# The oracle FLOORS the epoch before casting: Spark's unix_timestamp
# truncates fractional seconds while DuckDB's double→bigint cast ROUNDS
# — unfloored, events at x.5+ seconds land in the next second and flip
# frame membership exactly at 3600 s separations (2/100k rows at sf0.1).
# --------------------------------------------------------------------------
_TRAILING_HOUR_SQL = """
SELECT user_id, event_id,
       CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY epoch_s
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_last_hour
FROM (SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
      FROM events)
"""


@_register("trailing_hour_count", _TRAILING_HOUR_SQL)
def trailing_hour_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("epoch_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


# --------------------------------------------------------------------------
# Gate-order curation. The driver's correctness gate evaluates exactly the
# FIRST 50 entries of queries() (dict insertion order), so the emission
# order is curated: one best representative per operator family first, and
# near-duplicate twins (e.g. cdc_final_state vs cdc_engine_replay,
# embedding_cosine_topk vs cosine_topk_multi) after position 50.
# Everything past 50 is still oracle-checked by scripts/check_oracles.py.
# The mapping family -> gate representative is documented in COVERAGE.md.
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# Graph traversal family (operators/graph.py). The reference's sink IS a
# property graph — it builds _from/_to edge documents
# (/root/reference/src/document/edge.rs:7-41) so users can traverse them
# with AQL downstream; these queries re-express that traversal surface
# over the lakehouse tables. Shared fixture: the part co-purchase graph —
# two parts are adjacent iff some order contains both (partkeys
# restricted to %10==0 to keep the graph sparse and multi-hop at every
# sf). The oracle builds the SAME symmetric edge set and walks it with
# recursive CTEs (hop-bounded, like the operators).
# --------------------------------------------------------------------------
_GRAPH_CTE = """
q AS (
    SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 10 = 0
), und AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM q a JOIN q b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), seeds AS (
    SELECT DISTINCT src AS seed FROM und ORDER BY seed LIMIT 3
)
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric part co-purchase edges (src, dst) via operators.graph."""
    from arango_etl_spark.operators.graph import symmetrize

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    canon = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    return symmetrize(canon)


def _graph_seeds(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(3)
    )


_KHOP_SQL = f"""
WITH RECURSIVE {_GRAPH_CTE},
walk(seed, node, depth) AS (
    SELECT seed, seed, 0 FROM seeds
    UNION
    SELECT w.seed, e.dst, w.depth + 1
    FROM walk w JOIN und e ON e.src = w.node
    WHERE w.depth < 3
)
SELECT seed, node, CAST(min(depth) AS INTEGER) AS depth
FROM walk GROUP BY seed, node
"""


@_register("graph_khop", _KHOP_SQL)
def graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQL `FOR v IN 0..3 ANY seed` — BFS min-depth within 3 hops."""
    from arango_etl_spark.operators.graph import k_hop

    edges = _copurchase_edges(spark, sf_dir)
    return k_hop(edges, _graph_seeds(edges), k=3)


_SHORTEST_SQL = f"""
WITH RECURSIVE {_GRAPH_CTE},
wund AS (
    SELECT src, dst, CAST(abs(src - dst) % 7 + 1 AS BIGINT) AS w FROM und
),
walk(seed, node, dist, hops) AS (
    SELECT seed, seed, CAST(0 AS BIGINT), 0 FROM seeds
    UNION ALL
    SELECT wk.seed, e.dst, wk.dist + e.w, wk.hops + 1
    FROM walk wk JOIN wund e ON e.src = wk.node
    WHERE wk.hops < 4
)
SELECT seed, node, min(dist) AS dist FROM walk GROUP BY seed, node
"""


@_register("graph_shortest_paths", _SHORTEST_SQL)
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths bounded to 4 hops (Bellman-Ford frontier
    relaxation vs the oracle's exhaustive bounded path enumeration —
    both compute min total weight over <=4-hop paths, exactly)."""
    from arango_etl_spark.operators.graph import bounded_shortest_paths

    edges = _copurchase_edges(spark, sf_dir).withColumn(
        "w", (F.abs(F.col("src") - F.col("dst")) % 7 + 1).cast("bigint")
    )
    return bounded_shortest_paths(
        edges, _graph_seeds(edges), max_hops=4, weight_col="w"
    )


_TRIANGLES_SQL = f"""
WITH {_GRAPH_CTE},
ce AS (
    SELECT src, dst FROM und WHERE src < dst
), tri AS (
    SELECT e1.src AS na, e1.dst AS nb, e2.dst AS nc
    FROM ce e1
    JOIN ce e2 ON e2.src = e1.dst
    JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
    SELECT na AS node FROM tri
    UNION ALL SELECT nb FROM tri
    UNION ALL SELECT nc FROM tri
) t
GROUP BY node
"""


@_register("graph_triangles", _TRIANGLES_SQL)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation via the degree-ordered
    orientation join (each triangle counted once, hub fan-out bounded
    at O(sqrt(m)), no cartesian). The oracle uses the simpler id
    ordering — valid because the triangle SET is orientation-invariant."""
    from arango_etl_spark.operators.graph import triangle_count

    edges = _copurchase_edges(spark, sf_dir)
    return triangle_count(edges, per_node=True, orientation="degree")


_PAGERANK_ITER = """
c{i} AS (
    SELECT e.dst AS node, sum(r.rank / d.outdeg) AS contrib
    FROM r{p} r JOIN deg d ON d.node = r.node JOIN und e ON e.src = r.node
    GROUP BY e.dst
), r{i} AS (
    SELECT n.node,
           (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c{i}.contrib, CAST(0.0 AS DOUBLE)) AS rank
    FROM nodes n CROSS JOIN nn LEFT JOIN c{i} ON c{i}.node = n.node
)
"""

_PAGERANK_SQL = (
    f"""
WITH {_GRAPH_CTE},
nodes AS (SELECT DISTINCT src AS node FROM und),
deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS outdeg
        FROM und GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
"""
    + ",".join(_PAGERANK_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
SELECT node, round(rank, 8) AS rank FROM r3
"""
)


@_register("graph_pagerank", _PAGERANK_SQL)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-3-iteration PageRank vs the oracle's unrolled CTE chain.
    The graph is symmetric so dangling mass is structurally zero; the
    operator still evaluates its dangling term (a 1-row broadcast
    aggregate) — it folds in exact 0.0. Ranks rounded to 8 dp both
    sides (float-sum association differs at ~1e-16)."""
    from arango_etl_spark.operators.graph import pagerank

    edges = _copurchase_edges(spark, sf_dir)
    return pagerank(edges, iters=3, damping=0.85).select(
        "node", F.round("rank", 8).alias("rank")
    )


# --------------------------------------------------------------------------
# bm25_search — BM25 keyword retrieval over documents (operators/text.py
# bm25_topk). ArangoDB exposes this as its ANALYZER/BM25 search views —
# the query surface a reference user runs against loaded collections.
# --------------------------------------------------------------------------
_BM25_SQL = r"""
WITH base AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '') AS toks
    FROM documents
), d AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base
), stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           avg(CAST(dl AS DOUBLE)) AS avgdl
    FROM d
), postings AS (
    SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
    FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d) t
    WHERE term IN ('window', 'merge', 'stream')
    GROUP BY doc_id, dl, term
), dfreq AS (
    SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings GROUP BY term
)
SELECT p.doc_id,
       round(sum(
           ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (p.tf * (1.2 + 1.0))
           / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))
       ), 6) AS score
FROM postings p JOIN dfreq f ON f.term = p.term CROSS JOIN stats s
GROUP BY p.doc_id
ORDER BY score DESC, p.doc_id ASC
LIMIT 10
"""


@_register("bm25_search", _BM25_SQL)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.text import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"),
        ["window", "merge", "stream"],
        k=10,
    )


# --------------------------------------------------------------------------
# JSON document shredding (sources/readers.shred_json_column). The
# reference's core job is decoding wire messages into JSON documents for
# a document store (src/handler/arangodb_handler.rs decode + conversion);
# these queries cover the inverse surface its users need back out: typed
# extraction from an embedded JSON column, shredded ONCE map-side so
# every downstream query gets pruned columnar scans.
# --------------------------------------------------------------------------
_JSON_SHRED_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
"""


@_register("json_shred_props", _JSON_SHRED_SQL)
def json_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shred events.props ({"k": n}) to a typed column, then the usual
    partial-agg rollup per event_type. The shred is map-only; the one
    shuffle carries (event_type, partial count/sum) only."""
    from arango_etl_spark.sources.readers import shred_json_column

    ev = _t(spark, sf_dir, "events").select("event_type", "props")
    shredded = shred_json_column(ev, "props", "k BIGINT")
    return shredded.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )


_JSON_NESTED_SQL = """
WITH j AS (
    SELECT doc_id,
           '{"id":' || CAST(doc_id AS VARCHAR)
           || ',"tags":["' || source || '","' || lang
           || '"],"meta":{"n":' || CAST(n_chars AS VARCHAR) || '}}' AS js
    FROM documents
)
SELECT doc_id,
       CAST(json_extract_string(js, '$.id') AS BIGINT) AS jid,
       json_extract_string(js, '$.tags[0]') AS tag0,
       json_extract_string(js, '$.tags[1]') AS tag1,
       CAST(json_extract_string(js, '$.meta.n') AS BIGINT) AS meta_n
FROM j
"""


@_register("json_nested_extract", _JSON_NESTED_SQL)
def json_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-path extraction: a document JSON (built deterministically
    from the documents columns so both engines parse the SAME bytes)
    shredded with a nested schema — object field, array indexing, and a
    sub-object path, all columnar from_json/getField (no UDF)."""
    from arango_etl_spark.sources.readers import shred_json_column

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('{"id":'), F.col("doc_id").cast("string"),
            F.lit(',"tags":["'), F.col("source"), F.lit('","'),
            F.col("lang"), F.lit('"],"meta":{"n":'),
            F.col("n_chars").cast("string"), F.lit("}}"),
        ).alias("js"),
    )
    shredded = shred_json_column(
        d, "js",
        "id BIGINT, tags ARRAY<STRING>, meta STRUCT<n: BIGINT>",
    )
    return shredded.select(
        "doc_id",
        F.col("id").alias("jid"),
        F.col("tags").getItem(0).alias("tag0"),
        F.col("tags").getItem(1).alias("tag1"),
        F.col("meta").getField("n").alias("meta_n"),
    )


# --------------------------------------------------------------------------
# gapfill_locf_series — hypertable-style time_bucket_gapfill + locf
# (operators/timeseries.resample): dense 6h per-user grid over the
# events table, empty buckets carried forward. The oracle mirrors the
# exact same spine/fill semantics with generate_series + IGNORE NULLS
# windows. Epochs floored before casting (DuckDB CAST rounds).
# --------------------------------------------------------------------------
_GAPFILL_SQL = """
WITH obs AS (
    SELECT user_id,
           CAST(floor(epoch(ts) / 21600) AS BIGINT) AS b,
           ts, event_id, value
    FROM events
), last_obs AS (
    SELECT user_id, b, value FROM (
        SELECT user_id, b, value,
               row_number() OVER (
                   PARTITION BY user_id, b
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM obs
    ) WHERE rn = 1
), rng AS (
    SELECT min(b) AS lo, max(b) AS hi FROM obs
), spine AS (
    SELECT user_id,
           unnest(generate_series((SELECT lo FROM rng),
                                  (SELECT hi FROM rng))) AS b
    FROM (SELECT DISTINCT user_id FROM obs)
)
SELECT s.user_id,
       s.b * 21600 AS bucket_epoch,
       last_value(l.value IGNORE NULLS) OVER w AS value,
       (l.value IS NULL
        AND last_value(l.value IGNORE NULLS) OVER w IS NOT NULL) AS filled
FROM spine s
LEFT JOIN last_obs l ON l.user_id = s.user_id AND l.b = s.b
WINDOW w AS (PARTITION BY s.user_id ORDER BY s.b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@_register("gapfill_locf_series", _GAPFILL_SQL)
def gapfill_locf_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.timeseries import resample

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
        "event_id",
    )
    out = resample(
        ev, "user_id", "ts", "value", 21600, tiebreak_col="event_id"
    )
    return out.select(
        "user_id",
        F.unix_timestamp("bucket_ts").cast("bigint").alias("bucket_epoch"),
        "value",
        "filled",
    )


# --------------------------------------------------------------------------
# interpolate_linear_series — the linear-interpolation mode of the same
# resampler (timeseries.resample(method="linear")): gaps filled by the
# line between the key's previous and next observed buckets, no
# extrapolation outside the observation span. Lerp is float — both sides
# round to 6 dp with the identical expression shape.
# --------------------------------------------------------------------------
_INTERP_SQL = """
WITH obs AS (
    SELECT user_id,
           CAST(floor(epoch(ts) / 21600) AS BIGINT) AS b,
           ts, event_id, value
    FROM events
), last_obs AS (
    SELECT user_id, b, value FROM (
        SELECT user_id, b, value,
               row_number() OVER (
                   PARTITION BY user_id, b
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM obs
    ) WHERE rn = 1
), rng AS (
    SELECT min(b) AS lo, max(b) AS hi FROM obs
), spine AS (
    SELECT user_id,
           unnest(generate_series((SELECT lo FROM rng),
                                  (SELECT hi FROM rng))) AS b
    FROM (SELECT DISTINCT user_id FROM obs)
), g AS (
    SELECT s.user_id, s.b, l.value AS v,
           last_value(l.value IGNORE NULLS) OVER wb AS pv,
           last_value(CASE WHEN l.value IS NOT NULL THEN s.b END
                      IGNORE NULLS) OVER wb AS pb,
           first_value(l.value IGNORE NULLS) OVER wf AS nv,
           first_value(CASE WHEN l.value IS NOT NULL THEN s.b END
                       IGNORE NULLS) OVER wf AS nb
    FROM spine s
    LEFT JOIN last_obs l ON l.user_id = s.user_id AND l.b = s.b
    WINDOW wb AS (PARTITION BY s.user_id ORDER BY s.b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY s.user_id ORDER BY s.b
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       b * 21600 AS bucket_epoch,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                       pv + (nv - pv) * (CAST(b - pb AS DOUBLE)
                                         / CAST(nb - pb AS DOUBLE))
             END, 6) AS value,
       (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS filled
FROM g
"""


@_register("interpolate_linear_series", _INTERP_SQL)
def interpolate_linear_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.timeseries import resample

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
        "event_id",
    )
    out = resample(
        ev, "user_id", "ts", "value", 21600,
        tiebreak_col="event_id", method="linear",
    )
    return out.select(
        "user_id",
        F.unix_timestamp("bucket_ts").cast("bigint").alias("bucket_epoch"),
        F.round("value", 6).alias("value"),
        "filled",
    )


# --------------------------------------------------------------------------
# fanout_source_profiles — multi-sink fan-out ingest THROUGH THE ENGINE:
# the same 5-batch change log as cdc_engine_replay is applied per batch to
# TWO tables in one apply_fan_out call — the doc_id-keyed documents table
# (identity projection) and a source-keyed profile table (the reference's
# hotspot projection T14, /root/reference/src/document/hotspot.rs:28-78),
# each under its own batch-id fence. Returned state: the PROFILE table
# (the docs side is the already-gated cdc_engine_replay path); the oracle
# reduces the raw event log declaratively — every event, including doc
# deletes, is an observation of its source, LWW by seq_no.
# --------------------------------------------------------------------------
_FANOUT_SQL = f"""
WITH ev AS (
    SELECT
        'doc_' || CAST(d.doc_id AS VARCHAR)          AS doc_id,
        d.doc_id * 5 + t.k                           AS seq_no,
        {n_tok_sql("d.doc_id", "d.doc_id*5 + t.k")}  AS n_tok,
        d.source                                     AS source
    FROM documents d CROSS JOIN generate_series(1, 5) t(k)
)
SELECT source,
       arg_max(doc_id, seq_no) AS last_doc_id,
       arg_max(n_tok, seq_no)  AS last_n_tok
FROM ev GROUP BY source
"""


@_register("fanout_source_profiles", _FANOUT_SQL)
def fanout_source_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from arango_etl_spark.functions.tokenizer import n_tok_expr, tokens_expr
    from arango_etl_spark.operators.fanout import (
        SinkSpec,
        apply_fan_out,
        source_profile_events,
    )
    from arango_etl_spark.plans.lakehouse import SnapshotTable

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    ev = d.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(5))))
    seq = F.col("doc_id") * 5 + F.col("k")
    ev = ev.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_key"),
        seq.alias("seq_no"),
        F.when(
            F.pmod(F.col("doc_id") * 3 + F.col("k"), F.lit(11)) == 0, "delete"
        ).otherwise(F.lit("update")).alias("op"),
        tokens_expr(F.col("doc_id"), seq).alias("tokens"),
        n_tok_expr(F.col("doc_id"), seq).alias("n_tok"),
        F.col("source"),
        (F.col("k") - 1).cast("long").alias("batch_id"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("event_ts"),
    ).withColumnRenamed("doc_key", "doc_id")

    root = tempfile.mkdtemp(prefix="parity_fanout_")
    docs = SnapshotTable.create(
        root + "/docs",
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
                T.StructField("n_tok", T.IntegerType()),
                T.StructField("source", T.StringType()),
            ]
        ),
        key_col="doc_id",
        n_buckets=16,
    )
    profiles = SnapshotTable.create(
        root + "/profiles",
        T.StructType(
            [
                T.StructField("source", T.StringType()),
                T.StructField("last_doc_id", T.StringType()),
                T.StructField("last_n_tok", T.IntegerType()),
            ]
        ),
        key_col="source",
        n_buckets=4,
    )
    sinks = {
        "docs": SinkSpec(docs, lambda df: df, compact_every=0),
        "profiles": SinkSpec(profiles, source_profile_events, compact_every=0),
    }
    for b in range(5):
        apply_fan_out(
            spark, sinks, ev.where(F.col("batch_id") == b),
            batch_id=b, stream_id="parity",
        )
    return profiles.read(spark).select("source", "last_doc_id", "last_n_tok")


# --------------------------------------------------------------------------
# bk_value_quantiles — bottom-k quantile sketch (operators/sketches.py):
# a deterministic uniform row sample (k smallest md5-hashes of the row
# id) whose sample quantiles estimate data quantiles with ~1/sqrt(k)
# error and merge losslessly across shards. The oracle reproduces the
# ENTIRE sketch math — hash ranking, sample cut, (value, hash) ordering,
# lower-nearest-rank pick — so collisions/ties match bit-for-bit.
# Completes the sketch family: KMV/HLL "how many distinct", CMS "how
# often", bottom-k "how distributed".
# --------------------------------------------------------------------------
_BK_SQL = """
WITH hashed AS (
    SELECT event_type,
        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 9007199254740881 AS h,
        CAST(value AS DOUBLE) AS v
    FROM events WHERE value IS NOT NULL
), kept AS (
    SELECT event_type, h, v,
           row_number() OVER (PARTITION BY event_type ORDER BY h, v) AS rn
    FROM hashed
), sample AS (
    SELECT event_type, v,
           row_number() OVER (PARTITION BY event_type ORDER BY v, h) AS vr,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM kept WHERE rn <= 128
)
SELECT event_type,
       round(max(CASE WHEN vr = CAST(floor(0.5  * (n - 1)) AS BIGINT) + 1
                      THEN v END), 6) AS q50,
       round(max(CASE WHEN vr = CAST(floor(0.9  * (n - 1)) AS BIGINT) + 1
                      THEN v END), 6) AS q90,
       round(max(CASE WHEN vr = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1
                      THEN v END), 6) AS q99
FROM sample GROUP BY event_type
"""


@_register("bk_value_quantiles", _BK_SQL)
def bk_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.sketches import bk_quantiles, bk_sample

    ev = _t(spark, sf_dir, "events")
    return bk_quantiles(
        bk_sample(ev, "value", "event_id", ["event_type"], k=128),
        [0.5, 0.9, 0.99],
    )


# --------------------------------------------------------------------------
# video_frame_sample — REAL frame sampling over the deterministic RAWV
# container (operators/multimodal.py): header parse → (nf, h, w) numpy
# view → every-2nd-frame per-frame luminance stats, one row per sampled
# frame, inside Arrow-batched mapInPandas. The synthesis formula is
# reproduced pixel-for-pixel in DuckDB (generate_series over f, y, x),
# so encode+decode+sampling are value-checked end-to-end like WAV/BMP.
# Codec decode (ffmpeg-class) remains the labeled stub — no codec libs
# in this container; RAWV proves the Spark-side plumbing is real.
# --------------------------------------------------------------------------
_RAWV_SQL = """
WITH params AS (
    SELECT doc_id, 8 + doc_id % 8 AS w, 8 AS h, 4 + doc_id % 4 AS nf
    FROM documents
), frames AS (
    -- static series + WHERE (DuckDB generate_series takes no lateral
    -- column args): nf <= 7, w <= 15, h = 8 by construction
    SELECT doc_id, w, h, f.f AS frame_idx
    FROM params, generate_series(0, 6) f(f)
    WHERE f.f < nf AND f.f % 2 = 0
), px AS (
    SELECT doc_id, frame_idx, w, h,
           (doc_id*31 + frame_idx*17 + y.y*5 + x.x*3) % 256 AS v
    FROM frames,
         generate_series(0, 7) y(y),
         generate_series(0, 14) x(x)
    WHERE x.x < w
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       round(avg(v), 6) AS mean_lum,
       CAST(min(v) AS INT) AS min_lum, CAST(max(v) AS INT) AS max_lum
FROM px GROUP BY doc_id, frame_idx, w, h
"""


@_register("video_frame_sample", _RAWV_SQL)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_rawv,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    feats = sample_video_frames(synthesize_rawv(d), every_k=2)
    return feats.select(
        "doc_id", "frame_idx", "width", "height",
        F.round("mean_lum", 6).alias("mean_lum"), "min_lum", "max_lum",
    )


# --------------------------------------------------------------------------
# dup_span_coverage — exact-substring (token k-gram span) dedup, the
# tokens-payload flavor of Lee et al. 2022 (operators/tokenspan.py).
# Token arrays are synthesized as sentence-pool concatenations (3-7
# sentences of 8 tokens drawn from a 797-sentence pool), so documents
# genuinely share multi-token spans and coverage varies per doc. k = 8
# aligns with the sentence length: whole shared sentences always dup;
# boundary-spanning grams dup only when consecutive sentence pairs
# repeat. All-integer outputs (coverage as exact ppm via integer div).
# --------------------------------------------------------------------------
_DUPSPAN_SQL = """
WITH d AS (
    SELECT doc_id,
           flatten(list_transform(generate_series(1, 3 + doc_id % 5),
             j -> list_transform(generate_series(1, 8),
               i -> CAST((((doc_id*13 + j*11) % 797)*23 + i*7) % 50000
                         AS INTEGER)))) AS tokens
    FROM documents
), g AS (
    -- static series + WHERE (DuckDB generate_series takes no lateral
    -- column args): n_tok <= 7*8 = 56 by construction -> pos <= 49
    SELECT doc_id, p.p AS pos,
           array_to_string(tokens[p.p:p.p+7], ',') AS gram_key
    FROM d, generate_series(1, 49) p(p)
    WHERE p.p <= len(tokens) - 7
), dup AS (
    SELECT gram_key FROM g GROUP BY gram_key
    HAVING count(DISTINCT doc_id) >= 2
), f AS (
    SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram_key)
), cov AS (
    SELECT doc_id, count(DISTINCT i.i) AS covered
    FROM f, generate_series(1, 56) i(i)
    WHERE i.i BETWEEN f.pos AND f.pos + 7
    GROUP BY doc_id
), dp AS (
    SELECT doc_id, count(*) AS dup_positions FROM f GROUP BY doc_id
)
SELECT d.doc_id, CAST(len(d.tokens) AS INT) AS n_tok,
       COALESCE(dp.dup_positions, 0) AS dup_positions,
       COALESCE(cov.covered, 0) AS covered_tokens,
       COALESCE(cov.covered, 0) * 1000000 // len(d.tokens) AS coverage_ppm
FROM d LEFT JOIN dp USING (doc_id) LEFT JOIN cov USING (doc_id)
"""


@_register("dup_span_coverage", _DUPSPAN_SQL)
def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.tokenspan import duplicate_span_stats

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(3) + F.pmod(F.col("doc_id"), F.lit(5))),
                lambda j: F.transform(
                    F.sequence(F.lit(1), F.lit(8)),
                    lambda i: F.pmod(
                        F.pmod(F.col("doc_id") * 13 + j * 11, F.lit(797)) * 23
                        + i * 7,
                        F.lit(50000),
                    ).cast("int"),
                ),
            )
        ).alias("tokens"),
    )
    return duplicate_span_stats(docs, k=8, min_docs=2, mode="exact")


# --------------------------------------------------------------------------
# token_drift_by_source — per-source token-distribution drift vs the
# whole corpus (operators/drift.py): total-variation distance as an
# EXACT integer ppm (integer cross-products, closed-form absent-token
# term), one wide (source, token) partial-agg shuffle + broadcast-only
# joins after. The monitoring leg of the training-data pipeline.
# --------------------------------------------------------------------------
_DRIFT_SQL = f"""
WITH d AS (
    SELECT source, {tokens_sql("doc_id", "doc_id")} AS tokens FROM documents
), tok AS (
    SELECT source, unnest(tokens) AS tok FROM d
), st AS (
    SELECT source, tok, count(*) AS c_st FROM tok GROUP BY source, tok
), t AS (
    SELECT tok, sum(c_st) AS c_t FROM st GROUP BY tok
), s AS (
    SELECT source, sum(c_st) AS n_s, count(*) AS distinct_tokens
    FROM st GROUP BY source
), n AS (
    SELECT sum(c_t) AS n_total FROM t
), pres AS (
    SELECT st.source,
           sum(abs(st.c_st * n.n_total - t.c_t * s.n_s)) AS sum_abs_present,
           sum(t.c_t) AS sum_ct_present
    FROM st JOIN t USING (tok) JOIN s USING (source) CROSS JOIN n
    GROUP BY st.source
)
SELECT s.source, s.n_s AS n_tokens, s.distinct_tokens,
       CAST((p.sum_abs_present + s.n_s * (n.n_total - p.sum_ct_present))
            * 1000000 // (2 * s.n_s * n.n_total) AS BIGINT) AS tv_ppm
FROM s JOIN pres p USING (source) CROSS JOIN n
"""


@_register("token_drift_by_source", _DRIFT_SQL)
def token_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.functions.tokenizer import tokens_expr
    from arango_etl_spark.operators.drift import token_distribution_drift

    docs = _t(spark, sf_dir, "documents").select(
        "source", tokens_expr(F.col("doc_id"), F.col("doc_id")).alias("tokens")
    )
    return token_distribution_drift(docs)


# --------------------------------------------------------------------------
# pq_topk_multi — product-quantization ANN over int8-quantized embeddings
# (operators/pq.py, Jégou et al. 2011): hash-seeded codebooks, map-only
# argmin encoding, integer-exact ADC distances, distributed two-phase
# top-k. Composes quantize_embeddings (the oracle reproduces its formula)
# so EVERY number here — codes, distances, ties — is exact int64 in both
# engines; none of the cosine family's float-fold jitter.
# --------------------------------------------------------------------------
_PQ_SQL = """
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
    FROM embeddings
), qz AS (
    SELECT vec_id,
           list_transform(vd, x -> CAST(round(x / sc) AS INTEGER)) AS qvec
    FROM (SELECT vec_id, vd,
                 greatest(list_max(list_transform(vd, x -> abs(x))) / 127.0,
                          1e-30) AS sc
          FROM v)
), seeds AS (
    SELECT row_number() OVER (
               ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                             1, 15)) AS BIGINT), vec_id
           ) AS c, qvec
    FROM qz
    ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                  AS BIGINT), vec_id
    LIMIT 16
), cand AS (
    -- per (vector, subspace, candidate code): exact int squared L2
    SELECT z.vec_id, j.j, s.c,
           list_sum(list_transform(generate_series(1, 8), i ->
               (z.qvec[(j.j-1)*8 + i] - s.qvec[(j.j-1)*8 + i])
             * (z.qvec[(j.j-1)*8 + i] - s.qvec[(j.j-1)*8 + i]))) AS d
    FROM qz z, generate_series(1, 8) j(j), seeds s
), code AS (
    SELECT vec_id, j, c FROM (
        SELECT vec_id, j, c,
               row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
        FROM cand
    ) WHERE rn = 1
), queries AS (
    SELECT vec_id AS query_id, qvec AS qq FROM qz WHERE vec_id IN (0, 1, 2)
), adc AS (
    SELECT qu.query_id, co.vec_id,
           sum(list_sum(list_transform(generate_series(1, 8), i ->
               (qu.qq[(co.j-1)*8 + i] - s.qvec[(co.j-1)*8 + i])
             * (qu.qq[(co.j-1)*8 + i] - s.qvec[(co.j-1)*8 + i])))) AS dist
    FROM code co JOIN seeds s ON s.c = co.c
    CROSS JOIN queries qu
    GROUP BY qu.query_id, co.vec_id
)
SELECT query_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist FROM (
    SELECT query_id, vec_id, dist AS adc_dist,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist, vec_id) AS rn
    FROM adc
) WHERE rn <= 10
"""


@_register("pq_topk_multi", _PQ_SQL)
def pq_topk_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.pq import build_pq_index, pq_topk
    from arango_etl_spark.operators.similarity import quantize_embeddings

    qz = quantize_embeddings(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", "qvec"
    )
    index = build_pq_index(qz, m=8, ksub=16)
    queries = qz.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "qvec"
    )
    return pq_topk(index, queries, k=10)


# --------------------------------------------------------------------------
# 113. semantic_dedup_keep — SemDeDup-shaped embedding dedup (Abbas et al.
# 2023): IVF-cell clustering bounds the pairwise step to within-cell
# comparisons; an item is dropped iff a smaller-id cell member is
# threshold-similar (pairwise dominance — recursion-free, so the FULL
# pipeline incl. centroid seeding and argmax assignment mirrors in DuckDB;
# the transitive-component keep policy is covered by neardup_clusters).
# τ=0.3 sits above the synthetic corpus's intra-cell p99 (~0.34 max 0.49 at
# sf0.01) so the output has a real kept/dropped mix without manufacturing
# near-identical vectors.
# --------------------------------------------------------------------------
_SEMDEDUP_SQL = """
WITH h AS (
    SELECT vec_id, embedding,
           CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS hh
    FROM embeddings
), cent AS (
    SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
           embedding AS ce
    FROM h ORDER BY hh, vec_id LIMIT 16
), assign AS (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                         CAST(c.ce AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(e.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(c.ce AS DOUBLE[]),
                                                   CAST(c.ce AS DOUBLE[]))))
                        DESC, c.cid ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cent c
), a1 AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1)
SELECT x.vec_id, CAST(x.cid AS INTEGER) AS cell,
       NOT EXISTS (
           SELECT 1 FROM a1 y
           WHERE y.cid = x.cid AND y.vec_id < x.vec_id
             AND list_dot_product(CAST(x.embedding AS DOUBLE[]),
                                  CAST(y.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
                                          CAST(x.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(y.embedding AS DOUBLE[]),
                                            CAST(y.embedding AS DOUBLE[]))))
                 >= 0.3
       ) AS kept
FROM a1 x
"""


@_register("semantic_dedup_keep", _SEMDEDUP_SQL)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), n_cells=16, threshold=0.3
    )


# --------------------------------------------------------------------------
# 114. ivfpq_topk_multi — IVFADC (Jégou et al. 2011 §IV): coarse-cell
# pruning (probe 2 of 8 cells) + PQ codes over CELL RESIDUALS, ranked by
# asymmetric distance. Composes the two oracle-proven pieces (ivf_topk's
# hash-seeded coarse layer, pq_topk_multi's integer-exact codebook layer)
# into the canonical billion-scale ANN layout; every step is exact int64
# arithmetic, so the DuckDB mirror is bit-identical end to end.
# --------------------------------------------------------------------------
_IVFPQ_SQL = """
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
    FROM embeddings
), qz AS (
    SELECT vec_id,
           list_transform(vd, x -> CAST(round(x / sc) AS INTEGER)) AS qvec
    FROM (SELECT vec_id, vd,
                 greatest(list_max(list_transform(vd, x -> abs(x))) / 127.0,
                          1e-30) AS sc
          FROM v)
), cseeds AS (
    SELECT row_number() OVER (
               ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                             1, 15)) AS BIGINT), vec_id
           ) - 1 AS cid, qvec AS cv
    FROM qz
    ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                  AS BIGINT), vec_id
    LIMIT 8
), cass AS (
    SELECT vec_id, cid AS cell FROM (
        SELECT z.vec_id, s.cid,
               row_number() OVER (
                   PARTITION BY z.vec_id
                   ORDER BY list_sum(list_transform(generate_series(1, 64),
                                i -> (z.qvec[i] - s.cv[i])
                                   * (z.qvec[i] - s.cv[i]))), s.cid
               ) AS rn
        FROM qz z, cseeds s
    ) WHERE rn = 1
), res AS (
    SELECT z.vec_id, a.cell,
           list_transform(generate_series(1, 64),
                          i -> z.qvec[i] - s.cv[i]) AS r
    FROM qz z
    JOIN cass a ON a.vec_id = z.vec_id
    JOIN cseeds s ON s.cid = a.cell
), rseeds AS (
    SELECT row_number() OVER (
               ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                             1, 15)) AS BIGINT), vec_id
           ) AS c, r AS rv
    FROM res
    ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                  AS BIGINT), vec_id
    LIMIT 16
), code AS (
    SELECT vec_id, cell, j, c FROM (
        SELECT e.vec_id, e.cell, j.j, s.c,
               row_number() OVER (
                   PARTITION BY e.vec_id, j.j
                   ORDER BY list_sum(list_transform(generate_series(1, 8),
                                i -> (e.r[(j.j-1)*8 + i] - s.rv[(j.j-1)*8 + i])
                                   * (e.r[(j.j-1)*8 + i] - s.rv[(j.j-1)*8 + i]))),
                            s.c
               ) AS rn
        FROM res e, generate_series(1, 8) j(j), rseeds s
    ) WHERE rn = 1
), queries AS (
    SELECT vec_id AS query_id, qvec AS qq FROM qz WHERE vec_id IN (0, 1, 2)
), qprobe AS (
    SELECT query_id, cid FROM (
        SELECT qu.query_id, s.cid,
               row_number() OVER (
                   PARTITION BY qu.query_id
                   ORDER BY list_sum(list_transform(generate_series(1, 64),
                                i -> (qu.qq[i] - s.cv[i])
                                   * (qu.qq[i] - s.cv[i]))), s.cid
               ) AS rn
        FROM queries qu, cseeds s
    ) WHERE rn <= 2
), adc AS (
    -- query residual vs the probed cell's centroid, compared to the
    -- stored code's codebook row: (qq - cv) vs rseeds.rv, per subspace
    SELECT qu.query_id, co.vec_id,
           sum(list_sum(list_transform(generate_series(1, 8), i ->
               (qu.qq[(co.j-1)*8 + i] - cs.cv[(co.j-1)*8 + i]
                                      - s.rv[(co.j-1)*8 + i])
             * (qu.qq[(co.j-1)*8 + i] - cs.cv[(co.j-1)*8 + i]
                                      - s.rv[(co.j-1)*8 + i])))) AS dist
    FROM code co
    JOIN rseeds s ON s.c = co.c
    JOIN qprobe p ON p.cid = co.cell
    JOIN queries qu ON qu.query_id = p.query_id
    JOIN cseeds cs ON cs.cid = co.cell
    GROUP BY qu.query_id, co.vec_id
)
SELECT query_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist FROM (
    SELECT query_id, vec_id, dist AS adc_dist,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist, vec_id) AS rn
    FROM adc
) WHERE rn <= 10
"""


@_register("ivfpq_topk_multi", _IVFPQ_SQL)
def ivfpq_topk_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arango_etl_spark.operators.pq import build_ivfpq_index, ivfpq_topk
    from arango_etl_spark.operators.similarity import quantize_embeddings

    qz = quantize_embeddings(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", "qvec"
    )
    index = build_ivfpq_index(qz, kc=8, m=8, ksub=16)
    queries = qz.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "qvec"
    )
    return ivfpq_topk(index, queries, k=10, n_probe=2)


_GATE_ORDER = [
    # CDC / merge engine (SURVEY §2.2 K1-K6, §2.6 J3, §2.5 A6)
    "cdc_engine_replay",
    "lww_latest_per_key",
    # joins & filters (§2.3, §2.6; semi_join_exists = same
    # existence-predicate family as the anti join, past 50)
    "anti_join_unprocessed",
    "rollup_incremental",
    "resume_cursor",
    "retry_cap_filter",
    "zero_default_lookup",
    # aggregations (§2.5)
    "set_accumulation",
    "histogram_counts",
    # per-row transforms (§2.4; base64url_ids is the per-row string
    # transform twin of edge_keys — past 50, check_oracles-swept)
    "explode_words",
    "edge_keys",
    "ingest_latency",
    "geo_cell_enrich",
    # multi-sink fan-out ingest (the reference's 4-collection populate
    # loop, arangodb.rs:345-376 — per-sink fences through the engine)
    "fanout_source_profiles",
    # analytics / TPC-H join trees (q3/q10 are same-family twins of
    # q5/q18 — past 50, still check_oracles-swept)
    "pricing_summary",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    "rollup_pricing",
    # deterministic sketches (KMV cardinality + count-min frequency)
    "kmv_distinct_users",
    "cms_token_counts",
    # windows / sessions / temporal joins (§2.7)
    "windowed_event_counts",
    "session_window_stats",
    "asof_join_views",
    "range_join_windows",
    # graph traversal + graph analytics (the reference's sink is a
    # property graph — edge.rs; khop/triangles are same-family twins
    # past 50, check_oracles-swept)
    "graph_shortest_paths",
    "graph_pagerank",
    # CDC-derived views (snapshot_diff_states is the declarative twin of
    # cdc_change_feed — past 50; the gate keeps the version that exercises
    # the ENGINE's read_changes path: MoR merge → manifest-pruned CDF)
    "scd2_history",
    "cdc_change_feed",
    # dedup family (exact / MinHash-LSH / components / SimHash /
    # exact-substring token spans / embedding; jaccard_pairs is the
    # shingle-pair twin of minhash_lsh_candidates — past 50,
    # check_oracles-swept)
    "exact_dedup_docs",
    "minhash_lsh_candidates",
    "neardup_clusters",
    "simhash_docs",
    "dup_span_coverage",
    "embedding_near_dups",
    # ANN family (brute-force top-k + the strongest index rep: IVFADC —
    # coarse prune + residual PQ, Jégou et al. 2011 §IV; ivf_topk and
    # pq_topk_multi are its two constituent layers, each oracle-paired
    # past 50 and check_oracles-swept)
    "cosine_topk_multi",
    "ivfpq_topk_multi",
    # text analysis (quality_score is the columnar-text-stats twin of
    # token_stats — past 50, check_oracles-swept)
    "token_stats",
    "language_id_docs",
    "redact_pii_docs",
    "contamination_check",
    # time-series resampling (gap-filled buckets + LOCF; the linear-
    # interpolation mode is the same-family twin past 50)
    "gapfill_locf_series",
    # text retrieval (BM25 keyword search — ArangoDB's search-view surface)
    "bm25_search",
    # JSON document shredding (doc_fingerprint moved past 50 — the
    # fingerprint family stays gated via simhash_docs)
    "json_shred_props",
    # corpus profiling (value_histogram / bigram_counts are count-shaping
    # twins of histogram_counts / vocab_topk — past 50)
    "vocab_topk",
    "length_quantiles",
    # packing / splits / sampling (truncate_pad = packing twin of
    # pack_chunks — past 50)
    "pack_chunks",
    "split_assignment",
    "mixture_sampled",
    # multimodal + end-to-end curation
    "bmp_features",
    "curated_training_set",
]


def _gate_sorted(mapping: dict) -> dict:
    missing = [n for n in _GATE_ORDER if n not in _QUERIES]
    if missing or len(set(_GATE_ORDER)) != len(_GATE_ORDER):
        raise RuntimeError(f"bad _GATE_ORDER: missing={missing}")
    ordered = {n: mapping[n] for n in _GATE_ORDER if n in mapping}
    ordered.update({n: v for n, v in mapping.items() if n not in ordered})
    return ordered


def queries() -> dict[str, QueryFn]:
    return _gate_sorted(dict(_QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_sorted(dict(_ORACLES))
