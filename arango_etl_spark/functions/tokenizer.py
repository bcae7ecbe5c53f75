"""Deterministic token synthesis for the pre-tokenized-sequence payload.

The target table carries ``tokens:array<int32>`` (BASELINE.json input_hint).
Test/bench inputs derive token arrays deterministically from
``(doc_id, seq_no)`` via pure integer arithmetic so that:

1. the same expression is writable in Spark SQL *and* DuckDB SQL (the
   driver's oracle), and
2. replay is byte-identical — no wall clock, no RNG state (reference
   hazard: ``Utc::now()`` in merged state,
   /root/reference/src/document/hotspot.rs:47).

Formula (all int64 arithmetic, no overflow for doc_id < 2^40):

    n_tok(doc_id, seq_no)   = 8 + (doc_id*7 + seq_no) % 57
    token_i(doc_id, seq_no) = (doc_id*31 + seq_no*17 + i*7) % 50000   i=1..n
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VOCAB = 50_000
MIN_TOKENS = 8
TOKEN_SPAN = 57


def n_tok_expr(doc_id: Column, seq_no: Column) -> Column:
    """Deterministic sequence length in [MIN_TOKENS, MIN_TOKENS+TOKEN_SPAN)."""
    return (
        F.lit(MIN_TOKENS) + F.pmod(doc_id * 7 + seq_no, F.lit(TOKEN_SPAN))
    ).cast("int")


def tokens_expr(doc_id: Column, seq_no: Column) -> Column:
    """array<int32> of deterministic tokens; pure Spark exprs, codegen'd."""
    n = n_tok_expr(doc_id, seq_no)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.pmod(doc_id * 31 + seq_no * 17 + i * 7, F.lit(VOCAB)).cast("int"),
    )


def n_tok_sql(doc_id: str, seq_no: str) -> str:
    """Same formula as ANSI/DuckDB SQL (for oracle_sql pairs)."""
    return f"CAST(8 + (({doc_id})*7 + ({seq_no})) % 57 AS INTEGER)"


def tokens_sql(doc_id: str, seq_no: str) -> str:
    """DuckDB SQL producing the identical array<int32>."""
    return (
        f"list_transform(generate_series(1, {n_tok_sql(doc_id, seq_no)}), "
        f"i -> CAST((({doc_id})*31 + ({seq_no})*17 + i*7) % 50000 AS INTEGER))"
    )
