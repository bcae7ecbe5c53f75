"""Scalar/expression layer — Spark-native equivalents of the reference's
per-row Rust transforms (SURVEY.md §2.4, /root/reference/src/document/*.rs).
"""
