"""Operators — the engine's relational building blocks (SURVEY.md §2).

Each module maps a group of reference behaviors to idiomatic
DataFrame-level plans; nothing here uses RDDs or per-row Python.
"""
