"""Streaming — the `current`-mode tail loop re-expressed as Structured
Streaming (SURVEY.md §2.8; reference: tokio tick loop,
/root/reference/src/tracker.rs:24-44).
"""
