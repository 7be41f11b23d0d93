"""Utilities: profiling/metrics, checkpointing helpers."""
