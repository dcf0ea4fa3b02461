"""Sinks: the idempotent keyed parquet writer (the reference's
UNIQUE + INSERT OR IGNORE semantic), CSV overwrite/append/merge
writers, and the foreachPartition REST sink."""
