"""Structured Streaming twins of the batch-incremental operators."""
