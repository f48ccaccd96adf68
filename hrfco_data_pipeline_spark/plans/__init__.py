"""Composed end-to-end pipelines (batch; streaming twins in streaming/)."""
