"""Scalar/columnar function layer: text analysis, deduplication, similarity
search — the training-data-pipeline operators layered over the engine."""
