"""Structured Streaming variants of the event-time operators.

The reference is batch-only (SURVEY.md §2.8); this package is the engine's
streaming extension: the same windowed/sessionized aggregations expressed
over ``readStream`` sources with watermark-bounded state, plus a custom
stateful operator via ``applyInPandasWithState``.
"""
