"""Structured Streaming layer (SURVEY §2.9).

- :mod:`engine.streaming.windows`     — event-time windowed aggregation
  (tumbling / sliding / session) with watermarks
- :mod:`engine.streaming.incremental` — the reference's incremental-poll
  pipeline as a real ``readStream`` + ``Trigger.AvailableNow`` query with
  stateful dedup and a ``foreachBatch`` sink
"""
