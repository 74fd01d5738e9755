"""Operator library — one module per SURVEY.md §2 category.

- :mod:`engine.ops.relational` — projections/filters (P1-P6), joins (J1-J9),
  aggregates (A1-A5), sorts/limits (O1-O2)
- :mod:`engine.ops.dedup`      — keep-first dedup (J4), anti-join/session dedup (J3/ST4)
- :mod:`engine.ops.hashing`    — identity-key concat + keyed obfuscation (F1/F2/F12)
- :mod:`engine.ops.address`    — address scrub/parse/normalize (F3/F4/F5/F9/F10)
- :mod:`engine.ops.geocode`    — two-tier geocode cascade (S5/S6, F7/F8, J9)
- :mod:`engine.ops.avro_codec` — Avro binary encode (S7) without spark-avro
- :mod:`engine.ops.sinks`      — Kinesis-style batched sink (S8)
- :mod:`engine.ops.state`      — JSON watermark/offset store (S4)
"""
