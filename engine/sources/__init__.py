"""Source connectors (SURVEY §2.1 S1-S6, S9).

- :mod:`engine.sources.jdbc`     — incremental JDBC scans (S1/S2) and keyed
  dim lookups (S3) with pushdown-preserving query construction
- :mod:`engine.sources.censuscsv` — census geocoder batch CSV request/response
  codec (S5's wire format, engine-side)
- :mod:`engine.sources.config`    — layered env + YAML run configuration (S9)
"""
