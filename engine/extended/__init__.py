"""Scale-oriented LLM-training-data operators (BASELINE.json north star).

Beyond the reference's own catalog, the engine ships the operations a 100 TB
training-data pipeline needs, each designed shuffle-light:

- :mod:`engine.extended.text`       — language-ID, quality scoring, token
  counting, fingerprinting (pure built-in expressions, codegen-friendly)
- :mod:`engine.extended.dedup`      — exact, MinHash+LSH, SimHash, n-gram
  Jaccard, embedding-cosine near-dup
- :mod:`engine.extended.similarity` — brute-force + LSH-bucketed cosine top-k
- :mod:`engine.extended.multimodal` — opaque-binary media columns with typed
  metadata; decode/feature steps as mapInPandas seams (stubbed backends)
"""
