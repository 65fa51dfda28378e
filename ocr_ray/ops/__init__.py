"""Relational / training-data operations over document corpora.

- analysis: word-frequency learning aggregation (A1), stats (A2-A7),
  top-k (O1), language ID, quality scoring, token counts, fingerprints
- dedup: exact, MinHash-LSH, SimHash, n-gram Jaccard
- similarity: brute-force + bucketed ANN over embedding columns
- multimodal: binary-column decode/resize/frame-sample stage plumbing
- learning_state: learned-words state table, import/export merge modes
"""
