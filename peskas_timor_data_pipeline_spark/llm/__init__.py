"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north star): exact and
fuzzy deduplication, approximate similarity search over embedding columns,
text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.

Design rules for 100 TB:
- hashing is md5-based column expressions (JVM-side, engine-portable) —
  no Python in the per-row path
- candidate generation is always blocked (LSH bands / hyperplane buckets /
  adjacent keys), never all-pairs
- embeddings stay as array<float> columns; math uses higher-order functions
  or generated arithmetic, not UDFs
"""
