"""Function layers: pure, composable column/DataFrame transforms.

  frames  - gateway frame grammar: tokenize/validate/decode (reference parity)
  hashing - deterministic md5-based 32/64-bit hashes, shingles, minhash bands
  text    - text analysis: stats, language id, token counting, fingerprints
  vectors - embedding math: dot/norm/cosine as JVM-side higher-order functions
"""
