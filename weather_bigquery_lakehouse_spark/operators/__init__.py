"""Relational + extension operators.

star_schema — dim/fact builders (the reference's gold-layer semantics)
dedup       — exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup
similarity  — brute-force + LSH-bucketed cosine top-k over embeddings
text        — tokenization, language-ID, quality score, fingerprints
multimodal  — binary-column plumbing with Pandas-UDF decode stages
"""

from .star_schema import build_dim_distinct, build_dim_conformed, build_fact
