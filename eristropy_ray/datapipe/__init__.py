"""Large-scale training-data pipeline operators (net-new vs the reference):
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + IVF), text analysis (language
ID, quality, tokens, fingerprints) and multimodal binary-column plumbing.
"""
