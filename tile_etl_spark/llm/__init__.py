"""LLM-data-pipeline operators (SURVEY §2B 'LLM-data-pipeline
extensions'): deduplication (exact, MinHash/LSH, SimHash, n-gram
Jaccard, embedding cosine), similarity search, text analysis, and
multimodal binary columns — each designed shuffle-first for 100 TB.
"""
