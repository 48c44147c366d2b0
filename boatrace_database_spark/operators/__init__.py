"""Large-scale training-data-pipeline operators (BASELINE.json north star):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search
over embeddings, text analysis, multimodal column plumbing, as-of joins.

All hot paths stay JVM-side (built-in functions, higher-order array
functions, xxhash64); Python appears only in Arrow-batched kernels.
"""
