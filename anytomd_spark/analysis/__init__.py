"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard), similarity search (brute-force cosine top-k, LSH-bucketed ANN),
text analysis (language ID, quality scores, token counts, fingerprints),
and multimodal column plumbing.

Everything stays JVM-side (built-in pyspark.sql.functions inside
whole-stage codegen) except the explicitly-marked Arrow-batched kernels.
"""
