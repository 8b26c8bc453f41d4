"""Web-scale training-data pipeline operators over the `documents` /
`embeddings` tables: dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search, text analysis, multimodal plumbing.

Everything here is built from JVM-side ``pyspark.sql.functions`` so the
plans stay inside whole-stage codegen; the only Python on the hot path is
Arrow-batched pandas UDFs (multimodal decode stubs).
"""
