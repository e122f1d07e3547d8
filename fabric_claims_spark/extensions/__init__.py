"""Training-data pipeline extensions (BASELINE.json north star):
dedup (exact / MinHash-LSH / SimHash / Jaccard), similarity search,
text analysis, multimodal column plumbing — all shuffle-aware for
100 TB (blocked joins, broadcast centroids, no global sorts)."""
