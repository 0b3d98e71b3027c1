"""Operator library: each module maps to a SURVEY.md §2 operator family.

- ``query``      Q1-Q6: filter/project/limit, count(*), PK ops, iterator
- ``search``     V1/V2/V5/V6: brute-force ANN top-k, pre-filter, grouping,
                 sparse dot-product
- ``fusion``     V3/V4/V8: RRF + weighted hybrid fusion
- ``bm25``       V7: BM25 corpus stats + full-text search
- ``dml``        S1-S4: insert / upsert / partial update / delete-by-filter
- ``dedup``      training-pipeline dedup: exact, MinHash-LSH, SimHash,
                 n-gram Jaccard, embedding-cosine
- ``textquality`` language-ID, quality scoring, token counts, fingerprints
- ``ann_index``  IVF (KMeans-centroid) approximate index: build + probe
- ``partitions`` T1-T4: partition routing / pruning helpers
"""
