"""Beyond-reference large-scale training-data operators.

The reference has no data-pipeline operator surface (SURVEY.md §2.11);
these are the additions a 100 TB training-data pipeline needs, each a
DataFrame-in → DataFrame-out operator designed for horizontal scale:

- ``dedup``      — exact, MinHash+LSH banding, SimHash, n-gram Jaccard
- ``similarity`` — brute-force cosine top-k + LSH-bucketed ANN
- ``text``       — language-ID, quality scoring, token counting,
                   document fingerprinting
- ``multimodal`` — binary payload columns + Pandas-UDF decode plumbing
- ``contract``   — queries()/oracle_sql() entries for the driver gate
"""
