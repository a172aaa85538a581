"""Text-pipeline operators for large-scale training-data curation.

These extend the reference's relational/string surface (SURVEY.md §2.3) with
the operations a 100 TB document pipeline needs: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard), language ID, quality scoring, token
counting, and document fingerprinting. Everything is built-in Column algebra
(JVM-side, whole-stage codegen) — no Python UDFs in any hot path.
"""
