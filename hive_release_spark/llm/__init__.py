"""LLM-data-pipeline operators (SURVEY.md §2.L; BASELINE.json north star).

Beyond the Hive 2.3 surface, the driver mandates training-data-pipeline
operators designed for 100 TB: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search (brute-force +
LSH-bucketed ANN), text analysis (tokens, quality, lang-ID, fingerprints,
n-grams — Hive precedents: sentences/ngrams/context_ngrams UDAFs), and
multimodal binary columns.

All operators are DataFrame-native: built-in functions where expressible,
Arrow-batched pandas UDFs where not. No collects, no driver-side loops.
"""

from hive_release_spark.llm import dedup, multimodal, similarity, text  # noqa: F401
