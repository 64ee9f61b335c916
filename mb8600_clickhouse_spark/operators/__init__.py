"""Training-data-pipeline operators (SURVEY.md §2.F).

Each module exposes composable DataFrame -> DataFrame functions built from
Catalyst built-ins wherever semantics allow (JVM-side, codegen'd,
shuffle-aware); Pandas UDFs appear only where built-ins genuinely cannot
express the op (multimodal decode stubs).

- ``dedup``: exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``: cosine top-k (brute force + hyperplane-LSH bucketed)
- ``text``: language-ID, quality scoring, token counting, fingerprinting
- ``multimodal``: binary payload columns + decode/feature plumbing
"""
