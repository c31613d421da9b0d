"""Operator families of the bearly-spark engine.

- ``aggregate``  — reference-parity sum + grouped/cube/rollup aggregations
- ``relational`` — filters, projections, joins (incl. as-of/interval/
  salted), set ops, sort/limit/top-k, key-skew diagnostics
- ``windows``    — window functions (ranking, analytic, running frames)
- ``dedup``      — exact, MinHash-LSH, SimHash, winnowing, n-gram Jaccard
  dedup + connected components (all duplicate-mass invariant)
- ``similarity`` — embedding cosine top-k (brute force, LSH, IVF) +
  embedding near-dup
- ``text``       — token stats, quality scoring, language ID, fingerprints,
  feature-hashed TF embeddings
- ``multimodal`` — binary-payload columns with typed metadata + decode stubs
- ``layout``     — z-order clustering + small-files compaction
"""
