"""Operator families of the bearly-spark engine.

- ``aggregate``  — reference-parity sum + grouped/cube/rollup aggregations
- ``relational`` — filters, projections, joins, set ops, sort/limit/top-k
- ``windows``    — window functions (ranking, analytic, running frames)
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard dedup
- ``similarity`` — embedding cosine top-k (brute force + LSH ANN)
- ``text``       — token stats, quality scoring, language ID, fingerprints
- ``multimodal`` — binary-payload columns with typed metadata + decode stubs
"""
