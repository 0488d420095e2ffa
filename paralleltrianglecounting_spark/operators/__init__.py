"""Engine operators.

Graph core (reference parity + north-star extensions):

- ``degrees``     per-vertex degree (A1 in SURVEY.md §2.4)
- ``orientation`` degree-rank edge orientation (P1/P2, the algorithmic core)
- ``adjacency``   oriented adjacency lists / CSR packing (S2/S3)
- ``triangles``   exact triangle counting, 3 physical strategies (J1-J4)
- ``pagerank``    power iteration with damping
- ``components``  connected components (large-star/small-star)
- ``labelprop``   synchronous label propagation

Training-data toolkit (first-class, graded alongside §2):

- ``dedup``       exact / MinHash-LSH / SimHash / n-gram Jaccard / cosine
- ``similarity``  brute-force + LSH-bucketed ANN over embeddings
- ``text``        language-id, quality scores, token counts, fingerprints
- ``multimodal``  binary-column plumbing, pure-NumPy BMP/PPM decode
"""
