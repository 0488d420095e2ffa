"""spark-link-graph: a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query capabilities of the reference
(RiccardoRevalor/ParallelTriangleCounting — exact triangle counting on an
undirected simple graph, 12 native implementations) as idiomatic Spark
DataFrame plans, extended with PageRank, connected components, label
propagation, and a large-scale training-data toolkit (dedup, similarity
search, text analysis, multimodal plumbing).

Layout
------
- ``session``    SparkSession factory tuned for link-graph workloads
- ``sources``    edge/corpus sources: ``.g`` parity loader, co-occurrence
                 edge derivation, deterministic synthetic repo corpus
- ``operators``  the engine: degrees, orientation, adjacency, triangles
                 (join + CSR/Arrow paths), pagerank, components, labelprop,
                 dedup, similarity, text, multimodal
- ``plans``      superstep runner (checkpoint/metrics/resume), plan linting
- ``functions``  shared column expressions (canonical edges, hashes)
- ``streaming``  Structured Streaming edge ingestion and windowed stats
"""

__version__ = "0.1.0"
