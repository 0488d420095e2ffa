"""Sources: how edge tables enter the engine.

- ``gfile``   — the reference's ``.g`` text format (parity loader)
- ``edges``   — canonical edge tables from co-occurrence self-joins
- ``corpus``  — deterministic synthetic source-code repo corpus
- ``planted`` — planted-triangle synthetic graphs (property tests)
"""

from paralleltrianglecounting_spark.sources.edges import (  # noqa: F401
    canonicalize_edges,
    cooccurrence_edges,
    order_chain_graph,
    part_graph,
    supplier_graph,
)
from paralleltrianglecounting_spark.sources.gfile import read_g_file  # noqa: F401
from paralleltrianglecounting_spark.sources.sinks import to_dot, write_g_file  # noqa: F401
from paralleltrianglecounting_spark.sources.iceberg import (  # noqa: F401
    iceberg_session_conf,
    read_corpus,
)
