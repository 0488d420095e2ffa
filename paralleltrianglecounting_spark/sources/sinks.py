"""Debug/parity sinks — SURVEY.md §2.1 S8/S9 + the generator's writer.

These are *driver-side, small-graph* formatters, matching their roles in
the reference (DOT dump for eyeballing a toy graph, ``.g`` files as
test fixtures). They deliberately ``collect()``: a 100 TB edge table is
never serialized to a DOT string, and the production sink for edge
tables is plain ``df.write.parquet``/Iceberg. A guard refuses graphs
above ``max_edges`` so nobody points them at the real table by mistake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_MAX = 1_000_000


def _bounded_rows(edges: DataFrame, max_edges: int) -> list:
    rows = edges.select("src", "dst").limit(max_edges + 1).collect()
    if len(rows) > max_edges:
        raise ValueError(
            f"refusing to format > {max_edges} edges driver-side; "
            "use df.write.parquet for real tables"
        )
    return rows


def to_dot(edges: DataFrame, max_edges: int = _DEFAULT_MAX) -> str:
    """Graphviz DOT text for an undirected edge table — the reference's
    ``printDot`` (``sequential_node_it/seq_node_it_v1.cpp:44-57``; sample
    output ``sequential_node_it/graph_example.dot:1-10``): one
    ``u -- v;`` line per canonical edge inside ``graph G { }``."""
    rows = _bounded_rows(edges, max_edges)
    body = "\n".join(f"    {r['src']} -- {r['dst']};" for r in rows)
    return "graph G {\n" + body + ("\n" if body else "") + "}"


def write_g_file(edges: DataFrame, path: str, max_edges: int = _DEFAULT_MAX) -> int:
    """Write the reference's ``.g`` format (header line = vertex count,
    then one ``u v`` line per edge — ``graph_generator/generate_graph.py:27-33``).

    The header is written as the *actual* distinct-vertex count — not a
    requested size — so files written here never reproduce the
    header-vs-contents mismatch of the bundled fixtures (SURVEY.md §1.1).
    Returns the edge count. Round-trips through ``read_g_file``.
    """
    rows = _bounded_rows(edges, max_edges)
    n_vertices = edges.select(
        F.explode(F.array("src", "dst")).alias("v")
    ).distinct().count()
    with open(path, "w") as f:
        f.write(f"{n_vertices}\n")
        for r in rows:
            f.write(f"{r['src']} {r['dst']}\n")
    return len(rows)
