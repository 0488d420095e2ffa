"""Driver contract for the spark-link-graph engine.

``entry(spark)``      — flagship: exact triangle count on the sf0.001
                        part co-occurrence graph.
``queries()``         — one entry per implemented operator (SURVEY.md §2
                        + north-star extensions). Each callable takes
                        (spark, sf_dir) and returns a DataFrame.
``oracle_sql()``      — DuckDB-runnable ANSI SQL equivalents over the
                        same parquet tables. Keys without an oracle are
                        non-SQL-expressible (iterative-to-convergence or
                        approximate/hash-randomized operators); they get
                        the driver's rows-only check and are instead
                        oracle-tested in tests/ against NumPy/exact
                        baselines.

The canonical benchmark graph: **parts co-occurring in an order**
(vertices = l_partkey, edge iff two parts share an l_orderkey) — the
testdata analog of the production repo↔path co-occurrence graph from
BASELINE.json's input_hint. Canonicalization src<dst + distinct mirrors
the reference generator (graph_generator/generate_graph.py:22-31).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.components import connected_components
from paralleltrianglecounting_spark.operators.degrees import degrees as _degrees
from paralleltrianglecounting_spark.operators.labelprop import label_propagation
from paralleltrianglecounting_spark.operators.pagerank import pagerank
from paralleltrianglecounting_spark.operators.triangles import (
    clustering_coefficient,
    triangle_count,
    triangles_per_vertex,
)
from paralleltrianglecounting_spark.sources.edges import part_graph

# ---------------------------------------------------------------------------
# shared SQL prelude: the part co-occurrence graph in DuckDB terms
# ---------------------------------------------------------------------------

_EDGES_CTE = """
pairs AS (
  SELECT DISTINCT l_orderkey AS c, l_partkey AS e FROM lineitem
),
edges AS (
  SELECT DISTINCT a.e AS src, b.e AS dst
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.e < b.e
),
bidir AS (
  SELECT src AS u, dst AS v FROM edges
  UNION ALL
  SELECT dst AS u, src AS v FROM edges
),
deg AS (
  SELECT u AS v, count(*) AS degree FROM bidir GROUP BY u
),
verts AS (
  SELECT v FROM deg
)
""".strip()

_TRI_CTE = """
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e1.dst = e2.src
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
""".strip()

PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85
LPA_ITERS = 3
ROUND = 6


def _pagerank_oracle_sql() -> str:
    """Power iteration unrolled to PAGERANK_ITERS chained CTEs."""
    d = PAGERANK_DAMPING
    ctes = [
        _EDGES_CTE,
        "n AS (SELECT count(*) AS cnt FROM verts)",
        "pr0 AS (SELECT v, 1.0 / (SELECT cnt FROM n) AS rank FROM verts)",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT b.v AS v,
         (1.0 - {d}) / (SELECT cnt FROM n) + {d} * sum(p.rank / dg.degree) AS rank
  FROM bidir b
  JOIN pr{i - 1} p ON b.u = p.v
  JOIN deg dg ON dg.v = p.v
  GROUP BY b.v
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS vertex, round(rank, {ROUND}) AS rank_r FROM pr{PAGERANK_ITERS}"
    )


def _lpa_oracle_sql() -> str:
    """Synchronous LPA unrolled to LPA_ITERS steps; most-frequent
    neighbor label, ties -> min label (row_number over (cnt DESC, label))."""
    ctes = [_EDGES_CTE, "lbl0 AS (SELECT v, v AS label FROM verts)"]
    for i in range(1, LPA_ITERS + 1):
        ctes.append(
            f"""cnt{i} AS (
  SELECT b.v AS v, l.label AS label, count(*) AS c
  FROM bidir b JOIN lbl{i - 1} l ON b.u = l.v
  GROUP BY b.v, l.label
),
lbl{i} AS (
  SELECT v, label FROM (
    SELECT v, label,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, label ASC) AS rn
    FROM cnt{i}
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS vertex, label FROM lbl{LPA_ITERS}"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return part_graph(spark, sf_dir)


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _degrees(part_graph(spark, sf_dir))


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(part_graph(spark, sf_dir), strategy="intersect")


def _q_triangle_count_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(part_graph(spark, sf_dir), strategy="csr")


def _q_triangle_count_wedge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(part_graph(spark, sf_dir), strategy="wedge")


def _q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangles_per_vertex(part_graph(spark, sf_dir))


def _q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering_coefficient(part_graph(spark, sf_dir)).select(
        "vertex", F.round("coeff", ROUND).alias("coeff_r")
    )


def _q_wedge_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _degrees(part_graph(spark, sf_dir)).agg(
        F.sum(F.expr("degree * (degree - 1) div 2")).alias("wedges")
    )


def _q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return connected_components(part_graph(spark, sf_dir))


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = pagerank(
        part_graph(spark, sf_dir), damping=PAGERANK_DAMPING, iterations=PAGERANK_ITERS
    )
    return pr.select("vertex", F.round("rank", ROUND).alias("rank_r"))


def _q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_propagation(part_graph(spark, sf_dir), iterations=LPA_ITERS)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_triangle_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edges_part_graph": _q_edges,
        "degrees": _q_degrees,
        "triangle_count": _q_triangle_count,
        "triangle_count_csr": _q_triangle_count_csr,
        "triangle_count_wedge": _q_triangle_count_wedge,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "clustering_coefficient": _q_clustering_coefficient,
        "wedge_count": _q_wedge_count,
        "connected_components": _q_connected_components,
        "pagerank": _q_pagerank,
        "label_propagation": _q_label_propagation,
    }


def oracle_sql() -> dict[str, str]:
    tri_sql = (
        f"WITH {_EDGES_CTE},\n{_TRI_CTE}\nSELECT count(*) AS triangles FROM tri"
    )
    return {
        "edges_part_graph": f"WITH {_EDGES_CTE}\nSELECT src, dst FROM edges",
        "degrees": f"WITH {_EDGES_CTE}\nSELECT v AS vertex, degree FROM deg",
        "triangle_count": tri_sql,
        "triangle_count_csr": tri_sql,
        "triangle_count_wedge": tri_sql,
        "triangles_per_vertex": f"""WITH {_EDGES_CTE},
{_TRI_CTE},
corners AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
per_v AS (SELECT v, count(*) AS cnt FROM corners GROUP BY v)
SELECT verts.v AS vertex, coalesce(per_v.cnt, 0) AS triangles
FROM verts LEFT JOIN per_v ON verts.v = per_v.v""",
        "clustering_coefficient": f"""WITH {_EDGES_CTE},
{_TRI_CTE},
corners AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
per_v AS (SELECT v, count(*) AS cnt FROM corners GROUP BY v)
SELECT deg.v AS vertex,
       round(CASE WHEN deg.degree >= 2
             THEN 2.0 * coalesce(per_v.cnt, 0) / (deg.degree * (deg.degree - 1))
             ELSE 0.0 END, {ROUND}) AS coeff_r
FROM deg LEFT JOIN per_v ON deg.v = per_v.v""",
        "wedge_count": f"""WITH {_EDGES_CTE}
SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS wedges FROM deg""",
        "connected_components": f"""WITH RECURSIVE {_EDGES_CTE},
cc(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT b.v, cc.l FROM cc JOIN bidir b ON b.u = cc.v WHERE cc.l < b.v
)
SELECT v AS vertex, min(l) AS component FROM cc GROUP BY v""",
        "pagerank": _pagerank_oracle_sql(),
        "label_propagation": _lpa_oracle_sql(),
    }
