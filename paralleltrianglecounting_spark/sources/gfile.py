"""Loader for the reference's ``.g`` edge-list text format.

Format (``/root/reference/utils/utils.cpp:16-37``, generator
``graph_generator/generate_graph.py:27-33``):

- line 1: a declared vertex count ``N``
- each following line: ``u v`` — one undirected edge, space-separated
  0-indexed integer ids, already canonicalized ``u < v`` and deduped by
  the generator.

The declared header is **not trustworthy** — ``graph_11.g`` declares 11
vertices but contains id 11 (12 distinct), ``graph_10k.g`` declares
10,000 but only 9,972 appear (SURVEY.md §1.1). The reference's
matrix loader trusts it and writes out of bounds; this loader therefore
derives the vertex set from the edges and exposes the header only as
metadata.

Kept purely for reference-parity tests; production edges come from
table co-occurrence (``sources.edges``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)


def read_g_file(spark: SparkSession, path: str) -> DataFrame:
    """Read a ``.g`` file into a canonical edge DataFrame [src, dst].

    - skips the header line (single integer — identified by having one
      field, so multi-line headers or missing headers also parse);
    - canonicalizes ``src < dst`` and dedups (defensive: the bundled
      files are already canonical, arbitrary files may not be);
    - drops self-loops (a simple graph has none; the reference generator
      never emits them but real data can).

    The plan is a single text scan → split → filter → distinct; the
    distinct is a hash aggregate that Spark executes partial+final.
    """
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    edges = (
        raw.select(parts.alias("p"))
        .where((F.size("p") >= 2) & (F.col("p")[1] != ""))
        .select(
            # try_cast: ANSI mode (Spark 4 default) makes plain cast THROW
            # on non-numeric tokens; malformed lines must filter out as null
            F.col("p")[0].try_cast("long").alias("u"),
            F.col("p")[1].try_cast("long").alias("v"),
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .select(
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
        )
        .distinct()
    )
    return edges


def declared_vertex_count(spark: SparkSession, path: str) -> int:
    """The (untrusted) header value, exposed for parity diagnostics only."""
    first = spark.read.text(path).limit(1).collect()
    return int(first[0]["value"].strip().split()[0])
