"""Deterministic synthetic source-code repository corpus — the
production-shaped input table from BASELINE.json's ``input_hint``:
``(repo: string, path: string, commit: string, lang: string,
content: string)``, Iceberg in production, parquet here (the sandbox has
no Iceberg jar; the reader falls back transparently).

Design requirements it satisfies:
- **fully distributed generation**: built from ``spark.range`` with every
  column a pure function of (seed, row id) via xxhash64 — no driver-side
  RNG, no collect, any scale;
- **shared path pool** so distinct repos co-occur on common paths (the
  edge signal), with a few hub paths (README.md, Makefile, ...) touched
  by many repos to create the degree skew the engine must handle;
- **per-row invariant**: ``sha256(content)`` is a pure function of
  (repo, path), stable across any repartition/rewrite — the content
  integrity check demanded by the input_hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HUB_PATHS = ["README.md", "Makefile", "LICENSE", ".gitignore"]
EXT_LANG = {"py": "python", "cpp": "cpp", "cu": "cuda", "md": "markdown", "rs": "rust"}
_EXTS = list(EXT_LANG)

_WORDS = [
    "scan", "join", "merge", "sort", "hash", "agg", "filter", "window",
    "batch", "stream", "vector", "column", "row", "key", "value", "query",
]


def repo_files(
    spark: SparkSession,
    n_repos: int = 50,
    files_per_repo: int = 8,
    path_pool: int = 60,
    hub_every: int = 1,
    seed: int = 42,
) -> DataFrame:
    """The synthetic corpus: ``n_repos * (files_per_repo + |hubs|)`` rows.

    Every repo gets ``files_per_repo`` paths drawn from a shared pool of
    ``path_pool`` module paths (co-occurrence signal) plus the hub paths
    (skew signal). Deterministic for a given (seed, sizes).
    """
    rows = spark.range(n_repos * files_per_repo)
    h = lambda k: F.abs(F.xxhash64(F.lit(seed), F.lit(k), F.col("id")))  # noqa: E731
    base = rows.select(
        (F.col("id") % n_repos).alias("rid"),
        (h(1) % path_pool).alias("pid"),
        (h(2) % len(_EXTS)).alias("eid"),
    )
    ext = _ext_expr(F.col("eid"))
    regular = base.select(
        F.concat(F.lit("org"), (F.col("rid") % 37).cast("string"),
                 F.lit("/repo"), F.col("rid").cast("string")).alias("repo"),
        F.concat(F.lit("src/module"), (F.col("pid") % 12).cast("string"),
                 F.lit("/file"), F.col("pid").cast("string"),
                 F.lit("."), ext).alias("path"),
    )
    hubs = (
        spark.range(n_repos)
        .select(
            F.concat(F.lit("org"), (F.col("id") % 37).cast("string"),
                     F.lit("/repo"), F.col("id").cast("string")).alias("repo"),
            F.explode(F.array(*[F.lit(p) for p in HUB_PATHS[: max(1, hub_every)]])).alias("path"),
        )
    )
    all_files = regular.unionByName(hubs).distinct()
    content = _content_expr(F.col("repo"), F.col("path"), seed)
    return all_files.select(
        "repo",
        "path",
        # sha1-shaped commit id, pure function of (repo, path, seed)
        F.substring(F.sha2(F.concat_ws("|", F.lit(seed), "repo", "path"), 256), 1, 40).alias("commit"),
        _lang_expr(F.col("path")).alias("lang"),
        content.alias("content"),
    )


def _ext_expr(eid):
    expr = F.lit(_EXTS[0])
    for i, e in enumerate(_EXTS[1:], start=1):
        expr = F.when(eid == i, F.lit(e)).otherwise(expr)
    return expr


def _lang_expr(path):
    ext = F.element_at(F.split(path, r"\."), -1)
    expr = F.lit("text")
    for e, lang in EXT_LANG.items():
        expr = F.when(ext == e, F.lit(lang)).otherwise(expr)
    return expr


def _content_expr(repo, path, seed: int):
    """Deterministic pseudo-code text seeded by (repo, path): 24 words
    selected by xxhash64 — pure column expression, identical on every
    regeneration (the sha256(content) invariant's foundation)."""
    words = F.array(*[F.lit(w) for w in _WORDS])
    picks = F.transform(
        F.sequence(F.lit(0), F.lit(23)),
        lambda i: F.element_at(
            words,
            (F.pmod(F.xxhash64(F.lit(seed), repo, path, i), F.lit(len(_WORDS))) + 1).cast("int"),
        ),
    )
    return F.concat_ws(" ", picks)


def with_content_sha(df: DataFrame) -> DataFrame:
    """Attach the per-row invariant column (input_hint contract)."""
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def repo_cooccurrence_edges(corpus: DataFrame, on: str = "path") -> DataFrame:
    """The production edge derivation: vertices = xxhash64(repo), edge
    between two repos sharing a ``path`` (or ``commit``), canonical
    src<dst + distinct — the reference generator's (min,max)+set-dedup
    semantics over co-occurrence (SURVEY.md §1.4). Hub paths are capped
    by the caller via cooccurrence_edges(max_container_size=...)."""
    from paralleltrianglecounting_spark.sources.edges import cooccurrence_edges

    keyed = corpus.select(F.col(on).alias("_c"), F.xxhash64("repo").alias("_e"))
    return cooccurrence_edges(keyed, "_c", "_e")
