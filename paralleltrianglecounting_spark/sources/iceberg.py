"""Iceberg-first corpus reader — the production input per BASELINE.json
``input_hint``: an Iceberg table of source-code repositories
``(repo, path, commit, lang, content)``.

This sandbox ships no Iceberg runtime jar, so resolution is layered and
each layer is the same DataFrame downstream (every operator is
source-agnostic — they take an edge table or a corpus DataFrame):

1. catalog table name (``spark.read.table``) — the real deployment,
   where the session is configured with an Iceberg catalog (see
   ``iceberg_session_conf``); partition pruning and column pruning
   push into Iceberg's metadata layer (manifest/file skipping);
2. ``format("iceberg")`` on a warehouse path — same engine, path-based;
3. parquet directory fallback — the sandbox path (what
   ``/root/testdata`` and the synthetic corpus writer produce).

The corpus schema is validated on every path: the engine refuses a
source missing the contract columns rather than silently computing
nonsense edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def iceberg_session_conf(
    catalog: str = "corpus_cat", warehouse: str = "/data/warehouse"
) -> dict[str, str]:
    """The session conf a real deployment passes to ``get_spark``
    (``extra_conf=iceberg_session_conf(...)``). Requires the
    iceberg-spark-runtime jar on the cluster (absent in this sandbox —
    conf is inert without it, which is why it is not set by default)."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def _validate(df: DataFrame, source: str) -> DataFrame:
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus source {source!r} is missing contract columns {missing}; "
            f"expected {CORPUS_COLUMNS} (BASELINE.json input_hint)"
        )
    return df


def read_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Load the repo-files corpus from ``source``: an Iceberg catalog
    table name (contains no '/'), an Iceberg warehouse path, or a
    parquet directory. Returns the validated corpus DataFrame."""
    errors = []
    if "/" not in source:
        df = None
        try:
            df = spark.read.table(source)
        except Exception as e:  # table not found / no catalog configured
            errors.append(f"table: {e.__class__.__name__}")
        if df is not None:
            # validate OUTSIDE the except: a reachable table with a broken
            # schema must surface the explicit missing-columns error, not
            # be misreported as "could not load" (ADVICE r01)
            return _validate(df, source)
        # a slash-free name may still be a relative parquet directory
        try:
            return _validate(spark.read.parquet(source), source)
        except ValueError:
            raise
        except Exception as e:
            errors.append(f"parquet: {e.__class__.__name__}")
    else:
        try:
            return _validate(spark.read.format("iceberg").load(source), source)
        except ValueError:
            raise
        except Exception as e:  # no iceberg runtime in this sandbox
            errors.append(f"iceberg: {e.__class__.__name__}")
        try:
            return _validate(spark.read.parquet(source), source)
        except ValueError:
            raise
        except Exception as e:
            errors.append(f"parquet: {e.__class__.__name__}")
    raise ValueError(f"could not load corpus from {source!r} ({'; '.join(errors)})")
