"""Deterministic SF=1-scale testdata generator (lineitem only).

The round sandbox ships driver-generated parquet at sf ≤ 0.1 and no
network (DuckDB's dbgen extension cannot download), so the SF=1 bench
input is synthesized here, distribution-matched to the driver's own
generator (measured on sf0.01/sf0.1):

- lineitem rows   = 6,000,000 × sf
- order keys      = 1,500,000 × sf (uniform hash => lines/order ~ Poisson(4),
                    matching the observed 1..17 distribution, mean 4.07)
- part keys       =   200,000 × sf (uniform hash => ~30 uses/part,
                    observed max ≈ 50 — Poisson tail, matches)

Keys are xxhash64-derived from the row id: fully deterministic, no RNG
state, reproducible on any cluster size. Only the two columns the
part-co-occurrence graph reads are materialized — this is graph-bench
input, not a full TPC-H clone (the driver's tables remain the oracle
substrate at sf ≤ 0.1).

Usage:
    python tools/gen_sf.py [--sf 1.0] [--out /tmp/spark_graft_testdata]

Writes ``<out>/sf<sf>/lineitem.parquet`` and prints one JSON line with
row/key counts. Never writes into /root/testdata (read-only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SEED = 42


def synth_lineitem(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    """Distribution-matched (l_orderkey, l_partkey) pairs at scale ``sf``."""
    rows = int(6_000_000 * sf)
    orders = max(int(1_500_000 * sf), 1)
    parts = max(int(200_000 * sf), 1)
    return spark.range(rows).select(
        F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(orders)).alias("l_orderkey"),
        F.pmod(F.xxhash64(F.lit(seed + 1), "id"), F.lit(parts)).alias("l_partkey"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/spark_graft_testdata")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from paralleltrianglecounting_spark.session import get_spark

    sf_tag = f"{args.sf:g}"
    out_dir = os.path.join(args.out, f"sf{sf_tag}")
    spark = get_spark(app_name=f"gen-sf{sf_tag}", cores=args.cores)
    df = synth_lineitem(spark, args.sf)
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    back = spark.read.parquet(os.path.join(out_dir, "lineitem.parquet"))
    stats = back.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "sf": args.sf,
                "dir": out_dir,
                "rows": stats["rows"],
                "orders": stats["orders"],
                "parts": stats["parts"],
            }
        )
    )


if __name__ == "__main__":
    main()
