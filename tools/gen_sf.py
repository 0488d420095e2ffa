"""Deterministic SF-scale testdata generator — ALL ten contract tables.

The round sandbox ships driver-generated parquet at sf ≤ 0.1 and no
network, so larger tiers are synthesized here, schema-identical to the
driver tables and distribution-matched where the distribution matters
(measured on sf0.01/sf0.1):

- lineitem rows = 6,000,000 × sf over 1,500,000 × sf order keys and
  200,000 × sf part keys (uniform hash ⇒ lines/order ~ Poisson(4),
  ~30 uses/part — matches the observed 1..17 / ≈50-max tails);
- events: 1,000,000 × sf rows, 15,000 × sf users, 5 uniform event
  types, 30 days of µs-granular timestamps (the funnel / session /
  as-of gates need sub-second ordering);
- documents: 500,000 × sf/10 rows of ~15–60-word texts over the
  driver's ~28-word vocabulary, en-heavy lang mix, plus ~0.16% exact
  duplicate pairs (the dedup gates need real dupes);
- embeddings: 20,000 × sf rows, 64-dim float32, 10 label clusters
  (center-plus-noise — the IVF/PQ/ANN gates need cluster structure);
- orders/customer/supplier/part/region/nation: TPC-H-ish columns with
  the driver's value domains (Brand#n, 5 priorities, 2-dp money, ...).

Everything is xxhash64-derived from the row id: fully deterministic,
no RNG state, reproducible at any parallelism. The exact VALUES need
not (and cannot) byte-match the driver's own generator — every
correctness gate compares Spark against DuckDB over the SAME parquet,
so any deterministic data works; matching the SHAPES keeps every gate
engaged (dupes found, funnels converting, clusters separable).

Usage:
    python tools/gen_sf.py [--sf 1.0] [--out /tmp/spark_graft_testdata]
        [--tables lineitem,events,...]

Writes ``<out>/sf<sf>/<table>.parquet`` and prints one JSON line with
row counts. Never writes into /root/testdata (read-only).
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

VOCAB = [
    "spark", "batch", "part", "line", "column", "order", "small", "big",
    "sort", "fast", "slow", "value", "scan", "hash", "group", "agg",
    "filter", "query", "key", "window", "row", "table", "stream",
    "merge", "data", "vector", "join", "customer", "a",
]
LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
P_ADJ = ["large", "small", "hot", "cold", "blue", "red", "dim", "shiny"]
P_NOUN = ["ring", "bolt", "gear", "case", "tube", "disk", "plate", "wire"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]

EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01 UTC
EPOCH_1995_US = 788_918_400_000_000  # 1995-01-01 UTC
DAY_US = 86_400_000_000


def _h(seed: int, *cols):
    return F.xxhash64(F.lit(seed), *cols)


def _pm(seed: int, mod: int, *cols):
    return F.pmod(_h(seed, *cols), F.lit(mod))


def _pick(values: list[str], seed: int, *cols):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_pm(seed, len(values), *cols) + 1).cast("int"))


def synth_lineitem(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    """Distribution-matched lineitem at scale ``sf`` — the graph source
    columns keep their historical (seed, seed+1) hash streams so the
    derived co-occurrence graph is bit-identical to earlier rounds'
    lineitem-only tiers."""
    rows = int(6_000_000 * sf)
    orders = max(int(1_500_000 * sf), 1)
    parts = max(int(200_000 * sf), 1)
    supps = max(int(10_000 * sf), 1)
    return spark.range(rows).select(
        F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(orders)).alias("l_orderkey"),
        F.pmod(F.xxhash64(F.lit(seed + 1), "id"), F.lit(parts)).alias("l_partkey"),
        _pm(seed + 2, supps, "id").alias("l_suppkey"),
        (_pm(seed + 3, 7, "id") + 1).cast("int").alias("l_linenumber"),
        (_pm(seed + 4, 50, "id") + 1).cast("double").alias("l_quantity"),
        (_pm(seed + 5, 9_500_000, "id") / 100.0 + 900.0).alias("l_extendedprice"),
        (_pm(seed + 6, 11, "id") / 100.0).alias("l_discount"),
        (_pm(seed + 7, 9, "id") / 100.0).alias("l_tax"),
        _pick(["N", "A", "R"], seed + 8, "id").alias("l_returnflag"),
        _pick(["O", "F"], seed + 9, "id").alias("l_linestatus"),
        F.timestamp_micros(
            F.lit(EPOCH_1995_US) + _pm(seed + 10, 2500, "id") * DAY_US
        ).alias("l_shipdate"),
    )


def synth_orders(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    rows = max(int(1_500_000 * sf), 1)
    custs = max(int(150_000 * sf), 1)
    return spark.range(rows).select(
        F.col("id").alias("o_orderkey"),
        _pm(seed + 20, custs, "id").alias("o_custkey"),
        _pick(["O", "F", "P"], seed + 21, "id").alias("o_orderstatus"),
        (_pm(seed + 22, 45_000_000, "id") / 100.0 + 900.0).alias("o_totalprice"),
        F.timestamp_micros(
            F.lit(EPOCH_1995_US) + _pm(seed + 23, 2400, "id") * DAY_US
        ).alias("o_orderdate"),
        _pick(PRIORITIES, seed + 24, "id").alias("o_orderpriority"),
    )


def synth_customer(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    rows = max(int(150_000 * sf), 1)
    return spark.range(rows).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        _pm(seed + 30, 25, "id").cast("int").alias("c_nationkey"),
        (_pm(seed + 31, 999_900, "id") / 100.0).alias("c_acctbal"),
        _pick(SEGMENTS, seed + 32, "id").alias("c_mktsegment"),
    )


def synth_supplier(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    rows = max(int(10_000 * sf), 1)
    return spark.range(rows).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        _pm(seed + 40, 25, "id").cast("int").alias("s_nationkey"),
        (_pm(seed + 41, 999_900, "id") / 100.0).alias("s_acctbal"),
    )


def synth_part(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    rows = max(int(200_000 * sf), 1)
    return spark.range(rows).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(
            " ", _pick(P_ADJ, seed + 50, "id"), _pick(P_NOUN, seed + 51, "id")
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"), (_pm(seed + 52, 50, "id") + 1).cast("string")
        ).alias("p_brand"),
        _pick(P_TYPES, seed + 53, "id").alias("p_type"),
        (_pm(seed + 54, 50, "id") + 1).cast("int").alias("p_size"),
        (_pm(seed + 55, 200_000, "id") / 100.0 + 900.0).alias("p_retailprice"),
    )


def synth_events(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    rows = max(int(1_000_000 * sf), 1)
    users = max(int(15_000 * sf), 1)
    return spark.range(rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(EPOCH_2024_US) + _pm(seed + 60, 30 * DAY_US, "id")
        ).alias("ts"),
        _pm(seed + 61, users, "id").alias("user_id"),
        _pick(EVENT_TYPES, seed + 62, "id").alias("event_type"),
        (_pm(seed + 63, 56_022, "id") / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '), _pm(seed + 64, 100, "id").cast("string"), F.lit("}")
        ).alias("props"),
    )


def synth_documents(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    """~15–60-word texts over the driver vocabulary; every 625th doc is
    an exact duplicate of its predecessor (≈0.16% dupes, the sf0.1
    rate) so the dedup/cluster gates stay engaged at scale."""
    rows = max(int(50_000 * sf), 2)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    # text derives from tid, which aliases duplicate pairs together
    tid = F.when(
        (F.col("id") % 625 == 624) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    n_words = _pm(seed + 70, 46, tid) + 15
    words = F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(F.lit(seed + 71), tid, i), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    text = F.array_join(words, " ")
    return spark.range(rows).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        _pick(LANGS, seed + 72, "id").alias("lang"),
        F.concat(F.lit("src"), _pm(seed + 73, 20, "id").cast("string")).alias(
            "source"
        ),
        F.length(text).alias("n_chars"),
    )


def synth_embeddings(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    """64-dim float32 vectors in 10 deterministic clusters: per-label
    center in [-1, 1] plus ±0.2 per-row noise — separable enough that
    IVF recall and PQ quantization gates measure something real."""
    rows = max(int(20_000 * sf), 10)
    dims = 64
    label = _pm(seed + 80, 10, "id")
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dims)),
        lambda d: (
            (F.pmod(F.xxhash64(F.lit(seed + 81), label, d), F.lit(2001)) - 1000)
            / 1000.0
            + (F.pmod(F.xxhash64(F.lit(seed + 82), F.col("id"), d), F.lit(401)) - 200)
            / 1000.0
        ).cast("float"),
    )
    return spark.range(rows).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        label.cast("int").alias("label"),
    )


def synth_region(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    names = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)],
        "r_regionkey int, r_name string",
    )


def synth_nation(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


GENERATORS = {
    "lineitem": synth_lineitem,
    "orders": synth_orders,
    "customer": synth_customer,
    "supplier": synth_supplier,
    "part": synth_part,
    "events": synth_events,
    "documents": synth_documents,
    "embeddings": synth_embeddings,
    "region": synth_region,
    "nation": synth_nation,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/spark_graft_testdata")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--tables",
        default=",".join(GENERATORS),
        help="comma-separated subset of: " + ",".join(GENERATORS),
    )
    args = ap.parse_args()

    from paralleltrianglecounting_spark.session import get_spark

    sf_tag = f"{args.sf:g}"
    out_dir = os.path.join(args.out, f"sf{sf_tag}")
    spark = get_spark(app_name=f"gen-sf{sf_tag}", cores=args.cores)
    counts = {}
    for name in args.tables.split(","):
        name = name.strip()
        df = GENERATORS[name](spark, args.sf)
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    print(json.dumps({"sf": args.sf, "dir": out_dir, "rows": counts}))


if __name__ == "__main__":
    main()
