"""Local simulation of the round driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()`` twin on
DuckDB over the same parquet, compare row count, schema (column names),
and an order-insensitive value hash. Run: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from paralleltrianglecounting_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):8d} spark={t_spark:6.1f}s (rows-only, no oracle)")
            continue
        t0 = time.monotonic()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t_duck = time.monotonic() - t0
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_vals = (
            value_hash(srows, scols) == value_hash(orows, ocols)
            if ok_rows and ok_schema
            else False
        )
        status = "OK " if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"schema={'=' if ok_schema else f'{scols} vs {ocols}'} vals={'=' if ok_vals else 'X'} "
            f"spark={t_spark:5.1f}s duck={t_duck:5.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_rows and ok_schema:
                # show a sample diff
                s = {tuple(_norm(v) for v in r) for r in srows}
                o = {tuple(_norm(v) for v in r) for r in orows}
                print("  spark-only:", sorted(s - o)[:3])
                print("  duck-only: ", sorted(o - s)[:3])
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
