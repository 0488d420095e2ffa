"""Attack the 8→32-core wall with data-width, not hope (VERDICT r03 #6).

Hypothesis under test: the flagship's 8→32 efficiency collapse on this
one-socket host is memory-bandwidth saturation. If so, (a) halving the
dominant payload (int32 neighbor arrays vs long) should move absolute
time but NOT restore 8→32 scaling (the bus is the bus, whatever the
byte width), and (b) the flagship's achieved bytes/s at 32 cores should
sit near the machine's practical bandwidth ceiling.

Three measurements, each in a fresh JVM / fresh processes:

1. STREAM-like triad bound: P worker processes each running
   a = b + s*c over arrays far larger than LLC, aggregate bytes/s at
   P ∈ {1, 8, 32}. This is the machine's practical ceiling and shows
   how far from linear the BANDWIDTH itself scales 8→32.
2. Flagship triangle_count on the replicated 19.1 M-edge graph at
   {8, 32} cores × {int32, long} payloads (compact_ids forced), JIT
   warmup + best-of-reps, exact counts asserted equal.
3. Shuffle-volume model: the intersect plan moves ~I = Σ d⁺(v)·deg(v)
   neighbor elements through the sort-merge join; achieved bytes/s =
   I × width / t compared to the triad bound.

Writes BENCH/width_sweep.json. Run:
    python tools/width_sweep.py [--copies 16] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _triad_worker(n: int, iters: int, ready, start, q) -> None:
    import numpy as np

    b = np.random.default_rng(0).random(n)
    c = np.random.default_rng(1).random(n)
    a = np.empty(n)
    # touch everything before timing (first-touch faults + JIT the ufuncs)
    np.add(b, c, out=a)
    np.multiply(c, 3.0, out=a)
    ready.release()
    start.wait()  # barrier: every worker times the SAME contention window
    t0 = time.monotonic()
    for _ in range(iters):
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)  # a = b + 3c, two passes (numpy has no fused triad)
    dt = time.monotonic() - t0
    # bytes per iter: multiply reads c writes a (2n), add reads a,b writes a (3n)
    q.put((5.0 * 8 * n * iters, dt))


def triad_bound(workers: int, mib_per_worker: int = 256, iters: int = 16) -> dict:
    """Aggregate GiB/s = total bytes / max(per-worker loop time), NOT the
    parent's wall: setup (fork + RNG generation + first-touch faulting of
    the arrays) costs ~10 s per worker on this host and would swamp the
    ~2-5 s measured loop by 5-50x — exactly the bug the first run of this
    tool shipped (0.2 GiB/s at 1 worker vs the true ~14)."""
    n = mib_per_worker * 1024 * 1024 // 8
    q: mp.Queue = mp.Queue()
    ready = mp.Semaphore(0)
    start = mp.Event()
    ps = [
        mp.Process(target=_triad_worker, args=(n, iters, ready, start, q))
        for _ in range(workers)
    ]
    for p in ps:
        p.start()
    for _ in ps:
        ready.acquire()
    start.set()
    rows = [q.get() for _ in ps]
    for p in ps:
        p.join()
    total_bytes = sum(r[0] for r in rows)
    slowest = max(r[1] for r in rows)
    return {
        "workers": workers,
        "gib_per_sec": round(total_bytes / slowest / 2**30, 1),
        "loop_sec_max": round(slowest, 2),
        "loop_sec_min": round(min(r[1] for r in rows), 2),
    }


_CHILD = """\
import json, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir, cores, copies, reps, compact = (
    sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]),
    sys.argv[6] == "int32",
)
from paralleltrianglecounting_spark.session import get_spark
from paralleltrianglecounting_spark.sources.edges import part_graph, replicated
from paralleltrianglecounting_spark.operators.triangles import (
    strategy_cost_estimate, triangle_count,
)
spark = get_spark(app_name=f"width-{cores}-{compact}", cores=cores)
base = part_graph(spark, sf_dir).persist(); base.count()
big = replicated(base, copies, offset=1 << 25).persist()
n_edges = big.count()
est = strategy_cost_estimate(big)
triangle_count(big, compact_ids=compact).collect()  # JIT warmup x2
triangle_count(big, compact_ids=compact).collect()
raw, best, tri = [], None, None
for _ in range(reps):
    t0 = time.monotonic()
    tri = triangle_count(big, compact_ids=compact).collect()[0]["triangles"]
    dt = time.monotonic() - t0
    raw.append(round(dt, 3))
    best = dt if best is None else min(best, dt)
width = 4 if compact else 8
print("WIDTHROW " + json.dumps({
    "cores": cores, "width": "int32" if compact else "long",
    "edges": n_edges, "triangles": tri, "best_sec": round(best, 3),
    "raw": raw, "intersect_elems": est["intersect_elems"],
    "payload_gib": round(est["intersect_elems"] * width / 2**30, 2),
    "achieved_gib_per_sec": round(est["intersect_elems"] * width / best / 2**30, 2),
    "edges_per_sec": round(n_edges / best, 1),
}))
"""


def run_config(sf_dir: str, cores: int, copies: int, reps: int, width: str) -> dict:
    time.sleep(15)  # cooldown: back-to-back JVMs measure ~1.8x slow
    out = subprocess.run(
        [
            sys.executable, "-c", _CHILD, REPO, sf_dir,
            str(cores), str(copies), str(reps), width,
        ],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return next(
        json.loads(ln[len("WIDTHROW "):])
        for ln in out.stdout.splitlines()
        if ln.startswith("WIDTHROW ")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    out: dict = {"triad": [], "flagship": []}
    for w in (1, 8, 32):
        row = triad_bound(w)
        out["triad"].append(row)
        print("triad", json.dumps(row), flush=True)
    t8 = next(r for r in out["triad"] if r["workers"] == 8)["gib_per_sec"]
    t32 = next(r for r in out["triad"] if r["workers"] == 32)["gib_per_sec"]
    out["triad_8_to_32_bandwidth_scaling"] = round(t32 / t8 / 4.0, 3)

    for cores in (8, 32):
        for width in ("int32", "long"):
            row = run_config(args.sf_dir, cores, args.copies, args.reps, width)
            out["flagship"].append(row)
            print("flagship", json.dumps(row), flush=True)

    def _get(cores, width):
        return next(
            r for r in out["flagship"]
            if r["cores"] == cores and r["width"] == width
        )

    tris = {r["triangles"] for r in out["flagship"]}
    out["triangles_match"] = len(tris) == 1
    for width in ("int32", "long"):
        lo, hi = _get(8, width), _get(32, width)
        out[f"eff_8_to_32_{width}"] = round(
            lo["best_sec"] / hi["best_sec"] / 4.0, 3
        )
    for cores in (8, 32):
        i, l8 = _get(cores, "int32"), _get(cores, "long")
        out[f"long_over_int32_{cores}c"] = round(
            l8["best_sec"] / i["best_sec"], 2
        )
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/width_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k not in ("triad", "flagship")}))


if __name__ == "__main__":
    main()
