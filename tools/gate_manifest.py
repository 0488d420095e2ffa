"""Regenerate the manifest of gates that have appeared in any driver
``CORRECTNESS_r*.json`` artifact, and report which contract queries the
driver has therefore never value-checked.

The driver's per-round correctness window covers only the first ~50
entries of ``__spark_entry__.queries()``; ``_ordered_queries`` rotates
never-driver-checked gates to the front so each round's window adds new
driver evidence. Run after a new CORRECTNESS artifact lands:

    python tools/gate_manifest.py          # report
    python tools/gate_manifest.py --emit   # print the frozenset literal
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")


def checked_gates() -> dict[str, list[str]]:
    seen: dict[str, list[str]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = path.split("_")[1].split(".")[0]
        for k in json.load(open(path)):
            seen.setdefault(k, []).append(rnd)
    return seen


def main() -> None:
    import __spark_entry__ as entrymod

    seen = checked_gates()
    qs = list(entrymod.queries().keys())
    never = [q for q in qs if q not in seen]
    if "--emit" in sys.argv:
        names = sorted(seen)
        print("_DRIVER_CHECKED = frozenset({")
        for n in names:
            print(f'    "{n}",')
        print("})")
        return
    print(f"contract queries: {len(qs)}")
    print(f"driver-checked ever: {len([q for q in qs if q in seen])}")
    print(f"never driver-checked: {len(never)}")
    window = qs[:50]
    fresh = [q for q in window if q not in seen]
    print(f"next window (first 50): {len(fresh)} would be fresh evidence")
    for q in never:
        marker = "WINDOW" if q in window else ""
        print(f"  {q} {marker}")


if __name__ == "__main__":
    main()
