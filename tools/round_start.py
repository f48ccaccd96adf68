#!/usr/bin/env python
"""Round-start step zero, as one command.

A new CORRECTNESS_r{N}.json lands AFTER round N closes, so the
evidence ledger committed at round-N end is stale by round-(N+1)
start and tests/test_entry_contract.py::test_evidence_ledger_is_fresh
is red until it is regenerated (VERDICT r11 "What's wrong" #1).

This script makes the fix structural instead of remembered:

    python tools/round_start.py

1. regenerates docs/EVIDENCE.md + docs/QUERIES.md from the registry
   order and the full CORRECTNESS_r*.json history,
2. runs the entry-contract guard tests (no Spark needed),
3. prints the next driver window (the first 50 registry entries) and
   the evidence-age distribution so the round's rotation plan can be
   sanity-checked against the pinned plan in __spark_entry__.py.

Commit the regenerated docs together with the newly-landed
CORRECTNESS file before any other round work.
"""

from __future__ import annotations

import subprocess
import sys
from collections import Counter

sys.path.insert(0, ".")


def main() -> int:
    print("== round_start: regenerating docs/EVIDENCE.md + docs/QUERIES.md ==")
    rc = subprocess.call([sys.executable, "tools/gen_query_docs.py"])
    if rc != 0:
        print("gen_query_docs.py FAILED", file=sys.stderr)
        return rc

    print("== round_start: entry-contract guards ==")
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_entry_contract.py", "-q"]
    )
    if rc != 0:
        print("entry-contract tests FAILED", file=sys.stderr)
        return rc

    import __spark_entry__ as entry
    from tools.gen_query_docs import driver_history

    names = list(entry.queries())
    hist = driver_history()

    print("== next driver window (first 50 registry entries) ==")
    for i, name in enumerate(names[:50]):
        h = hist.get(name, {})
        print(f"  {i:2d}  {name:42s} last_green=r{h.get('last_green')}")

    ages = Counter(
        f"r{hist[n]['last_green']}" if n in hist and hist[n]["last_green"] else "never"
        for n in names
    )
    print("== evidence-age distribution (last green round) ==")
    for age, n in sorted(ages.items()):
        print(f"  {age:>6s}: {n}")
    print(f"  total registered: {len(names)}")

    # Registry-wide vacuity sweep at the gate SF (VERDICT r14 'Next
    # round' #8): a zero-row oracle result means a green driver row
    # would certify only the empty set — the sweep at every round open
    # keeps that class structurally dead as fixtures evolve. Fails
    # LOUD on any hit (vacuity_sweep exits non-zero with the list).
    # Skip with --no-vacuity when testdata is unavailable.
    if "--no-vacuity" not in sys.argv:
        print("== round_start: vacuity sweep (sf0.01 oracles) ==")
        rc = subprocess.call(
            [sys.executable, "tools/vacuity_sweep.py", "/root/testdata/sf0.01"]
        )
        if rc != 0:
            print("vacuity sweep FAILED — a certified oracle returns "
                  "zero rows at the gate SF", file=sys.stderr)
            return rc
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
