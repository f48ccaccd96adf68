#!/usr/bin/env python
"""Reproducible scale probe for the session-FRAGMENT streaming state
(SCALE.md §r15, streaming/curation.session_fragment_stream).

The sessionization maintainer's claim is that fragments are COMPACTED
state: each micro-batch collapses its events to gap-maximal fragments
before the store sees them, so stored rows ≈ sessions (+ one boundary
fragment per user per batch worst-case), never events. This probe
measures that compression and the serve-side merge cost on the real
testdata at all three SFs:

1. split events into k batch classes (event_id % k — the worst case:
   every user's timeline interleaves across all batches, maximizing
   boundary fragments; the availableNow certificate's 4-file split is
   gentler),
2. count per-class fragments (plans/relational.session_fragments) vs
   events vs final merged sessions (sessions_from_fragments), and
3. assert the merge reproduces events_sessionize row-for-row (the
   gap-closure invariant at probe scale, same as the pinned pytest).

Usage: python tools/scale_probe_session_fragments.py [sf_dir ...]
(defaults to all three /root/testdata SFs; k = 4.)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.plans.relational import (
        events_sessionize,
        session_fragments,
        sessions_from_fragments,
    )
    from hrfco_data_pipeline_spark.session import get_spark
    from hrfco_data_pipeline_spark.sources.tables import load_table

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    k = 4
    spark = get_spark(app_name="scale-probe-session-fragments")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in sf_dirs:
        ev = load_table(spark, sf, "events")
        n_events = ev.count()
        frags = None
        for i in range(k):
            part = session_fragments(ev.filter(F.col("event_id") % k == i))
            frags = part if frags is None else frags.unionByName(part)
        frags = frags.localCheckpoint(eager=True)
        n_frags = frags.count()
        t0 = time.monotonic()
        merged = {
            r.user_id: (r.n_sessions, r.max_session_events)
            for r in sessions_from_fragments(frags).collect()
        }
        merge_s = time.monotonic() - t0
        n_sessions = sum(ns for ns, _ in merged.values())
        batch = {
            r.user_id: (r.n_sessions, r.max_session_events)
            for r in events_sessionize(spark, sf).collect()
        }
        assert merged == batch, f"gap-closure merge mismatch at {sf}"
        print(
            f"{sf}: events={n_events} fragments={n_frags} "
            f"sessions={n_sessions} "
            f"compression={n_events / max(1, n_frags):.1f}x "
            f"frag_overhead={n_frags / max(1, n_sessions):.2f}x "
            f"merge_s={merge_s:.2f} (merge == batch face: OK)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
