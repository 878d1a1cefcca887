#!/usr/bin/env python
"""Sustained-scale gate: re-run the shapes with the WORST recorded 16x
ratios (SCALE.md) at a higher multiplier every round, so a superlinear
regression in exactly the plans closest to the line can't land silently.

The 16x sweep is a breadth instrument; this gate is the depth
instrument. A linear plan's time ratio at Nx is well under N on a
many-core machine (fixed overheads amortize, and local[32] saturates);
the gate fails when ratio > N, i.e. when doubling the data more than
doubles the time — the unambiguous superlinear signal.

Usage: python tools/scale_gate.py [multiplier] [sf_dir]
Defaults: 96x over /root/testdata/sf0.1, the three watch-list shapes
(raised from 48x in round 6 — the watch shapes held linear for two
rounds at 48x).
Exit 0 = all ratios within the linear bound; 1 = regression (printed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# the watch list: worst 16x ratios in SCALE.md's sweep (pack ~2.4-4.6,
# star components ~3.0, Q21 ~3.4) — the shapes nearest the bound.
# Round-7 split (r6 verdict item 3): the pair-listing shapes' output is
# Θ(Σk²) BY CONSTRUCTION on id-offset-scaled data (every doc gains N-1
# exact twins), so as their wall-clock ratio approaches the bound,
# output volume can mask a genuine plan regression. Each such shape now
# has a COMPUTE-ONLY twin with linear output (candidate-pair COUNTS /
# bucket-star edges — identical corpus-sized compute, see
# functions/dedup.lsh_candidate_stats and minhash_star_edges); the gate
# RECORDS both ratios but the exit criterion applies only to the
# compute-only members.
GATED = [
    "pack_documents",
    "tpch_q21_grouped_exists",
    "minhash_candidate_stats",          # compute-only twin of minhash_dedup
    "dedup_components_star_linear",     # compute-only twin of the star shape
    # round-12 promotion (r11 verdict item 8): the r11 crawl layer was
    # 16x-swept only — the three hottest 100 TB crawl shapes are now
    # regression-bounded like the older ones
    "warc_record_parse",
    "outlink_domain_mix",
    "robots_decision",
]
RECORD_ONLY = [
    "dedup_components_star",            # output-bound: ratio reported, not gated
]
WATCH = GATED + RECORD_ONLY


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "scale_check.py"), str(n), sf_dir, *WATCH]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    sys.stderr.write(proc.stderr[-2000:])
    summary = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if "results" in d:
                summary = d
            else:
                print(line, flush=True)
    if proc.returncode != 0 or summary is None:
        print(f"SCALE-GATE: scale_check failed (rc={proc.returncode})")
        return 1
    bad = {
        name: r
        for name, r in summary["results"].items()
        if name in GATED and r["ratio"] > r["linear_bound"]
    }
    if bad:
        print(f"SCALE-GATE: FAIL — superlinear at {n}x: {json.dumps(bad)}")
        return 1
    missing = [w for w in WATCH if w not in summary["results"]]
    if missing:
        print(f"SCALE-GATE: FAIL — watch shapes did not run: {missing}")
        return 1
    info = {
        name: r["ratio"]
        for name, r in summary["results"].items()
        if name in RECORD_ONLY
    }
    print(
        f"SCALE-GATE: OK — {len(GATED)} gated shapes linear at {n}x; "
        f"output-bound shapes recorded (not gated): {json.dumps(info)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
