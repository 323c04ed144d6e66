#!/usr/bin/env python
"""Re-pin bench_reference.json from a round-of-record bench_detail.json.

Usage:
  python tools/pin_bench_reference.py <label> [detail_path] [out_path]

Run ONCE per round, after the driver's BENCH_r{N}.json lands, with the
detail file of that run (default: the committed bench_detail.json).
Writes bench_reference.json — the per-lane medians bench.py compares
every subsequent run against (trimmed-mean canary ratio bridges hosts;
common-lane ratio is the primary cross-round metric).

The canary list is fixed here, not in the detail file: 8 lanes spanning
the plan families (scan-agg, scan-local text, salted window agg,
multi-join, LSH band join, banded self-join + verify, iterative graph,
percentile window). Change it only with a PERFORMANCE.md note — the
trimmed mean needs >= 3 usable canaries and loses its outlier
protection below ~6.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CANARIES = [
    "wordcount",
    "doc_fingerprints",
    "salted_collect_types_per_user",
    "q2_min_cost_supplier",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "pagerank_weighted_handoff",
    "exact_percentiles_per_priority",
]


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: pin_bench_reference.py <label> [detail_path]")
    label = sys.argv[1]
    detail_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "bench_detail.json")
    detail = json.load(open(detail_path))
    if detail.get("sf") != 0.1:
        sys.exit(f"refusing to pin a non-sf0.1 record (sf={detail.get('sf')})")
    queries = {k: v["median"] for k, v in sorted(detail["queries"].items())}
    missing = [c for c in CANARIES if c not in queries]
    if missing:
        sys.exit(f"canaries missing from detail: {missing}")
    out = {
        "label": label,
        "source": os.path.basename(detail_path),
        "sf": 0.1,
        "total_median_sec": detail["total_median_sec"],
        "canaries": CANARIES,
        "queries": queries,
    }
    ref_path = (
        sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "bench_reference.json")
    )
    json.dump(out, open(ref_path, "w"), indent=1, sort_keys=True)
    print(f"pinned {len(queries)} lane medians -> {ref_path} ({label})")


if __name__ == "__main__":
    main()
