#!/usr/bin/env python
"""Re-pin bench_reference.json from a round-of-record bench_detail.json.

Usage:
  python tools/pin_bench_reference.py <label> [detail_path] [out_path]

Run ONCE per round, after the driver's BENCH_r{N}.json lands, with the
detail file of that run (default: the committed bench_detail.json).
Writes bench_reference.json — the per-lane medians bench.py compares
every subsequent run against (trimmed-mean canary ratio bridges hosts;
common-lane ratio is the primary cross-round metric).

The canary list is fixed here, not in the detail file: 9 lanes spanning
the plan families (scan-agg, scan-local text, salted window agg,
multi-join, LSH band join, banded self-join + verify, iterative graph,
percentile window, checkpoint-iterative CC). Change it only with a
PERFORMANCE.md note — the trimmed mean needs >= 3 usable canaries and
loses its outlier protection below ~6.

dedup_clusters joined in r9 (VERDICT r8 #2): the r8 driver record's
budget breach was this exact lane swinging 1.48x with host disk/GC
state while the 8 CPU-bound canaries read 0.98 — checkpoint-heavy
lanes need a representative in the bridge. Note the trim drops the
single highest ratio, so ONE family canary cannot steer the scalar
bridge when it diverges alone; its job is the SPREAD warning bench.py
emits (a family-skewed window is flagged in the record) and pin-to-pin
bridging when the whole host moved. PERFORMANCE.md r9 has the
adjudication.
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
    "dedup_clusters",
]


#: Documented per-lane tail bands (r12): lanes whose ADJUDICATED
#: same-code swing exceeds the global 2x tail threshold get their own
#: band here, carried into every pin; bench.py's tail rule uses
#: max(TAIL_RATIO, band). dedup_clusters: nine host-parity same-day
#: r12 reads spanned 0.94-2.01x its pin across full-bench,
#: prefix-replay (repeats 3 AND 5) and a GC-instrumented probe, with
#: the r10-era code reading INSIDE the same distribution (7.10 s
#: in-sweep via a time-machine worktree) and per-run GC at 0.1-0.2 s —
#: a host-epoch profile shift on a scheduler-overhead-bound iterative
#: lane, not code (BASELINE.md "r12 adjudication of dedup_clusters").
#: Band = one notch above the observed noise tail; a real regression
#: (this repo's history: 3-10x) still flags.
WIDE_BAND_LANES = {"dedup_clusters": 2.2}


def _trimmed_mean_bridge(new_q: dict, old_ref: dict) -> float | None:
    """The SAME trimmed-mean canary computation bench.py applies
    (bench.py:_trimmed_mean_ratio): ratio of the NEW pin's medians to
    the PREVIOUS pin's, so the unit conversion between budgets is the
    number a bench run on the new-pin host would have read as its
    canary_ratio against the old pin."""
    old_q = old_ref.get("queries", {})
    ratios = sorted(
        new_q[n] / old_q[n]
        for n in old_ref.get("canaries", [])
        if n in new_q and old_q.get(n)
    )
    if len(ratios) < 3:
        return None
    trimmed = ratios[1:-1]
    return round(sum(trimmed) / len(trimmed), 3)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(
            "usage: pin_bench_reference.py <label> [detail_path] [out_path]"
            " [--budget-seed=S]"
        )
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seed = None
    for a in sys.argv[1:]:
        if a.startswith("--budget-seed="):
            seed = float(a.split("=", 1)[1])
    label = args[0]
    detail_path = args[1] if len(args) > 1 else os.path.join(REPO, "bench_detail.json")
    detail = json.load(open(detail_path))
    if detail.get("sf") != 0.1:
        sys.exit(f"refusing to pin a non-sf0.1 record (sf={detail.get('sf')})")
    queries = {k: v["median"] for k, v in sorted(detail["queries"].items())}
    missing = [c for c in CANARIES if c not in queries]
    if missing:
        sys.exit(f"canaries missing from detail: {missing}")

    # Machine-recorded budget provenance (VERDICT r7 #3): each re-pin
    # rebases what "normalized s/q" means, so the conversion chain must
    # be data, not BASELINE.md prose. The previous pin carries its own
    # budget; the new budget = old budget x measured canary bridge
    # (host-speed unit conversion, NOT a budget raise), and the chain
    # accumulates one auditable entry per pin.
    ref_path = args[2] if len(args) > 2 else os.path.join(REPO, "bench_reference.json")
    prev, bridge, budget, chain = None, None, None, []
    try:
        prev = json.load(open(ref_path))
    except (OSError, json.JSONDecodeError):
        prev = None
    if prev:
        bridge = _trimmed_mean_bridge(queries, prev)
        prev_budget = prev.get("budget_normalized_spq", seed)
        chain = list(prev.get("budget_chain", []))
        if prev_budget is None:
            sys.exit(
                "previous pin has no budget_normalized_spq; pass "
                "--budget-seed=<old-unit budget> once to start the chain"
            )
        if bridge is None:
            sys.exit("cannot compute canary bridge vs previous pin")
        # 4-decimal links (r9): round(x, 2) silently TIGHTENED the unit
        # conversion ~0.5% per re-pin (0.8245->0.82 at r8, 0.8036->0.80
        # at r9 — compounding, always downward when bridges hover just
        # under 1.0), until the r9 round figure "breached" by less than
        # the accumulated rounding. The budget is a COMMITMENT in old
        # units; the chain must convert it faithfully, not re-quantize
        # it per link. BASELINE.md "r9 budget-chain precision".
        budget = round(prev_budget * bridge, 4)
        chain.append(
            {
                "from_label": prev.get("label"),
                "from_budget_spq": prev_budget,
                "canary_bridge": bridge,
                "to_budget_spq": budget,
            }
        )
    elif seed is not None:
        # ADVICE r8: a fresh pin (no previous reference) used to IGNORE
        # --budget-seed and write budget=null — misleading, since the
        # usage text says the seed "starts the chain". Seed the budget
        # directly: the seed IS in the new pin's units (there is no
        # previous pin to bridge from), recorded as a bridge-1.0 entry
        # so the chain's arithmetic invariant (to = from x bridge)
        # holds from the first link.
        budget = round(seed, 2)
        chain = [
            {
                "from_label": None,
                "from_budget_spq": budget,
                "canary_bridge": 1.0,
                "to_budget_spq": budget,
            }
        ]
    out = {
        "label": label,
        "source": os.path.basename(detail_path),
        "sf": 0.1,
        "total_median_sec": detail["total_median_sec"],
        "canaries": CANARIES,
        "wide_band_lanes": WIDE_BAND_LANES,
        "queries": queries,
        "previous_pin_label": prev.get("label") if prev else None,
        "canary_bridge_vs_previous_pin": bridge,
        "budget_normalized_spq": budget,
        "budget_chain": chain,
    }
    json.dump(out, open(ref_path, "w"), indent=1, sort_keys=True)
    print(
        f"pinned {len(queries)} lane medians -> {ref_path} ({label}); "
        f"bridge={bridge} budget={budget} s/q"
    )


if __name__ == "__main__":
    main()
