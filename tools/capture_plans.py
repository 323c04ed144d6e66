#!/usr/bin/env python
"""Dump raw `.explain("formatted")` output for registry lanes to files.

Usage:
  python tools/capture_plans.py OUT_DIR [--sf=/root/testdata/sf0.1] \
      [--suffix=_before] [lane1 lane2 ...]

Writes OUT_DIR/<lane><suffix>.txt for each named lane (default: every
batch lane). This is the optimization-round evidence format
(plans/r12/<query>_before.txt / _after.txt): the RAW formatted plan,
not the digest-normalized text — the judge reads Exchange counts, join
strategies, PushedFilters and ReadSchema off these files, so they must
be the unmasked truth of the tree at capture time.

Captured at the BENCH SF by default (sf0.1): size-estimate-driven
decisions (broadcast thresholds, AQE) differ by SF, and plan claims in
OPTIMIZATION_r*.md are made against the bench, so the plans must come
from the same data the bench times.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        sys.exit(2)
    out_dir = args[0]
    lanes = args[1:]
    sf_dir = "/root/testdata/sf0.1"
    suffix = ""
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]

    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
    from hadoop_lab_spark.session import get_spark

    load_all_query_modules()
    if not lanes:
        lanes = sorted(
            n for n, s in REGISTRY.items() if "streaming" not in s.tags
        )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    for name in lanes:
        spark.catalog.clearCache()  # same hygiene as pin_plan_digests
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            jvm_mode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
