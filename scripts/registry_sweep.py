#!/usr/bin/env python
"""Full-registry timing sweep: run EVERY registered queries() entry at a
given scale (default sf0.1 — 10x the correctness-gate scale) and report
per-query wall seconds + row counts, slowest first.

Evidence artifact for the scale story: the driver's bench covers the 61
headline lines; this sweep covers the whole registry, so a query that is
only exercised at sf0.01 by the oracle gate cannot hide a pathological
plan at 10x (the way the pre-fix mm_curate chain did — 100 s at sf0.1
from repeated evaluation of an interpreted profile expression that the
sf0.01 gate wall never surfaced).

Usage: python scripts/registry_sweep.py [--sf-dir DIR] [--out FILE]
       [--only k1,k2,...]
Writes a markdown table (default BENCH/REGISTRY_SWEEP.md) and prints one
JSON line with {query: seconds}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "REGISTRY_SWEEP.md"))
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __spark_entry__ as E
    from graphical_context_extraction_pipeline_spark.session import get_spark

    spark = get_spark(app_name="registry-sweep", cpus=args.cpus)
    qs = E.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    walls: dict[str, float] = {}
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            n = fn(spark, args.sf_dir).count()
            walls[name] = round(time.time() - t0, 3)
            rows[name] = n
        except Exception as exc:  # keep sweeping; report at the end
            walls[name] = round(time.time() - t0, 3)
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"{walls[name]:8.2f}s  {rows.get(name, 'ERR'):>10}  {name}", flush=True)
    total = round(time.time() - t_all, 1)

    ranked = sorted(walls.items(), key=lambda kv: -kv[1])
    with open(args.out, "w") as f:
        f.write(
            "# Full-registry timing sweep\n\n"
            f"Every registered `queries()` entry, one warm-session pass at\n"
            f"`{args.sf_dir}` on local[{args.cpus}] (shared host — single-shot\n"
            "walls; treat <1 s deltas as noise). Slowest first.\n\n"
            f"**{len(walls)} queries, total {total} s, errors: {len(errors)}**\n\n"
            "| query | wall (s) | rows |\n|---|---|---|\n"
        )
        for name, w in ranked:
            f.write(f"| {name} | {w} | {rows.get(name, 'ERROR')} |\n")
        if errors:
            f.write("\n## Errors\n\n")
            for name, msg in errors.items():
                f.write(f"- `{name}`: {msg}\n")
    print(json.dumps({"total_s": total, "n": len(walls), "errors": errors}))


if __name__ == "__main__":
    main()
