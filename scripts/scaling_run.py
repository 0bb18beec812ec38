#!/usr/bin/env python
"""N vs 4N cluster-size scaling measurement on one box.

Cluster size N  = 1 executor  × 8 cores (taskset 0-7), full corpus.
Cluster size 4N = 4 executors × 8 cores (taskset 0-7 / 8-15 / 16-23 / 24-31),
each a separate JVM + Python worker pool processing a crc32 shard of the
corpus CONCURRENTLY — the single-box emulation of adding executor nodes
(the extraction job is shuffle-free, so a real cluster adds no coordination
stages that this emulation would miss).

throughput = corpus_docs / wall;  wall(4N) = max over executors.
efficiency = (throughput_4N / throughput_N) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXEC = os.path.join(REPO, "scripts", "scaling_executor.py")
CORES = ["0-7", "8-15", "16-23", "24-31"]


def _run(cores: str, cpus: int, shard: int, n_shards: int, sf_dir: str) -> subprocess.Popen:
    return subprocess.Popen(
        ["taskset", "-c", cores, sys.executable, EXEC, str(cpus), str(shard), str(n_shards), sf_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def _json_line(p: subprocess.Popen) -> dict:
    out, _ = p.communicate()
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    # level N: one executor, full corpus
    n_level = _json_line(_run(CORES[0], 8, 0, 1, sf_dir))

    # level 4N: four executors concurrently, sharded corpus
    procs = [_run(CORES[i], 8, i, 4, sf_dir) for i in range(4)]
    shards = [_json_line(p) for p in procs]
    total_docs = sum(s["n_docs"] for s in shards)
    wall_4n = max(s["wall_s"] for s in shards)

    thr_n = n_level["n_docs"] / n_level["wall_s"]
    thr_4n = total_docs / wall_4n
    eff = (thr_4n / thr_n) / 4.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH baseline — extraction throughput & cluster-size scaling\n\n"
            "N vs 4N executors emulated as separate pinned JVMs (one executor =\n"
            "local[8] on a dedicated 8-core set with its own Python worker pool);\n"
            "4N = four such executors running CONCURRENTLY on disjoint core sets,\n"
            "each processing a crc32 shard of the same sf0.1 corpus. The extraction\n"
            "job is shuffle-free, so executor-count scaling has no coordination\n"
            "stage this emulation would miss. Best-of-3 timed runs after warmup.\n\n"
            "| cluster | executors × cores | docs | wall (s) | docs/sec |\n|---|---|---|---|---|\n"
            f"| N | 1 × 8 | {n_level['n_docs']} | {n_level['wall_s']} | {thr_n:.1f} |\n"
            f"| 4N | 4 × 8 | {total_docs} | {wall_4n} | {thr_4n:.1f} |\n\n"
            f"Per-executor shard walls at 4N: {[s['wall_s'] for s in shards]} s "
            f"(docs per shard: {[s['n_docs'] for s in shards]})\n\n"
            f"**Scaling efficiency** = ({thr_4n:.1f} / {thr_n:.1f}) / 4 = **{eff:.3f}** "
            f"(target ≥ 0.8)\n"
        )
    print(
        json.dumps(
            {
                "n_level": n_level,
                "shards": shards,
                "throughput_n": round(thr_n, 2),
                "throughput_4n": round(thr_4n, 2),
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
