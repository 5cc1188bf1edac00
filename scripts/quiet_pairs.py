#!/usr/bin/env python
"""Probe-gated scaling-pair launcher.

Launching scaling batches blind adds noisy-window pairs that deflate the
no-selection paired median (ambient noise is asymmetric: it deflates
more pairs than it inflates — BENCH.md).  This launcher measures the
single-thread matmul probe (the repo's noise thermometer; loadavg is
blind to neighbor-VM bursts) and starts ONE pair only when two probes
3s apart both read quiet; otherwise it sleeps and retries.  Choosing
WHEN to measure is standard benchmarking hygiene — every pair that runs
is still checkpointed and reported, so the no-selection property of the
paired history is untouched.

Usage: python scripts/quiet_pairs.py [max_pairs] [budget_minutes]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GATE_S = 0.45          # launch gate (stricter than the 0.6 quiet tag)
SLEEP_S = 180          # wait between gate checks when noisy


def probe() -> float:
    import numpy as np
    a = np.random.default_rng(1).random((2000, 2000))
    t0 = time.perf_counter()
    (a @ a).sum()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    max_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    budget_s = 60 * (int(sys.argv[2]) if len(sys.argv) > 2 else 150)
    t0 = time.time()
    done = 0
    while done < max_pairs and time.time() - t0 < budget_s:
        p1 = probe()
        time.sleep(3)
        p2 = probe()
        if max(p1, p2) >= GATE_S:
            print(f"gate: noisy ({p1}, {p2}) — sleeping {SLEEP_S}s",
                  flush=True)
            time.sleep(SLEEP_S)
            continue
        print(f"gate: quiet ({p1}, {p2}) — running pair {done + 1}",
              flush=True)
        env = dict(os.environ, SPARK_SCALING_PAIRS="1")
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "bench_scaling.py")],
            env=env, capture_output=True, text=True, timeout=2400)
        tail = [l for l in r.stdout.splitlines() if l.startswith("pair")]
        print((tail or ["(no pair line)"])[-1], flush=True)
        done += 1
    print(f"done: {done} pairs in {round((time.time() - t0) / 60)} min",
          flush=True)


if __name__ == "__main__":
    main()
