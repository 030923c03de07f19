#!/usr/bin/env python
"""Run the fusion-bench lever matrix on the real TPU and print a table.

Each variant runs in a FRESH subprocess (the remote runtime dedupes
identical dispatches and congested compiles poison in-process timings —
see .claude/skills/verify/SKILL.md). Variants:

  default    pallas tile-sampler + bf16 pool storage (bench.py default)
  gather+f32 the original XLA-gather / f32 configuration
  pallas+f32 sampler lever alone
  gather+bf16 storage lever alone
  nocolor    fuse_color off (on top of the default)

Usage: python scripts/bench_matrix.py [--quick]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..")

VARIANTS = {
    "default": [],
    "gather+f32": ["--sampler", "gather", "--storage", "float32"],
    "pallas+f32": ["--storage", "float32"],
    "gather+bf16": ["--sampler", "gather"],
    "nocolor": ["--no_color"],
}


def main() -> None:
    results = {}
    for name, flags in VARIANTS.items():
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")] + flags,
            capture_output=True, text=True, timeout=3000)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not line:
            results[name] = dict(error=p.stderr.strip()[-300:])
            print(f"{name:14s} FAILED ({time.time()-t0:.0f}s)")
            continue
        r = json.loads(line[-1])
        results[name] = r
        print(f"{name:14s} {r['value']:8.2f} {r['unit']}  "
              f"(vs_baseline {r['vs_baseline']:.2f}, {time.time()-t0:.0f}s)")
    with open(os.path.join(ROOT, "bench_matrix.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("-> bench_matrix.json")


if __name__ == "__main__":
    main()
