#!/usr/bin/env python
"""Plot per-frame dense-map memory curves (reference: scripts/memoryDraw.py
:12-45 — the figure comparing baseline / decay / slide-window /
decay+slide-window memory*.txt series).

Usage: python scripts/memory_draw.py out.png memory_a.txt [memory_b.txt ...]
"""

import os
import sys


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    out = sys.argv[1]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 4.5))
    for path in sys.argv[2:]:
        with open(path) as f:
            # values in units of 100 MB, one line per frame (the reference's
            # memory.txt convention, DenseSLAMGUI.cpp:589-595)
            vals = [float(l) for l in f if l.strip()]
        label = os.path.splitext(os.path.basename(path))[0]
        plt.plot(range(len(vals)), [v * 100 for v in vals], label=label)
    plt.xlabel("frame")
    plt.ylabel("dense map memory (MB)")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(out, dpi=130)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
