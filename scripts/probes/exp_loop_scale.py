#!/usr/bin/env python
"""Probe: loop-closure retrieval at 1k+ keyframes (VERDICT r2 item 10).

Measures, as keyframe count K grows:
  * retrieval latency — host numpy set-overlap scoring vs the device
    chunked-MXU path (`backend._retrieval_scores_device`),
  * retrieval precision under perceptual aliasing — queries are jittered
    revisits (descriptor noise + dropout); distractors include ALIASED
    places sharing half their descriptor set with the true place.

Sketches are synthesized directly ((M, D) unit descriptor sets — the
retrieval mechanism's actual input; realism of sketches from rendered
imagery is covered by tests/test_loop_retrieval.py on the corridor
scene). Run: python scripts/probes/exp_loop_scale.py [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def unit(rng, n, d):
    v = rng.normal(size=(n, d)).astype("float32")
    return v / (1e-9 + (v ** 2).sum(1, keepdims=True) ** 0.5)


def jitter(rng, sig, noise=0.04, drop=0.3):
    """A revisit's sketch: same place, viewpoint-jittered descriptors
    (per-component sigma 0.04 over D=32 -> ||noise|| ~0.23 -> cosine
    ~0.975, just above the tau=0.85 match gate like a real re-detection)
    with `drop` of them replaced (a new viewpoint sees some different
    points)."""
    m, d = sig.shape
    out = sig + noise * rng.normal(size=sig.shape).astype("float32")
    out /= 1e-9 + (out ** 2).sum(1, keepdims=True) ** 0.5
    k = int(drop * m)
    idx = rng.choice(m, k, replace=False)
    out[idx] = unit(rng, k, d)
    return out.astype("float32")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--queries", type=int, default=20)
    args = ap.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from denseslam_tpu.models import backend as B

    rng = np.random.default_rng(0)
    M, D = args.m, args.d
    CAP = 2048

    score_dev = jax.jit(lambda q, buf, valid: B._retrieval_scores_device(
        q, buf, valid, chunk=128))

    print(f"platform={jax.default_backend()}  M={M} D={D}")
    for K in (128, 512, 1024, 2048):
        # K places; ALIASED pairs: every 8th place shares half its
        # descriptors with its neighbour (perceptual aliasing)
        sigs = np.stack([unit(rng, M, D) for _ in range(K)])
        for i in range(0, K - 1, 8):
            sigs[i + 1, : M // 2] = sigs[i, : M // 2]

        # device buffer
        buf = jnp.zeros((CAP, M, D), jnp.float32)
        buf = buf.at[:K].set(jnp.asarray(sigs))
        valid = np.zeros(CAP, bool)
        valid[:K] = True
        valid_j = jnp.asarray(valid)

        # --- precision: jittered revisits must retrieve their true place
        top1 = 0
        margins = []
        q_ids = rng.choice(K, args.queries, replace=False)
        for qi in q_ids:
            q = jitter(rng, sigs[qi])
            s = B._retrieval_scores(q, sigs)
            order = np.argsort(-s)
            top1 += int(order[0] == qi)
            rest = s[order[1]] if order[0] == qi else s[qi]
            margins.append(float(s[qi] - rest))

        # --- latency: host vs device (device timed by scalar fetch)
        q = jitter(rng, sigs[0])
        t0 = time.perf_counter()
        for _ in range(3):
            B._retrieval_scores(q, sigs)
        host_ms = (time.perf_counter() - t0) / 3 * 1e3

        qj = jnp.asarray(q)
        float(score_dev(qj, buf, valid_j)[0])          # compile
        t0 = time.perf_counter()
        reps = 10
        for r in range(reps):
            # salt the query: the runtime dedupes identical dispatches
            out = score_dev(qj + jnp.float32(1e-6 * r), buf, valid_j)
            s_dev = np.asarray(out)
        dev_ms = (time.perf_counter() - t0) / reps * 1e3

        # device and host agree on the scored prefix
        agree = np.allclose(s_dev[:K], B._retrieval_scores(q, sigs),
                            atol=1e-3)
        print(f"K={K:5d}  top1={top1}/{args.queries}  "
              f"margin_med={np.median(margins):.3f}  "
              f"host={host_ms:8.1f} ms  device={dev_ms:6.1f} ms  "
              f"agree={agree}")


if __name__ == "__main__":
    main()
