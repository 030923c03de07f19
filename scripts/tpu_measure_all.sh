#!/usr/bin/env bash
# One-shot TPU measurement queue (run when the chip is healthy):
#   1. tiny-op health check
#   2. pallas tile-sampler exactness + timing vs gather
#   3. fusion bench lever matrix (base/pallas/bf16/both/nocolor)
#   4. full-pipeline bench
#   5. BA-per-window bench
# Each step is a fresh process (compile congestion + dispatch dedupe — see
# .claude/skills/verify/SKILL.md). Appends everything to one log.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_measure_all.log}
{
  echo "=== $(date) health ==="
  timeout 300 python - <<'EOF'
import jax, time
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
f = jax.jit(lambda x: x + 1.0)
f(jnp.float32(0)).block_until_ready()
ts = []
for i in range(20):
    t0 = time.perf_counter()
    f(jnp.float32(i)).block_until_ready()
    ts.append((time.perf_counter() - t0) * 1e3)
ts.sort()
print("tiny-op block_until_ready median ms:", round(ts[10], 3))
EOF
  echo "=== $(date) pallas sampler probe ==="
  timeout 1200 python scripts/profile_pallas_sampler.py
  echo "=== $(date) bench matrix ==="
  timeout 3000 python scripts/bench_matrix.py
  echo "=== $(date) bench_full ==="
  timeout 3000 python scripts/bench_full.py
  echo "=== $(date) bench_full kf4 (reference-rate keyframes) ==="
  timeout 3000 python scripts/bench_full.py --keyframe_every 4
  echo "=== $(date) bench_ba ==="
  timeout 1200 python scripts/bench_ba.py
  echo "=== $(date) long drive (full-system validation: ATE/RPE/depth) ==="
  timeout 5400 python scripts/long_drive_eval.py \
    --json results_long_drive.json --out RESULTS.md
  echo "=== $(date) DONE ==="
} >> "$LOG" 2>&1
