#!/bin/bash
# Round-5c queue: fine-tune stage-scan unroll A/B (shipping configs).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
Q=artifacts/r05_queue

# f32 shipping: pallas34off + plain remat, XLA dw-grad (defaults).
timeout 3000 python scripts/bench_finetune_ab.py pallas34off \
  > $Q/q_ft_unroll1_f32.log 2>&1
TPU_CAPTIONER_STAGE_UNROLL=2 timeout 3000 python scripts/bench_finetune_ab.py pallas34off \
  > $Q/q_ft_unroll2_f32.log 2>&1

# bf16 shipping: pallas34off + save_mlp_in.
BENCH_DTYPE=bfloat16 timeout 3000 python scripts/bench_finetune_ab.py pallas34off-savemlp \
  > $Q/q_ft_unroll1_bf16.log 2>&1
BENCH_DTYPE=bfloat16 TPU_CAPTIONER_STAGE_UNROLL=2 timeout 3000 python scripts/bench_finetune_ab.py pallas34off-savemlp \
  > $Q/q_ft_unroll2_bf16.log 2>&1

echo "R05C QUEUE DONE" >&2
