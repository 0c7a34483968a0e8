#!/bin/bash
# Round-5b queue: one-cell decode kernel A/B on the live relay.
# Run EXCLUSIVELY (1-core host; never overlap relay compiles).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
Q=artifacts/r05_queue

# Greedy eval, transformer, bf16 streams (covers f32 rows' decode share too).
TPU_CAPTIONER_DECODE_ONECELL=1 timeout 3000 python scripts/bench_eval_scanned.py \
  --decoder transformer --dtype bfloat16 \
  > $Q/q_onecell_eval_1.json 2> $Q/q_onecell_eval_1.log
TPU_CAPTIONER_DECODE_ONECELL=0 timeout 3000 python scripts/bench_eval_scanned.py \
  --decoder transformer --dtype bfloat16 \
  > $Q/q_onecell_eval_0.json 2> $Q/q_onecell_eval_0.log

# Beam-5 batched, transformer (R=160 -> 5 row tiles x 6 layers today).
TPU_CAPTIONER_DECODE_ONECELL=1 timeout 3600 python scripts/bench_beam_scanned.py \
  --dtype bfloat16 \
  > $Q/q_onecell_beam_1.json 2> $Q/q_onecell_beam_1.log
TPU_CAPTIONER_DECODE_ONECELL=0 timeout 3600 python scripts/bench_beam_scanned.py \
  --dtype bfloat16 \
  > $Q/q_onecell_beam_0.json 2> $Q/q_onecell_beam_0.log

echo "R05B QUEUE DONE" >&2
