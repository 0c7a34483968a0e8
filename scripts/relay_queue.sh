#!/bin/bash
# Round-4 TPU bench queue: run these IN ORDER, EXCLUSIVELY (no concurrent
# heavy CPU jobs — the 1-core host pollutes timings; never overlap two
# relay compiles) the moment a relay is back (watch /tmp/RELAY_UP or run
# `timeout 120 python -c "import jax; print(jax.devices())"`).
#
# Each step states its done-condition from VERDICT round 3.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1) headline metric -> BENCH_r04 substrate (driver runs bench.py itself,
#    this is the early sanity copy).
timeout 1800 python bench.py > /tmp/q_bench.json 2>/tmp/q_bench.log

# 2) full table at HEAD, f32 + bf16 -> COMMIT BENCH_FULL*.json
#    (substantiates README eval<=35ms / beam>=240caps/s at HEAD).
timeout 5400 python bench_full.py > BENCH_FULL.json.tmp 2>/tmp/q_bf_f32.log \
  && mv BENCH_FULL.json.tmp BENCH_FULL.json
BENCH_DTYPE=bfloat16 timeout 5400 python bench_full.py \
  > BENCH_FULL_bfloat16.json.tmp 2>/tmp/q_bf_bf16.log \
  && mv BENCH_FULL_bfloat16.json.tmp BENCH_FULL_bfloat16.json

# 3) LSTM beam with the fused kernel on/off (round-3 kernel, never timed
#    on chip).
timeout 3600 python scripts/bench_beam_scanned.py --decoder lstm \
  > /tmp/q_beam_lstm.json 2>/tmp/q_beam_lstm.log
timeout 3600 python scripts/bench_beam_scanned.py --decoder lstm --kernel off \
  > /tmp/q_beam_lstm_xla.json 2>/tmp/q_beam_lstm_xla.log

# 4) measured encoder floor (replaces the analytic VPU-share argument).
timeout 7200 python scripts/bench_encoder_floor.py \
  > /tmp/q_enc_floor.json 2>/tmp/q_enc_floor.log

# 5) optimizer-update isolation (fused clip+adam lever).
timeout 3600 python scripts/bench_opt_update.py \
  > /tmp/q_opt.json 2>/tmp/q_opt.log

# 6) train-step decomposition with the rbg PRNG (dropout share was 1.9 ms
#    under threefry).
timeout 5400 python scripts/bench_train_parts.py \
  > /tmp/q_parts.json 2>/tmp/q_parts.log

# 7) fine-tune one real step (AOT red cell close-out on the new libtpu).
#    bench_full already times it; check its tf_train_finetune row.

echo "QUEUE DONE rc=$?" >&2
