#!/bin/bash
# Round-3n queue: flash-prefill + flash-attention long-context validation.
#  1. kernel exactness incl. the new flash decode-attention rows
#  2. flash prefill on-chip A/B (tokens + cache equality vs einsum path)
#  3. kv8/kv4 long-context crossover (ctx 4096 batch 16) — third attempt,
#     now with the flash prefill
#  4. continuous batching with a larger chunk (host-sync amortization)
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/qn_kex.log 2>&1
echo KEX_DONE
python -u tools/verify_flash_prefill_tpu.py > /tmp/qn_fp.log 2>&1
echo FP_DONE
python -u bench_llm.py --serve --kv8 --ctx 4096 --batch 16 > /tmp/qn_kv8.log 2>&1
echo KV8_4K_DONE
python -u bench_llm.py --continuous > /tmp/qn_cont.log 2>&1
echo QUEUE_N_DONE
