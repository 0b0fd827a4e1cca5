#!/bin/bash
# Round-3l measurement queue, ordered by value density in case the
# tunnel returns late in the round (each step leaves its own log, so a
# partial run still lands results):
#  1. kernel exactness (covers the NEW kernels: i8c attention +/- ragged
#     starts, ragged bf16 starts, merged i4, int8 head)
#  2. batch-1 decode with the new latency levers (merge_o int4,
#     int8/int4 head)
#  3. serve table with the direct engine-layout prefill (legacy
#     accounting should gain the ~0.11 s/batch conversion)
#  4. kv8/kv8c at the standard serve shape (ctx 1024 batch 32): the
#     channel-static kernel should win where per-token lost
#  5. kv8 long-context crossover (ctx 4096, batch 16 — r3k retry)
#  6. serving-surface composition smoke (sampling/ragged/stop_early/
#     kv8c through the real jitted loops)
#  7. kernel-level marginals incl. the i8c attention block_b sweep
#  8. fresh headline bench (round-end insurance)
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/ql_kex.log 2>&1
echo KEX_DONE
python -u bench_llm.py > /tmp/ql_b1.log 2>&1
echo B1_DONE
python -u bench_llm.py --serve --engine-only > /tmp/ql_serve.log 2>&1
echo SERVE_DONE
python -u bench_llm.py --serve --kv8 > /tmp/ql_kv8_1k.log 2>&1
echo KV8_1K_DONE
python -u bench_llm.py --serve --kv8 --ctx 4096 --batch 16 > /tmp/ql_kv8.log 2>&1
echo KV8_4K_DONE
python -u tools/engine_smoke_tpu.py > /tmp/ql_smoke.log 2>&1
echo SMOKE_DONE
python -u bench_decode_probe.py > /tmp/ql_probe.log 2>&1
echo PROBE_DONE
python -u bench.py > /tmp/ql_headline.log 2>&1
echo QUEUE_L_DONE
