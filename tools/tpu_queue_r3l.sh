#!/bin/bash
# Round-3l: (1) refresh kernel exactness for the c1e5d18 kernels
# (merged i4 o+MLP, int8 lm_head), (2) batch-1 decode with the new
# latency levers (merge_o int4, int8/int4 head), (3) serve table with
# the direct engine-layout prefill (legacy accounting should gain the
# ~0.11 s/batch conversion the old transpose+concat cost), (4) retry
# the r3k int8-KV long-context crossover (ctx 4096, batch 16) that
# died on a tunnel outage.
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/ql_kex.log 2>&1
echo KEX_DONE
python -u tools/engine_smoke_tpu.py > /tmp/ql_smoke.log 2>&1
echo SMOKE_DONE
python -u bench_llm.py > /tmp/ql_b1.log 2>&1
echo B1_DONE
python -u bench_llm.py --serve --engine-only > /tmp/ql_serve.log 2>&1
echo SERVE_DONE
python -u bench_llm.py --serve --kv8 --ctx 4096 --batch 16 > /tmp/ql_kv8.log 2>&1
echo KV8_DONE
# kv8/kv8c at the standard serve shape too (ctx 1024 batch 32): the
# channel-static kernel should win where per-token lost
python -u bench_llm.py --serve --kv8 > /tmp/ql_kv8_1k.log 2>&1
echo KV8_1K_DONE
# kernel-level marginals incl. the i8c attention block_b sweep
python -u bench_decode_probe.py > /tmp/ql_probe.log 2>&1
echo PROBE_DONE
# fresh headline (insurance: if the tunnel drops again before the
# driver's round-end bench run, these numbers exist in the log)
python -u bench.py > /tmp/ql_headline.log 2>&1
echo QUEUE_L_DONE
