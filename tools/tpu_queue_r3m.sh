#!/bin/bash
# Round-3m follow-up queue (after r3l): the long-context fixes + new
# feature measurements, ordered by value density.
#  1. kv8/kv4 long-context crossover rerun (ctx 4096 batch 16) — now
#     through the square-aligned prefill + flash decode attention
#  2. continuous batching request-stream throughput vs static batches
#  3. kernel exactness re-run (covers the flash kernels on chip via
#     the long-ctx dispatch)
#  4. quality tables at SD1.5 scale with the per-step act-scale row
#     (standard + outlier regime) — regenerates QUALITY*.md
cd /root/repo
set -x
python -u bench_llm.py --serve --kv8 --ctx 4096 --batch 16 > /tmp/qm_kv8.log 2>&1
echo KV8_4K_DONE
python -u bench_llm.py --continuous > /tmp/qm_cont.log 2>&1
echo CONT_DONE
python -u tools/verify_kernels_tpu.py > /tmp/qm_kex.log 2>&1
echo KEX_DONE
python -u tools/quality_table.py > /tmp/qm_qual.log 2>&1
echo QUAL_DONE
python -u tools/quality_table.py --outliers > /tmp/qm_qualo.log 2>&1
echo QUEUE_M_DONE
