#!/bin/bash
# Round-3k: int8-KV long-context crossover (ctx 4096, batch 16) —
# the kv8 attention kernel loses at ctx 1024 on VPU dequant; its HBM
# saving scales with T, so measure where the halved cache read pays.
cd /root/repo
set -x
python -u bench_llm.py --serve --kv8 --ctx 4096 --batch 16 > /tmp/qk_kv8.log 2>&1
echo QUEUE_K_DONE
