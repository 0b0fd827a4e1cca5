#!/bin/bash
# Round-3y queue: MoE w4a8 chip row (stacked-expert int4 kernel).
cd /root/repo
set -x
python -u bench_llm.py --moe > /tmp/qy_moe.log 2>&1
echo MOE_DONE
echo QUEUE_Y_DONE
