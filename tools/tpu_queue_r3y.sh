#!/bin/bash
# Round-3y queue: MoE w4a8 chip row (stacked-expert int4 kernel).
cd /root/repo
set -x
python -u bench_llm.py --moe > /tmp/qy_moe.log 2>&1
echo MOE_DONE
# serve-regression check: the w4a8 qkv call path changed (qkv_in/ns
# plumbing for non-canonical archs — identical args on canonical
# llama, this re-measures to prove it)
python -u bench_llm.py --serve --engine-only > /tmp/qy_serve.log 2>&1
echo SERVE_DONE
echo QUEUE_Y_DONE
