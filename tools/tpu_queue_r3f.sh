#!/bin/bash
# Round-3f sequential TPU job queue (ONE job at a time on the chip).
# Rerun after the merged-kernel lowering fix: exactness first, then
# the serve engine rows (engine_w8a8_mo + engine_w4a8).
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/qd_kex.log 2>&1
python -u bench_llm.py --serve --engine-only > /tmp/qd_serve_engine.log 2>&1
echo QUEUE_F_DONE
