#!/bin/bash
# Round-3g sequential TPU job queue (ONE job at a time on the chip).
# The merged kernel is now the lane-major o_proj+residual+MLP fusion;
# exactness first, then the serve engine rows (mo + w4a8).
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/qd_kex.log 2>&1
python -u bench_llm.py --serve --engine-only > /tmp/qd_serve_engine.log 2>&1
echo QUEUE_G_DONE
