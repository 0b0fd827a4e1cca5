#!/bin/bash
# Round-3h: exactness with the i4 decode kernels included, then the
# full engine serve table (now incl. engine_w4a8 after the shli fix).
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/qd_kex.log 2>&1
python -u bench_llm.py --serve --engine-only > /tmp/qd_serve_engine.log 2>&1
echo QUEUE_H_DONE
