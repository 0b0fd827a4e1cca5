#!/bin/bash
# Round-3i: batch-1 decode rows (incl. the new engine_w4a8) — the
# weight-bound regime where int4 should clear 2x bf16.
cd /root/repo
set -x
python -u bench_llm.py > /tmp/qd_decode1.log 2>&1
echo QUEUE_I_DONE
