#!/bin/bash
# Round-3c sequential TPU job queue (ONE job at a time on the chip).
# Runs after r3b: the MMDiT-shape attention sweep (round-3 roadmap #5,
# never yet run on the chip) and the engine serve rows re-measured
# with the bf16 cache-conversion fix (12b217e).
cd /root/repo
set -x
python -u bench_attn.py --mmdit > /tmp/qc_attn_mmdit.log 2>&1
python -u bench_llm.py --serve --engine-only > /tmp/qc_serve_engine.log 2>&1
python -u tools/vae_quality.py --trajectory > /tmp/qc_vae_traj.log 2>&1
# clean rerun: the r3b bench_pipeline run overlapped the CPU test
# suite (host contention skews the tunnel dispatch path)
python -u bench_pipeline.py > /tmp/qc_pipe.log 2>&1
echo QUEUE_C_DONE
