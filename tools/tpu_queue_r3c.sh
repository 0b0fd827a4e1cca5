#!/bin/bash
# Round-3c sequential TPU job queue (ONE job at a time on the chip).
# Completes the r3b tail (whisper, headline) plus: the MMDiT-shape
# attention sweep (round-3 roadmap #5, never yet run on the chip),
# engine serve rows re-measured with the bf16 cache-conversion fix +
# the scan-unroll probe, the trajectory-latents VAE quality probe, and
# a clean bench_pipeline rerun (the r3b one overlapped the CPU test
# suite).
cd /root/repo
set -x
python -u bench_whisper.py > /tmp/qb_whisper.log 2>&1
python -u bench_attn.py --mmdit > /tmp/qc_attn_mmdit.log 2>&1
python -u bench_llm.py --serve --engine-only > /tmp/qc_serve_engine.log 2>&1
python -u tools/vae_quality.py --trajectory > /tmp/qc_vae_traj.log 2>&1
python -u bench_pipeline.py > /tmp/qc_pipe.log 2>&1
python -u bench.py > /tmp/qb_headline.log 2>&1
echo QUEUE_C_DONE
