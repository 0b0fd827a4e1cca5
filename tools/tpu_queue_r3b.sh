#!/bin/bash
# Round-3b sequential TPU job queue (ONE job at a time on the chip).
# Reruns whose harnesses changed after the r3 queue captured them:
# decode-only serve rows, quantized-self-draft speculative decode, the
# bf16-e2e regression check, SDXL batch-4 capacity rows via --plan
# (the non-plan run OOMs by design at batch 4), and the outlier
# quality table at the non-chaotic 8x injection with the smoothing
# ablation row.
cd /root/repo
set -x
python -u bench_llm.py --serve > /tmp/qb_serve.log 2>&1
python -u bench_llm.py --speculative > /tmp/qb_spec.log 2>&1
python -u bench_pipeline.py > /tmp/qb_pipe.log 2>&1
python -u bench_sdxl.py 4 --plan w8a8_static > /tmp/qb_sdxl_w8.log 2>&1
python -u bench_sdxl.py 4 --plan w4a8 > /tmp/qb_sdxl_w4a8.log 2>&1
python -u bench_sdxl.py 4 --plan w4a16 > /tmp/qb_sdxl_w4a16.log 2>&1
python -u tools/quality_table.py --outliers --max-factor 8 > /tmp/qb_quality_out.log 2>&1
python -u bench_whisper.py > /tmp/qb_whisper.log 2>&1
python -u bench.py > /tmp/qb_headline.log 2>&1
echo QUEUE_B_DONE
