#!/bin/bash
# Round-3 sequential TPU job queue (ONE job at a time on the chip).
cd /root/repo
set -x
python -u bench_llm.py --serve --engine-only > /tmp/q_serve_engine.log 2>&1
python -u bench_llm.py --speculative > /tmp/q_spec.log 2>&1
python -u bench_llm.py > /tmp/q_llm_b1.log 2>&1
python -u bench_sdxl.py 1 4 > /tmp/q_sdxl.log 2>&1
python -u bench_attn.py --mmdit > /tmp/q_mmdit.log 2>&1
python -u tools/vae_quality.py > /tmp/q_vae.log 2>&1
python -u bench_pipeline.py --quant-vae > /tmp/q_pipe_vae.log 2>&1
python -u tools/quality_table.py --outliers > /tmp/q_quality_out.log 2>&1
python -u bench.py > /tmp/q_headline.log 2>&1
echo QUEUE_DONE
