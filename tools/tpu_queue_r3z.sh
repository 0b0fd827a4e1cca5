#!/bin/bash
# Round-3z queue: kex + MoE bench reruns on the FIXED moe-i4 block
# specs (first chip attempt hit the Mosaic block rules: width-1 route
# blocks and non-8-row per-expert scale blocks), then the outlier
# table with the W4 Smooth+GPTQ compose row.
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/qz_kex.log 2>&1
echo KEX_DONE
python -u bench_llm.py --moe > /tmp/qz_moe.log 2>&1
echo MOE_DONE
python -u tools/quality_table.py --outliers --max-factor 8 > /tmp/qz_qto.log 2>&1
echo QT_COMPOSE_DONE
echo QUEUE_Z_DONE
