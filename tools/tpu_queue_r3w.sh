#!/bin/bash
# Round-3w queue (session 5): GPTQ + new-family chip rows.
#  1. diffusion outlier quality table regen (adds the W4 GPTQ row)
#  2. qwen3/gemma3 serving-feature decode-cost rows
cd /root/repo
set -x
python -u tools/quality_table.py --outliers > /tmp/qw_qto.log 2>&1
echo QT_OUTLIERS_DONE
python -u bench_llm.py --qknorm > /tmp/qw_qknorm.log 2>&1
echo QKNORM_DONE
echo QUEUE_W_DONE
