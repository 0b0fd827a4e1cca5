#!/bin/bash
# Round-3z queue: outlier table with the W4 Smooth+GPTQ compose row.
cd /root/repo
set -x
python -u tools/quality_table.py --outliers --max-factor 8 > /tmp/qz_qto.log 2>&1
echo QT_COMPOSE_DONE
echo QUEUE_Z_DONE
