#!/bin/bash
# Round-3x queue: corrected outlier-table regen (--max-factor 8 — the
# 64x default saturates the random-weight UNet and every mode
# collapses to ~8.8 PSNR) + kernel exactness incl. the has_norm=False
# i4 MLP specialization.
cd /root/repo
set -x
python -u tools/quality_table.py --outliers --max-factor 8 > /tmp/qx_qto.log 2>&1
echo QT_OUTLIERS8_DONE
python -u tools/verify_kernels_tpu.py > /tmp/qx_kex.log 2>&1
echo KEX_DONE
echo QUEUE_X_DONE
