#!/bin/bash
# Round-3x queue: kernel exactness on chip incl. the has_norm=False i4
# MLP specialization (non-canonical-arch w4a8), after r3w.
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/qx_kex.log 2>&1
echo KEX_DONE
echo QUEUE_X_DONE
