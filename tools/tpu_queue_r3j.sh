#!/bin/bash
# Round-3j: refresh the on-chip kernel exactness artifact (13 kernels,
# incl. the new residual-free i4 MLP TP-epilogue variant).
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/qe_kex.log 2>&1
echo QUEUE_J_DONE
