#!/bin/bash
# Round-3d sequential TPU job queue (ONE job at a time on the chip).
# Reruns after fixes: engine serve rows now that the w4a8 MLP kernel
# lowers (wsd whole + dynamic row select), and the VAE trajectory
# probe with the weight-only diagnostic row.
cd /root/repo
set -x
python -u bench_llm.py --serve --engine-only > /tmp/qd_serve_engine.log 2>&1
python -u tools/vae_quality.py --trajectory > /tmp/qd_vae_traj.log 2>&1
echo QUEUE_D_DONE
