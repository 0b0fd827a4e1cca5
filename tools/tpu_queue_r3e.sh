#!/bin/bash
# Round-3e sequential TPU job queue (ONE job at a time on the chip).
# 1. kernel exactness incl. the NEW merged attention+o_proj decode
#    kernel (Mosaic lowering proof before the serve bench relies on it)
# 2. serve engine rows rerun: w4a8 MLP fix + the new engine_w8a8_mo row
# 3. VAE trajectory probe with the weight-only diagnostic row (r3d
#    carry-over; never ran)
cd /root/repo
set -x
python -u tools/verify_kernels_tpu.py > /tmp/qd_kex.log 2>&1
python -u bench_llm.py --serve --engine-only > /tmp/qd_serve_engine.log 2>&1
python -u tools/vae_quality.py --trajectory > /tmp/qd_vae_traj.log 2>&1
echo QUEUE_E_DONE
