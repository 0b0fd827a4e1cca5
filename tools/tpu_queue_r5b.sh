#!/bin/bash
# Round-5b queue: batch-1 decode ladder (XLA-variant fix), MMDiT
# pad-mask cost A/B, SD3.5 e2e with VAE chunk-2 (vs chunk-1 rerun in
# the same tunnel session).
cd /root/repo
set -x
python -u bench_llm.py --mla > /tmp/q5b_mla.log 2>&1
echo MLA2_DONE
python -u bench_llm.py --stream > /tmp/q5b_stream.log 2>&1
echo STREAM2_DONE
python -u bench_llm.py --b1 > /tmp/q5b_b1.log 2>&1
echo B1_DONE
python -u bench_sd35.py 4 --mask-pad > /tmp/q5b_maskpad.log 2>&1
echo MASKPAD_DONE
python -u bench_pipeline.py --family sd35 --vae-chunk 2 > /tmp/q5b_sd35c2.log 2>&1
echo SD35_C2_DONE
python -u bench_pipeline.py --family sd35 > /tmp/q5b_sd35c1.log 2>&1
echo SD35_C1_DONE
python -u bench_pipeline.py --family sd35 --vae-chunk 2 4 > /tmp/q5b_sd35c2b.log 2>&1
echo SD35_C2B_DONE
python -u bench_llm.py --mla > /tmp/q5b_mla2.log 2>&1
echo MLA3_DONE
python -u bench_llm.py --b1 > /tmp/q5b_b1b.log 2>&1
echo B1B_DONE
python -u bench_pipeline.py --family sd35 --vae-chunk 4 4 > /tmp/q5b_sd35c4.log 2>&1
echo SD35_C4_DONE
python -u bench_llm.py --mla --only mla > /tmp/q5b_mla_only.log 2>&1
echo MLA_ONLY_DONE
python -u bench_llm.py --mla --only mha > /tmp/q5b_mha_only.log 2>&1
echo MHA_ONLY_DONE
python -u bench_llm.py --stream > /tmp/q5b_stream2.log 2>&1
echo STREAM3_DONE
python -u bench_sd35.py 4 --mask-pad > /tmp/q5b_maskpad2.log 2>&1
echo MASKPAD2_DONE
python -u bench.py > /tmp/q5b_bench.log 2>&1
echo BENCH_DONE
echo QUEUE_5B_DONE
