#!/bin/bash
# Round-5a queue: MLA latent-cache decode row (VERDICT #1 done
# criterion), then the interleaved prefill/decode request stream
# (VERDICT #2).  One chip, one job at a time.
cd /root/repo
set -x
python -u bench_llm.py --mla > /tmp/q5a_mla.log 2>&1
echo MLA_DONE
python -u bench_llm.py --stream > /tmp/q5a_stream.log 2>&1
echo STREAM_DONE
echo QUEUE_5A_DONE
