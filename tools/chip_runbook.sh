#!/bin/bash
# Ordered on-chip measurement runbook (run after tunnel recovery; each step
# logs to /tmp/rb_*.log and is safe to re-run individually).
set -x
cd /root/repo

# 1. fold-anomaly check: CLEAN process, fold path only, 4 iters
GROTH16_TPU_MSM=fold BENCH_NO_FOLD_REF=1 BENCH_ITERS=4 \
  timeout 2400 python bench.py > /tmp/rb_fold.log 2>&1

# 2. NTT Pallas on-chip validation (direct-run; PYTHONPATH must keep .axon_site)
PYTHONPATH="/root/repo:$PYTHONPATH" timeout 2400 \
  python tests/test_ntt_tpu.py 10 12 13 > /tmp/rb_ntt_val.log 2>&1

# 3. NTT bench: pallas ON vs OFF at 2^20
GROTH16_TPU_NTT_PALLAS=1 BENCH_MODE=ntt timeout 2400 python bench.py \
  > /tmp/rb_ntt_on.log 2>&1
GROTH16_TPU_NTT_PALLAS=0 BENCH_MODE=ntt timeout 2400 python bench.py \
  > /tmp/rb_ntt_off.log 2>&1

# 4. headline MSM (auto = tree)
timeout 2400 python bench.py > /tmp/rb_msm.log 2>&1

# 5. e2e proofs at 2^18 (few-dispatch) -- then 2^20
BENCH_MODE=prove BENCH_LOG2N=18 BENCH_ITERS=2 timeout 3600 python bench.py \
  > /tmp/rb_prove18.log 2>&1
BENCH_MODE=prove BENCH_LOG2N=20 BENCH_ITERS=2 timeout 5400 python bench.py \
  > /tmp/rb_prove20.log 2>&1

# 6. chunk-streamed 2^22 MSM
BENCH_LOG2N=22 BENCH_ITERS=2 timeout 5400 python bench.py \
  > /tmp/rb_msm22.log 2>&1
echo RUNBOOK DONE
