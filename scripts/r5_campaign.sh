#!/bin/bash
# Round-5 TPU campaign, stages after the flag matrix:
#   1. unpair_r5: 2k-step two-stage soak (slimmed wire)
#   2. soak_r5:  10k-step all-losses soak on the augment2 split dataset
#   3. held-out + val FID trajectories from the soak checkpoints
#   4. per-loss gradient-norm shares on the soak checkpoint
# Each stage logs under /tmp and copies its run artifacts into artifacts/.
set -x
cd "$(dirname "$0")/.."

UNPAIR_STEPS=${UNPAIR_STEPS:-2000} bash scripts/unpair_r5.sh \
  > /tmp/unpair_r5.log 2>&1
mkdir -p artifacts/unpair_r5
cp /tmp/ck_unpair_r5/unpair_r5/loss_log.txt \
   /tmp/ck_unpair_r5/unpair_r5/scalars.jsonl \
   /tmp/ck_unpair_r5/unpair_r5/opt.json artifacts/unpair_r5/ || true
grep "wall throughput" /tmp/unpair_r5.log \
  > artifacts/unpair_r5/wall_rates.txt || true

SOAK_STEPS=${SOAK_STEPS:-10000} bash scripts/soak_r5.sh \
  > /tmp/soak_r5.log 2>&1
mkdir -p artifacts/soak_r5
cp /tmp/ck_soak_r5/soak_r5/loss_log.txt \
   /tmp/ck_soak_r5/soak_r5/scalars.jsonl \
   /tmp/ck_soak_r5/soak_r5/opt.json artifacts/soak_r5/ || true
grep "wall throughput" /tmp/soak_r5.log \
  > artifacts/soak_r5/wall_rates.txt || true

python scripts/fid_trajectory.py --checkpoints_dir /tmp/ck_soak_r5 \
  --name soak_r5 --data_dir /tmp/soak_r5_ds --include_init \
  --subset heldout --out artifacts/soak_r5/fid_heldout.json \
  > /tmp/fid_heldout.log 2>&1
python scripts/fid_trajectory.py --checkpoints_dir /tmp/ck_soak_r5 \
  --name soak_r5 --data_dir /tmp/soak_r5_ds --include_init \
  --subset val --out artifacts/soak_r5/fid_val.json \
  > /tmp/fid_val.log 2>&1

python scripts/grad_shares.py --checkpoints_dir /tmp/ck_soak_r5 \
  --name soak_r5 --data_dir /tmp/soak_r5_ds \
  --out artifacts/soak_r5/grad_shares.json \
  > /tmp/grad_shares.log 2>&1

echo "r5 campaign stages done"
