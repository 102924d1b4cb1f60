#!/bin/bash
# Round-5 stage-2 (unpairTrain) TPU soak: >=2k steps of the reference's
# two-stage schedule (train.py:42-90) — each epoch runs a stage-2 pass
# (random unpaired refs, D2 + HairAvgLab) then a stage-1 paired pass.
# Extends the r4 600-step segment (VERDICT r4 #4) with the slimmed wire:
# the dead hole/orient_rgb planes are gone from both stages, so stage 2's
# remaining H2D overhead is only the genuinely-distinct ref planes.
set -e
cd "$(dirname "$0")/.."
DS=${SOAK_DS:-/tmp/soak_r5_ds}
CK=${UNPAIR_CK:-/tmp/ck_unpair_r5}
STEPS=${UNPAIR_STEPS:-2000}
test -d "$DS/train_images" || \
  python scripts/make_soak_dataset.py --out "$DS" --replicas 2 --augment2
exec python train.py --name unpair_r5 --checkpoints_dir "$CK" --data_dir "$DS" \
  --unpairTrain --same_netD_model \
  --batchSize 8 --crop_size 512 --load_size 568 \
  --dtype bfloat16 --fused_step \
  --niter 2000 --max_steps "$STEPS" \
  --nThreads 8 --device_prefetch 2 --decode_cache_mb 640 --device_noise \
  --print_freq 200 --display_freq 100000000 --save_latest_freq 100000000 \
  --save_epoch_freq 10000 --seed 0 --rss_restart_gb 80
