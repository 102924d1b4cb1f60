#!/bin/bash
# Round-4 stage-2 (unpairTrain) TPU segment: the reference's signature
# two-stage training (train.py:42-90) — every epoch runs a stage-2 pass
# (random unpaired refs, D2 + HairAvgLab, pix2pix_model.py:286-291,357-365)
# followed by a stage-1 paired pass.  ~6 epochs x (50+50) steps at the
# 512^2 bs8 bf16 fused config of record gives committed TPU evidence that
# both per-stage programs compile, alternate, and train stably on chip.
set -e
cd "$(dirname "$0")/.."
DS=${SOAK_DS:-/tmp/soak_r4_ds}
CK=${UNPAIR_CK:-/tmp/ck_unpair_r4}
STEPS=${UNPAIR_STEPS:-600}
test -d "$DS/train_images" || python scripts/make_soak_dataset.py --out "$DS" --replicas 9 --augment
exec python train.py --name unpair_r4 --checkpoints_dir "$CK" --data_dir "$DS" \
  --unpairTrain --same_netD_model \
  --batchSize 8 --crop_size 512 --load_size 568 \
  --dtype bfloat16 --fused_step \
  --niter 2000 --max_steps "$STEPS" \
  --nThreads 8 --device_prefetch 2 --decode_cache_mb 640 --device_noise \
  --print_freq 400 --display_freq 100000000 --save_latest_freq 100000000 \
  --save_epoch_freq 10000 --seed 0 --rss_restart_gb 80
