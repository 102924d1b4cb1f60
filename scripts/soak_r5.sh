#!/bin/bash
# Round-5 soak: >=10k steps at the 512^2 bs8 bf16 fused config of record
# with ALL loss terms live, on the --augment2 dataset (234 train variants x
# replicas, denser rotation/scale/hue grid) whose 36 HELD-OUT variants are
# never trained — out-of-sample FID comes from:
#   python scripts/fid_trajectory.py --checkpoints_dir /tmp/ck_soak_r5 \
#     --name soak_r5 --data_dir /tmp/soak_r5_ds --include_init \
#     --subset heldout --out artifacts/soak_r5/fid_heldout.json
# (and --subset val for the train-side trajectory; --extractor inception
# once weights exist).
#
# Round-5 wire: without --use_ig the loader no longer ships the dead
# hole/orient_rgb planes (4 channels of zeros in r4), so the wall rate is
# expected at or above the r4 16.5 img/s.
set -e
cd "$(dirname "$0")/.."
DS=${SOAK_DS:-/tmp/soak_r5_ds}
CK=${SOAK_CK:-/tmp/ck_soak_r5}
STEPS=${SOAK_STEPS:-10000}
test -d "$DS/train_images" || \
  python scripts/make_soak_dataset.py --out "$DS" --replicas 2 --augment2
exec python train.py --name soak_r5 --checkpoints_dir "$CK" --data_dir "$DS" \
  --batchSize 8 --crop_size 512 --load_size 568 \
  --dtype bfloat16 --fused_step \
  --niter 2000 --max_steps "$STEPS" \
  --nThreads 8 --device_prefetch 2 --decode_cache_mb 640 --device_noise \
  --print_freq 400 --display_freq 100000000 --save_latest_freq 100000000 \
  --save_epoch_freq 25 --seed 0 --rss_restart_gb 80
