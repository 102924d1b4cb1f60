#!/bin/bash
# Round-4 soak: 5k steps at the 512^2 bs8 bf16 fused config of record with
# ALL loss terms live (kaiming-fallback VGG -> nonzero VGG/style/content) and
# the round-3/4 loader levers ON (--decode_cache_mb, --device_noise, uint8
# wire, threaded prefetch + device prefetch) so the committed artifact
# carries a loader-inclusive wall-clock throughput (train.py per-epoch
# "wall throughput" line, the reference's own metric:
# util/iter_counter.py:42-50).
#
# The dataset is the --augment set: 45 distinct (image,label,orient)
# triples (3 identities x 5 rotations x 3 hue shifts, orientation values
# rotated consistently) x 9 replicas = 405 samples -> ~50 steps/epoch.
# Checkpoints every 15 epochs feed scripts/fid_trajectory.py afterwards:
#   python scripts/fid_trajectory.py --checkpoints_dir /tmp/ck_soak_r4 \
#     --name soak_r4 --data_dir /tmp/soak_r4_ds --include_init \
#     --out artifacts/soak_r4/fid_trajectory.json
set -e
cd "$(dirname "$0")/.."
DS=${SOAK_DS:-/tmp/soak_r4_ds}
CK=${SOAK_CK:-/tmp/ck_soak_r4}
STEPS=${SOAK_STEPS:-5000}
python scripts/make_soak_dataset.py --out "$DS" --replicas 9 --augment
exec python train.py --name soak_r4 --checkpoints_dir "$CK" --data_dir "$DS" \
  --batchSize 8 --crop_size 512 --load_size 568 \
  --dtype bfloat16 --fused_step \
  --niter 2000 --max_steps "$STEPS" \
  --nThreads 8 --device_prefetch 2 --decode_cache_mb 640 --device_noise \
  --print_freq 400 --display_freq 8000 --save_latest_freq 100000000 \
  --save_epoch_freq 15 --seed 0 --rss_restart_gb 80
