#!/bin/bash
# Round-4 soak: 5k steps at the 512^2 bs8 bf16 fused config of record with
# ALL loss terms live (kaiming-fallback VGG -> nonzero VGG/style/content) and
# the round-3 loader levers ON (--decode_cache_mb, --device_noise, threaded
# prefetch + device prefetch) so the committed artifact carries a loader-
# inclusive wall-clock throughput (train.py per-epoch "wall throughput" line,
# the reference's own metric: util/iter_counter.py:42-50).
#
# Checkpoints every 15 epochs feed scripts/fid_trajectory.py afterwards.
set -e
cd "$(dirname "$0")/.."
DS=${SOAK_DS:-/tmp/soak_r4_ds}
CK=${SOAK_CK:-/tmp/ck_soak_r4}
STEPS=${SOAK_STEPS:-5000}
python scripts/make_soak_dataset.py --out "$DS" --replicas 125
exec python train.py --name soak_r4 --checkpoints_dir "$CK" --data_dir "$DS" \
  --batchSize 8 --crop_size 512 --load_size 568 \
  --dtype bfloat16 --fused_step \
  --niter 2000 --max_steps "$STEPS" \
  --nThreads 8 --device_prefetch 2 --decode_cache_mb 640 --device_noise \
  --print_freq 368 --display_freq 8000 --save_latest_freq 100000000 \
  --save_epoch_freq 15 --seed 0
