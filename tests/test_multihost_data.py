"""Per-host input pipeline: host shards must exactly partition the global
batch (train.py multi-host path; the reference is single-host-only DataParallel,
SURVEY §2.7)."""

import os

import numpy as np
import pytest
from PIL import Image

from michigan_tpu.config import Options
from michigan_tpu.data.dataset import create_dataloader


@pytest.fixture
def tiny_dataset(tmp_path):
    base = tmp_path / "ds"
    rng = np.random.default_rng(0)
    for sub in ("train_labels", "train_images", "train_dense_orients"):
        (base / sub).mkdir(parents=True)
    for i in range(8):
        name = f"{i:05d}"
        lab = (rng.integers(0, 2, (32, 32)) * 1).astype(np.uint8)
        Image.fromarray(lab, "L").save(base / "train_labels" / f"{name}.png")
        img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(base / "train_images" / f"{name}.jpg")
        ori = rng.integers(0, 255, (32, 32)).astype(np.uint8)
        Image.fromarray(ori, "L").save(base / "train_dense_orients" / f"{name}.png")
    return str(base)


def make_opt(tiny_dataset, **kw):
    d = dict(
        isTrain=True, crop_size=32, load_size=32, batchSize=4,
        serial_batches=True, no_flip=True, use_ig=False, nThreads=1,
        data_dir=tiny_dataset, preprocess_mode="resize_and_crop",
    )
    d.update(kw)
    return Options(**d).finalize()


def test_host_shards_partition_global_batch(tiny_dataset):
    opt = make_opt(tiny_dataset)
    global_batches = list(create_dataloader(opt, shard=(0, 1)))
    shard0 = list(create_dataloader(opt, shard=(0, 2)))
    shard1 = list(create_dataloader(opt, shard=(1, 2)))
    assert len(global_batches) == len(shard0) == len(shard1) == 2
    for g, a, b in zip(global_batches, shard0, shard1):
        for k in g:
            assert a[k].shape[0] == b[k].shape[0] == g[k].shape[0] // 2
            np.testing.assert_array_equal(
                np.concatenate([a[k], b[k]]), g[k],
            )


def test_shard_batch_divisibility_asserted(tiny_dataset):
    opt = make_opt(tiny_dataset, batchSize=3)
    with pytest.raises(AssertionError, match="divide"):
        create_dataloader(opt, shard=(0, 2))


def test_make_array_from_process_local_data_roundtrip(tiny_dataset):
    """Single-process equivalent of the train.py device_batch path over the
    8-virtual-device mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from michigan_tpu.parallel.mesh import DATA_AXIS, make_mesh

    opt = make_opt(tiny_dataset, batchSize=8)
    mesh = make_mesh("data:-1")
    sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    data = next(iter(create_dataloader(opt, shard=(0, 1))))
    arr = jax.make_array_from_process_local_data(
        sharding, np.asarray(data["image_tag"])
    )
    assert arr.shape == data["image_tag"].shape
    np.testing.assert_array_equal(np.asarray(arr), data["image_tag"])
    assert len(arr.sharding.device_set) == 8


def test_prefetch_with_overlaps_and_propagates_errors():
    """prefetch_with runs the put() one item ahead and re-raises feeder
    exceptions in the consumer (train.py device prefetch)."""
    import pytest

    from michigan_tpu.data.dataset import prefetch_with

    out = list(prefetch_with(lambda x: x * 10, [1, 2, 3]))
    assert out == [(1, 10), (2, 20), (3, 30)]

    def bad_put(x):
        if x == 2:
            raise ValueError("boom")
        return x

    consumed = []
    with pytest.raises(ValueError, match="boom"):
        for item, _ in prefetch_with(bad_put, [1, 2, 3]):
            consumed.append(item)
    assert consumed == [1]


def test_prefetch_with_slow_consumer_and_early_exit():
    """The feeder must deliver the sentinel even when the queue is full at
    loader exhaustion (regression: a slow consumer left q.get() blocked
    forever), and an early consumer exit must stop the feeder."""
    import time

    from michigan_tpu.data.dataset import prefetch_with

    # slow consumer: feeder finishes (and hits its finally) while the
    # queue still holds undelivered items
    out = []
    for item, _ in prefetch_with(lambda x: x, [1, 2, 3], depth=1):
        time.sleep(0.05)
        out.append(item)
    assert out == [1, 2, 3]

    # early exit: generator close unblocks the feeder; loader cleanup runs
    closed = []

    def loader():
        try:
            for i in range(100):
                yield i
        finally:
            closed.append(True)

    for item, _ in prefetch_with(lambda x: x, loader(), depth=1):
        break
    time.sleep(0.5)  # let the feeder thread observe stop and clean up
    assert closed == [True]


def test_loader_epoch_advances_on_early_exit(tiny_dataset):
    """A consumer that breaks mid-epoch must get a FRESH shuffle and fresh
    per-sample RNG on re-iteration (torch DataLoader reseeds per iter());
    regression: epoch only advanced on full consumption, so an early-exit
    consumer (e.g. a --debug short-circuit) replayed identical batches."""
    opt = make_opt(tiny_dataset, serial_batches=False, batchSize=2)
    loader = create_dataloader(opt, shard=(0, 1))
    assert loader.epoch == 0

    first = next(iter(loader))  # early exit: only one batch consumed
    assert loader.epoch == 1

    second = next(iter(loader))
    assert loader.epoch == 2
    # different epoch seed -> different shuffle: the two partial epochs must
    # not replay the same leading batch (8 samples, bs2 — a collision of the
    # full leading batch under a fresh shuffle is astronomically unlikely
    # AND deterministic here, so no flake)
    assert any(
        not np.array_equal(first[k], second[k]) for k in first
    ), "early-exit re-iteration replayed the identical batch"


def test_loader_worker_exception_propagates(tiny_dataset):
    """A get_sample failure inside a PrefetchLoader worker thread must
    re-raise in the consumer, not leave __iter__ waiting forever
    (regression: a corrupt sample deadlocked the epoch loop)."""
    opt = make_opt(tiny_dataset)
    loader = create_dataloader(opt, shard=(0, 1))

    def boom(index, rng):
        raise RuntimeError("corrupt sample")

    loader.dataset.get_sample = boom
    with pytest.raises(RuntimeError, match="corrupt sample"):
        list(loader)


def test_dataset_mismatch_fails_at_construction(tiny_dataset):
    """Missing dense-orientation maps must fail with a clear error at
    dataset construction, pointing at cal_orientation.py."""
    for f in os.listdir(os.path.join(tiny_dataset, "train_dense_orients")):
        os.remove(os.path.join(tiny_dataset, "train_dense_orients", f))
    opt = make_opt(tiny_dataset)
    with pytest.raises(ValueError, match="cal_orientation"):
        create_dataloader(opt)


def test_decode_cache_samples_identical_and_bounded(tiny_dataset):
    """--decode_cache_mb caches DECODED images in RAM (dataset._DecodeCache).
    Samples must be bit-identical with and without the cache (same seed ⇒
    same transforms), hits must serve fresh pixel-buffer copies, and the
    byte cap must be enforced by FIFO eviction."""
    from michigan_tpu.data.dataset import CustomDataset, _DecodeCache

    import random as pyrandom
    # use_ig=True also exercises the cached orient-RGB encoding + hole path
    for use_ig in (False, True):
        ds_plain = CustomDataset(make_opt(tiny_dataset, use_ig=use_ig))
        ds_cache = CustomDataset(
            make_opt(tiny_dataset, use_ig=use_ig, decode_cache_mb=64))
        for idx in range(4):
            a = ds_plain.get_sample(idx, pyrandom.Random(idx))
            # twice: the second read is a cache hit and must still match
            ds_cache.get_sample(idx, pyrandom.Random(idx))
            b = ds_cache.get_sample(idx, pyrandom.Random(idx))
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(
                    a[k], b[k], err_msg=f"{k} idx={idx} use_ig={use_ig}")

    # copies, not the cached object: mutating a served image must not
    # poison later hits
    cache = _DecodeCache(1 << 20)
    path = os.path.join(tiny_dataset, "train_images", "00000.jpg")
    first = cache.open(path)
    first.paste((255, 0, 0), (0, 0, first.width, first.height))
    again = np.array(cache.open(path))
    assert not np.all(again[..., 0] == 255), "cache served a shared buffer"

    # eviction: cap of ~1.5 images worth of bytes holds one 32x32 RGB image
    one_img = 3 * 32 * 32
    small = _DecodeCache(int(one_img * 1.5))
    for i in range(4):
        small.open(os.path.join(tiny_dataset, "train_images", f"{i:05d}.jpg"))
    assert small.used <= small.cap, f"cache over cap: {small.used} > {small.cap}"
    assert len(small.images) == 1
