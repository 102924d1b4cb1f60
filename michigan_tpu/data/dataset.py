"""Training dataset + threaded prefetching loader.

Replaces the reference's torch DataLoader over CustomDataset
(data/__init__.py:41-58, custom_dataset.py, pix2pix_dataset.py) with a
numpy-native dataset and a double-buffered thread-pool prefetcher — TPU
training wants the host assembling the next batch while the device runs.
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Dict, Iterator, List

import numpy as np
from PIL import Image

from michigan_tpu.data.preprocess import generate_hole, trans_orient_to_rgb
from michigan_tpu.data.transforms import get_params, get_transform, pre_geometry
from michigan_tpu.ops.noise import generate_noise_fast

IMG_EXTENSIONS = (
    ".jpg", ".JPG", ".jpeg", ".JPEG", ".png", ".PNG", ".ppm", ".PPM",
    ".bmp", ".BMP", ".tiff", ".webp",
)


def list_images(
    directory: str, recursive: bool = False,
    cache_read: bool = False, cache_write: bool = False,
) -> List[str]:
    """image_folder.py:36-64 equivalent incl. the files.list cache."""
    cache_path = os.path.join(directory, "files.list")
    if cache_read and os.path.exists(cache_path):
        with open(cache_path) as f:
            return [line.strip() for line in f if line.strip()]
    out = []
    if recursive:
        for root, _, files in os.walk(directory):
            out += [os.path.join(root, f) for f in files if f.endswith(IMG_EXTENSIONS)]
    else:
        out = [
            os.path.join(directory, f)
            for f in sorted(os.listdir(directory))
            if f.endswith(IMG_EXTENSIONS)
        ]
    out = sorted(out)
    if cache_write:
        with open(cache_path, "w") as f:
            f.write("\n".join(out))
    return out


class _DecodeCache:
    """Bounded RAM cache of decoded source images (FIFO eviction by bytes).

    On low-core hosts JPEG/PNG decode dominates per-sample time (PERF.md
    soak section: 2.3 s/step wall vs 0.52 s/step device on this
    container's single core).  Caching the *decoded* image makes every
    epoch after the first transform-bound.  Stores fully-loaded PIL
    images and hands out copies, so concurrent loader workers never share
    a mutable pixel buffer."""

    def __init__(self, cap_bytes: int):
        from collections import OrderedDict

        self.cap = cap_bytes
        self.used = 0
        self.lock = threading.Lock()
        self.images: "OrderedDict[str, Image.Image]" = OrderedDict()

    @staticmethod
    def _nbytes(img: Image.Image) -> int:
        return len(img.getbands()) * img.width * img.height

    def get_or_put(self, key: str, produce) -> Image.Image:
        """Return a copy of the cached image for `key`, producing (and
        caching, within the byte cap) on a miss.  `produce` runs outside
        the lock — concurrent misses on the same key may both decode, but
        only one result is kept."""
        with self.lock:
            img = self.images.get(key)
            if img is not None:
                return img.copy()
        img = produce()
        img.load()
        nb = self._nbytes(img)
        with self.lock:
            if key not in self.images and nb <= self.cap:
                while self.used + nb > self.cap and self.images:
                    _, old = self.images.popitem(last=False)
                    self.used -= self._nbytes(old)
                self.images[key] = img
                self.used += nb
            return img.copy()

    def open(self, path: str) -> Image.Image:
        return self.get_or_put(path, lambda: Image.open(path))


class CustomDataset:
    """FFHQ directory layout (custom_dataset.py:43-70):
    {data_dir}/{clear}{phase}_labels|_images|_dense_orients."""

    def __init__(self, opt, step: int = 1):
        self.opt = opt
        self.step = step
        cache_mb = getattr(opt, "decode_cache_mb", 0)
        self._cache = _DecodeCache(cache_mb << 20) if cache_mb > 0 else None
        self._open = self._cache.open if self._cache else Image.open
        phase = "train" if opt.isTrain else opt.subset
        clear = "clear_" if opt.clear else ""
        base = opt.data_dir
        kw = dict(cache_read=opt.cache_filelist_read, cache_write=opt.cache_filelist_write)
        self.label_paths = list_images(
            opt.label_dir or os.path.join(base, f"{clear}{phase}_labels"), **kw
        )[: opt.max_dataset_size]
        self.image_paths = list_images(
            opt.image_dir or os.path.join(base, f"{clear}{phase}_images"), **kw
        )[: opt.max_dataset_size]
        self.orient_paths = list_images(
            opt.orient_dir or os.path.join(base, f"{clear}{phase}_dense_orients"), **kw
        )[: opt.max_dataset_size]
        # fail at construction with a clear message, not mid-epoch inside a
        # loader worker (the reference's check covers label/image only and
        # zip would silently truncate a length mismatch)
        if len(self.image_paths) != len(self.label_paths):
            raise ValueError(
                f"dataset mismatch: {len(self.label_paths)} labels vs "
                f"{len(self.image_paths)} images under {base}"
            )
        if len(self.orient_paths) != len(self.label_paths):
            raise ValueError(
                f"dataset mismatch: {len(self.label_paths)} labels vs "
                f"{len(self.orient_paths)} dense orientation maps under "
                f"{base} — run cal_orientation.py --image_dir to generate them"
            )
        if not opt.no_pairing_check:
            for lp, ip in zip(self.label_paths, self.image_paths):
                n1 = os.path.splitext(os.path.basename(lp))[0]
                n2 = os.path.splitext(os.path.basename(ip))[0]
                assert n1 == n2, f"label/image pairing mismatch: {lp} vs {ip}"

    def __len__(self) -> int:
        return len(self.label_paths)

    def get_sample(self, index: int, rng: random.Random) -> Dict[str, np.ndarray]:
        """pix2pix_dataset.py:66-194 semantics, NHWC numpy (no batch dim).

        The reference's orient-randomization branch is dead code (its
        threshold of 2 always exceeds random.random(); SURVEY §2.3) — only
        the live branch is implemented.
        """
        opt = self.opt

        # cache-aware pre-scaling: the load_size scaling stage is
        # parameter-independent (crop/flip randomness applies after), so
        # serve it from the decode cache — each image is resampled once per
        # run instead of once per step (the single-core host's hottest
        # transform op, PERF.md wall-clock ladder).  pre_geometry is
        # idempotent, so the per-step transform skips its scaling stage.
        can_preresize = self._cache is not None and any(
            m in opt.preprocess_mode
            for m in ("resize", "scale_width", "scale_shortside")
        )

        def open_t(path, method=Image.BICUBIC, rgb=False):
            if can_preresize:
                def produce():
                    img = self._open(path)
                    if rgb:
                        img = img.convert("RGB")
                    return pre_geometry(img, opt, method)

                return self._cache.get_or_put(
                    f"{path}@{'rgb' if rgb else ''}geo:"
                    f"{opt.preprocess_mode}:{opt.load_size}:m{method}",
                    produce,
                )
            img = self._open(path)
            return img.convert("RGB") if rgb else img

        label = self._open(self.label_paths[index])
        params = get_params(opt, label.size, rng)
        tl = get_transform(opt, params, method=Image.NEAREST, normalize=False)
        # uint8 wire: pixel values, byte dtype (bit-identical to tl()*255
        # after the in-program decode, train_step._f32) — the loader does
        # no float math and the host->device transfer is 1/4 the bytes
        tru = get_transform(opt, params, method=Image.NEAREST,
                            normalize=False, as_uint8=True)
        label_t = tru(open_t(self.label_paths[index], Image.NEAREST))
        label_t[label_t == 255] = opt.label_nc

        # paired stage (step 1): ref index IS the tag index, so the ref
        # label (and, without color jitter, the ref image) are bit-equal to
        # the tag arrays — skip producing and shipping them; the consumer
        # aliases them device-side (train.py device_batch)
        paired = self.step == 1
        index_ref = index if paired else rng.randint(0, len(self) - 1)
        label_ref_t = None
        if not paired:
            label_ref_t = tru(open_t(self.label_paths[index_ref], Image.NEAREST))
            label_ref_t[label_ref_t == 255] = opt.label_nc

        tiu = get_transform(opt, params, as_uint8=True)
        image_t = tiu(open_t(self.image_paths[index], rgb=True))
        image_ref_t = None
        if not paired or opt.color_jitter:
            ti_ref = (
                get_transform(opt, params, color=True, as_uint8=True)
                if opt.color_jitter else tiu
            )
            image_ref_t = ti_ref(open_t(self.image_paths[index_ref], rgb=True))

        orient_t = tru(open_t(self.orient_paths[index], Image.NEAREST))

        # rgb orient from the sample's own orient + label (live branch,
        # pix2pix_dataset.py:131-134).  --device_orient_rgb recomputes it
        # in the jitted transfer program instead (pointwise in (orient,
        # label), so it commutes with NEAREST/crop/flip exactly) — the
        # loader then ships nothing for it.
        if (getattr(opt, "device_orient_rgb", False)
                and opt.use_ig and not opt.no_orientation):
            orient_rgb_t = None
        elif opt.use_ig and not opt.no_orientation:
            # pure function of the sample's raw orient+label (transforms
            # apply after) — cache the encoded image alongside the decodes,
            # pre-resized when the pipeline allows (see open_t)
            def make_rgb():
                return trans_orient_to_rgb(
                    np.array(self._open(self.orient_paths[index])),
                    np.array(label),
                )

            if can_preresize:
                rgb = self._cache.get_or_put(
                    f"__orient_rgb__geo:{opt.preprocess_mode}:"
                    f"{opt.load_size}:{index}",
                    lambda: pre_geometry(make_rgb(), opt, Image.NEAREST),
                )
            elif self._cache is not None:
                rgb = self._cache.get_or_put(
                    f"__orient_rgb__:{index}", make_rgb)
            else:
                rgb = make_rgb()
            orient_rgb_t = tl(rgb) * label_t
        else:
            # without the IG tower nothing in the train step reads
            # orient_rgb (model.py: every consumer is behind opt.use_ig) —
            # shipping 3 channels of zeros per sample only burned H2D
            orient_rgb_t = None

        if opt.use_ig:
            idx_o = rng.randint(0, len(self) - 1)
            orient_mask = np.array(self._open(self.label_paths[idx_o]))
            hole = generate_hole(np.array(label), orient_mask, rng)
            hole_t = tru(hole)
        else:
            hole_t = None  # same: the hole only feeds the IG composite

        out = {
            "label_tag": label_t,
            "image_tag": image_t,
            "orient": orient_t,
        }
        if hole_t is not None:
            out["hole"] = hole_t
        if label_ref_t is not None:
            out["label_ref"] = label_ref_t
        if image_ref_t is not None:
            out["image_ref"] = image_ref_t
        if orient_rgb_t is not None:
            out["orient_rgb"] = orient_rgb_t.astype(np.float32, copy=False)
        # --device_noise moves the pyramid into the jitted transfer path
        # (train.py device_batch) — the loader then ships no noise at all.
        # getrandbits is this sample's LAST rng draw, so skipping it leaves
        # every other random decision identical to the host-noise stream.
        if not getattr(opt, "device_noise", False):
            out["noise"] = generate_noise_fast(
                opt.crop_size, opt.crop_size, rng.getrandbits(32)
            ).astype(np.float32)
        return out


class PrefetchLoader:
    """Thread-pool batch assembler with a bounded queue (double buffering)."""

    def __init__(self, dataset: CustomDataset, batch_size: int, shuffle: bool,
                 drop_last: bool, num_workers: int = 2, seed: int = 0,
                 prefetch: int = 2, shard: tuple = (0, 1)):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        # (process_index, process_count): every host draws the SAME global
        # batch index list (same seed/epoch), then keeps only its contiguous
        # slice — together the hosts assemble the global batch exactly once
        self.shard_rank, self.shard_count = shard
        assert batch_size % self.shard_count == 0, (
            f"batchSize {batch_size} must divide across "
            f"{self.shard_count} hosts"
        )
        self.local_batch_size = batch_size // self.shard_count

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        out = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            out = [b for b in out if len(b) == self.batch_size]
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Multi-worker ordered prefetch: N threads assemble batches from a
        shared work queue; results are emitted in batch order (deterministic
        given the epoch seed, matching the single-worker stream)."""
        batches = self._batches()
        n_batches = len(batches)
        work: queue.Queue = queue.Queue()
        for bi, batch_idx in enumerate(batches):
            work.put((bi, batch_idx))
        done: Dict[int, Dict[str, np.ndarray]] = {}
        done_lock = threading.Condition()
        stop = threading.Event()
        errors: List[BaseException] = []
        window = max(self.prefetch, self.num_workers)

        def worker():
            while not stop.is_set():
                try:
                    bi, batch_idx = work.get_nowait()
                except queue.Empty:
                    return
                try:
                    lb = self.local_batch_size
                    off = self.shard_rank * lb if self.shard_count > 1 else 0
                    local_idx = (
                        batch_idx[off : off + lb]
                        if self.shard_count > 1 else batch_idx
                    )
                    # per-sample rng keyed by GLOBAL batch position: host
                    # shards reproduce exactly the randomness of the
                    # unsharded stream
                    samples = [
                        self.dataset.get_sample(
                            i,
                            random.Random((self.seed, self.epoch, bi, off + j).__hash__()),
                        )
                        for j, i in enumerate(local_idx)
                    ]
                    stacked = {
                        k: np.stack([s[k] for s in samples]) for k in samples[0]
                    }
                except BaseException as e:
                    # surface the failure to the consumer — a dead worker
                    # must not leave __iter__ waiting on a batch forever
                    with done_lock:
                        errors.append(e)
                        done_lock.notify_all()
                    return
                with done_lock:
                    # bounded reorder buffer: don't run too far ahead
                    while (
                        not stop.is_set()
                        and len(done) >= window
                        and min(done) + window <= bi
                    ):
                        done_lock.wait(timeout=0.5)
                    done[bi] = stacked
                    done_lock.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for bi in range(n_batches):
                with done_lock:
                    while bi not in done:
                        if errors:
                            raise errors[0]
                        done_lock.wait(timeout=0.5)
                    item = done.pop(bi)
                    done_lock.notify_all()
                yield item
        finally:
            stop.set()
            with done_lock:
                done_lock.notify_all()
            # advance the epoch on ANY exit (full consumption, break, raise,
            # generator close): a consumer that stops mid-epoch must get a
            # fresh shuffle and fresh per-sample RNG on re-iteration, like
            # torch DataLoader's per-iter() reseed — not a replay
            self.epoch += 1


def prefetch_with(put, loader, depth: int = 1):
    """Yield (item, put(item)) with `put` (typically the host->device
    transfer) running `depth` items ahead on a feeder thread, overlapping
    the copy with whatever the consumer does between iterations.
    Exceptions raised by the loader or `put` re-raise in the consumer;
    early consumer exit (break / raise / close) unblocks and stops the
    feeder so queued device buffers and the loader's own worker threads
    are released."""
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    err = []
    stop = threading.Event()

    def feeder():
        it = iter(loader)
        try:
            for item in it:
                if stop.is_set():
                    return
                pair = (item, put(item))
                while not stop.is_set():
                    try:
                        q.put(pair, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised in the consumer
            err.append(e)
        finally:
            if hasattr(it, "close"):
                it.close()  # run the loader generator's cleanup here
            # must deliver the sentinel (a full queue would otherwise leave
            # the consumer blocked in q.get() forever) unless the consumer
            # already stopped and is draining
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue.Full:
                    continue

    threading.Thread(target=feeder, daemon=True).start()
    try:
        while True:
            got = q.get()
            if got is sentinel:
                if err:
                    raise err[0]
                return
            yield got
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


# name -> class, replacing the reference's find_dataset_using_name reflection
# (data/__init__.py:11-33); 'custom' is the only dataset the reference ships
DATASET_REGISTRY = {"custom": CustomDataset}


def create_dataloader(opt, step: int = 1, shard: tuple = (0, 1)) -> PrefetchLoader:
    """data/__init__.py:41-58 equivalent.

    `shard=(process_index, process_count)` makes each host assemble only its
    slice of every global batch (multi-host training; the reference is
    single-host-only, SURVEY §2.7)."""
    try:
        ds_cls = DATASET_REGISTRY[opt.dataset_mode]
    except KeyError:
        raise ValueError(
            f"unknown --dataset_mode '{opt.dataset_mode}' "
            f"(available: {sorted(DATASET_REGISTRY)})"
        ) from None
    ds = ds_cls(opt, step)
    return PrefetchLoader(
        ds,
        batch_size=opt.batchSize,
        shuffle=not opt.serial_batches,
        drop_last=opt.isTrain,
        num_workers=opt.nThreads,
        seed=opt.seed,
        shard=shard,
    )
