"""Shape-bucketed serving session.

TPU/XLA programs are compiled per static shape, so a production server
cannot jit per request batch size.  The standard TPU serving pattern is
shape buckets: requests are padded up to the nearest configured batch
bucket and dispatched to an ahead-of-time compiled executable for that
bucket; oversized batches are split into max-bucket chunks.  All buckets
are AOT-compiled (`jit.lower(...).compile()`) before traffic, so the first
request pays dispatch only — the analog of the demo shell's precompile
(demo/engine.py) generalized to a serving front end.

The reference has no equivalent (its demo runs eager torch per event,
reference demo.py:244-334); this is infrastructure the TPU compilation
model requires.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import numpy as np


class InferenceSession:
    """AOT-compiled, shape-bucketed inference front end.

    session = InferenceSession(model, variables, image_shape=(512, 512))
    session.precompile()                       # compiles every bucket
    images, orients = session.infer(batch)     # any batch size, numpy in/out
    """

    #: batch -> dtype/trailing-channel layout of each model.infer input
    BATCH_CHANNELS: Dict[str, int] = {
        "label_ref": 1, "label_tag": 1, "image_ref": 3, "image_tag": 3,
        "orient": 1, "hole": 1, "orient_rgb": 3, "noise": 3,
    }

    def __init__(self, model, variables, image_shape: Tuple[int, int],
                 buckets: Sequence[int] = (1, 4, 8)):
        self.model = model
        self.variables = variables
        self.image_shape = tuple(image_shape)
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError(f"buckets must be positive: {buckets!r}")
        self._jit = jax.jit(model.infer)
        self._compiled = {}

    def _batch_struct(self, n: int):
        h, w = self.image_shape
        return {
            k: jax.ShapeDtypeStruct((n, h, w, c), np.float32)
            for k, c in self.BATCH_CHANNELS.items()
        }

    def precompile(self):
        """AOT-compile every bucket from shape specs — no device execution,
        no example data needed."""
        var_struct = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.variables
        )
        for b in self.buckets:
            if b not in self._compiled:
                self._compiled[b] = self._jit.lower(
                    var_struct, self._batch_struct(b)
                ).compile()

    def _dispatch(self, bucket: int, batch):
        if bucket in self._compiled:
            return self._compiled[bucket](self.variables, batch)
        return self._jit(self.variables, batch)

    def infer(self, batch: Dict[str, np.ndarray]):
        """Run any-size batch through the bucketed executables.  Pads by
        repeating the last sample (never zeros: degenerate all-zero masks
        can produce NaNs that --debug_nans style checks would trip on),
        slices the padding back off.  Returns numpy (images, orient_rgb);
        orient_rgb is None when the model runs without IG inpainting."""
        n = next(iter(batch.values())).shape[0]
        if any(v.shape[0] != n for v in batch.values()):
            raise ValueError("inconsistent batch sizes across inputs")
        images, orients = [], []
        start = 0
        while start < n:
            take = min(n - start, self.buckets[-1])
            bucket = next(b for b in self.buckets if b >= take)
            chunk = {}
            for k, v in batch.items():
                part = np.asarray(v[start:start + take], np.float32)
                if take < bucket:
                    pad = np.repeat(part[-1:], bucket - take, axis=0)
                    part = np.concatenate([part, pad], axis=0)
                chunk[k] = part
            out, orient_rgb = self._dispatch(bucket, chunk)
            images.append(np.asarray(out)[:take])
            orients.append(
                None if orient_rgb is None else np.asarray(orient_rgb)[:take]
            )
            start += take
        image = np.concatenate(images, axis=0)
        orient = None if orients[0] is None else np.concatenate(orients, axis=0)
        return image, orient
