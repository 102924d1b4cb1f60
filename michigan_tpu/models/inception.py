"""InceptionV3 pool3 feature extractor for literature-comparable FID.

The reference's FID story (BASELINE.md) is the standard InceptionV3
pool3/2048-d formulation; this environment cannot fetch the torchvision
ImageNet weights, so like VGG19 (models/vgg.py) the extractor ships as a
converter + auto-discovery + loud random-fallback.  Convert with:

  python -m michigan_tpu.training.convert --inception inception_v3.pth \
      --out checkpoints/inception_v3.npz

Design: a pure-functional NHWC forward over a flat params dict keyed by the
torchvision module paths (`Mixed_5b.branch5x5_2`, ...).  Every conv is
torchvision's BasicConv2d = Conv(bias-free) + BatchNorm(eps=1e-3, running
stats) + ReLU; conv geometry lives in one spec table shared with
training/convert.convert_inception_v3 so the two cannot drift.  The forward
is inference-only (frozen extractor) and jit-friendly: static shapes, no
python control flow on data.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-3

# name -> (in_ch, out_ch, (kh, kw), (sh, sw), (ph, pw)); torchvision
# inception_v3 geometry (aux head omitted — FID never runs it)
Spec = Dict[str, Tuple[int, int, Tuple[int, int], Tuple[int, int], Tuple[int, int]]]


def _build_spec() -> Spec:
    S: Spec = {}

    def c(name, i, o, k=(1, 1), s=(1, 1), p=(0, 0)):
        S[name] = (i, o, k, s, p)

    c("Conv2d_1a_3x3", 3, 32, (3, 3), (2, 2))
    c("Conv2d_2a_3x3", 32, 32, (3, 3))
    c("Conv2d_2b_3x3", 32, 64, (3, 3), p=(1, 1))
    c("Conv2d_3b_1x1", 64, 80)
    c("Conv2d_4a_3x3", 80, 192, (3, 3))

    def inc_a(pre, i, pool_f):
        c(f"{pre}.branch1x1", i, 64)
        c(f"{pre}.branch5x5_1", i, 48)
        c(f"{pre}.branch5x5_2", 48, 64, (5, 5), p=(2, 2))
        c(f"{pre}.branch3x3dbl_1", i, 64)
        c(f"{pre}.branch3x3dbl_2", 64, 96, (3, 3), p=(1, 1))
        c(f"{pre}.branch3x3dbl_3", 96, 96, (3, 3), p=(1, 1))
        c(f"{pre}.branch_pool", i, pool_f)

    inc_a("Mixed_5b", 192, 32)
    inc_a("Mixed_5c", 256, 64)
    inc_a("Mixed_5d", 288, 64)

    c("Mixed_6a.branch3x3", 288, 384, (3, 3), (2, 2))
    c("Mixed_6a.branch3x3dbl_1", 288, 64)
    c("Mixed_6a.branch3x3dbl_2", 64, 96, (3, 3), p=(1, 1))
    c("Mixed_6a.branch3x3dbl_3", 96, 96, (3, 3), (2, 2))

    def inc_c(pre, c7):
        c(f"{pre}.branch1x1", 768, 192)
        c(f"{pre}.branch7x7_1", 768, c7)
        c(f"{pre}.branch7x7_2", c7, c7, (1, 7), p=(0, 3))
        c(f"{pre}.branch7x7_3", c7, 192, (7, 1), p=(3, 0))
        c(f"{pre}.branch7x7dbl_1", 768, c7)
        c(f"{pre}.branch7x7dbl_2", c7, c7, (7, 1), p=(3, 0))
        c(f"{pre}.branch7x7dbl_3", c7, c7, (1, 7), p=(0, 3))
        c(f"{pre}.branch7x7dbl_4", c7, c7, (7, 1), p=(3, 0))
        c(f"{pre}.branch7x7dbl_5", c7, 192, (1, 7), p=(0, 3))
        c(f"{pre}.branch_pool", 768, 192)

    inc_c("Mixed_6b", 128)
    inc_c("Mixed_6c", 160)
    inc_c("Mixed_6d", 160)
    inc_c("Mixed_6e", 192)

    c("Mixed_7a.branch3x3_1", 768, 192)
    c("Mixed_7a.branch3x3_2", 192, 320, (3, 3), (2, 2))
    c("Mixed_7a.branch7x7x3_1", 768, 192)
    c("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7), p=(0, 3))
    c("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1), p=(3, 0))
    c("Mixed_7a.branch7x7x3_4", 192, 192, (3, 3), (2, 2))

    def inc_e(pre, i):
        c(f"{pre}.branch1x1", i, 320)
        c(f"{pre}.branch3x3_1", i, 384)
        c(f"{pre}.branch3x3_2a", 384, 384, (1, 3), p=(0, 1))
        c(f"{pre}.branch3x3_2b", 384, 384, (3, 1), p=(1, 0))
        c(f"{pre}.branch3x3dbl_1", i, 448)
        c(f"{pre}.branch3x3dbl_2", 448, 384, (3, 3), p=(1, 1))
        c(f"{pre}.branch3x3dbl_3a", 384, 384, (1, 3), p=(0, 1))
        c(f"{pre}.branch3x3dbl_3b", 384, 384, (3, 1), p=(1, 0))
        c(f"{pre}.branch_pool", i, 192)

    inc_e("Mixed_7b", 1280)
    inc_e("Mixed_7c", 2048)
    return S


INCEPTION_SPEC: Spec = _build_spec()
FEATURE_DIM = 2048


def _bc(params, name: str, x: jax.Array) -> jax.Array:
    """BasicConv2d: conv (no bias) + BN at eps=1e-3 (running stats) + ReLU."""
    _, _, _k, stride, (ph, pw) = INCEPTION_SPEC[name]
    p = params[name]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), stride, ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # inference BN folded to scale/shift in fp32 for stable statistics
    inv = p["bn_scale"] * jax.lax.rsqrt(p["bn_var"] + BN_EPS)
    y = y.astype(jnp.float32) * inv + (p["bn_bias"] - p["bn_mean"] * inv)
    return jax.nn.relu(y).astype(x.dtype)


def _avg3(x: jax.Array) -> jax.Array:
    """F.avg_pool2d(x, 3, stride=1, padding=1) with count_include_pad=True
    (the torchvision default inside the Inception branches)."""
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return (s / 9.0).astype(x.dtype)


def _max3s2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype != jnp.bfloat16 else jnp.asarray(
            -jnp.inf, jnp.bfloat16),
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID",
    )


def _inception_a(p, pre, x):
    b1 = _bc(p, f"{pre}.branch1x1", x)
    b5 = _bc(p, f"{pre}.branch5x5_2", _bc(p, f"{pre}.branch5x5_1", x))
    b3 = _bc(p, f"{pre}.branch3x3dbl_3",
             _bc(p, f"{pre}.branch3x3dbl_2", _bc(p, f"{pre}.branch3x3dbl_1", x)))
    bp = _bc(p, f"{pre}.branch_pool", _avg3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _bc(p, "Mixed_6a.branch3x3", x)
    bd = _bc(p, "Mixed_6a.branch3x3dbl_3",
             _bc(p, "Mixed_6a.branch3x3dbl_2",
                 _bc(p, "Mixed_6a.branch3x3dbl_1", x)))
    return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


def _inception_c(p, pre, x):
    b1 = _bc(p, f"{pre}.branch1x1", x)
    b7 = _bc(p, f"{pre}.branch7x7_3",
             _bc(p, f"{pre}.branch7x7_2", _bc(p, f"{pre}.branch7x7_1", x)))
    bd = x
    for i in range(1, 6):
        bd = _bc(p, f"{pre}.branch7x7dbl_{i}", bd)
    bp = _bc(p, f"{pre}.branch_pool", _avg3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _bc(p, "Mixed_7a.branch3x3_2", _bc(p, "Mixed_7a.branch3x3_1", x))
    b7 = x
    for i in range(1, 5):
        b7 = _bc(p, f"Mixed_7a.branch7x7x3_{i}", b7)
    return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


def _inception_e(p, pre, x):
    b1 = _bc(p, f"{pre}.branch1x1", x)
    b3 = _bc(p, f"{pre}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [_bc(p, f"{pre}.branch3x3_2a", b3), _bc(p, f"{pre}.branch3x3_2b", b3)],
        axis=-1,
    )
    bd = _bc(p, f"{pre}.branch3x3dbl_2", _bc(p, f"{pre}.branch3x3dbl_1", x))
    bd = jnp.concatenate(
        [_bc(p, f"{pre}.branch3x3dbl_3a", bd), _bc(p, f"{pre}.branch3x3dbl_3b", bd)],
        axis=-1,
    )
    bp = _bc(p, f"{pre}.branch_pool", _avg3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_features(params, x: jax.Array) -> jax.Array:
    """x: NHWC in [-1, 1] (the torchvision normalize-to-[-1,1] convention of
    pytorch-fid) at 299x299 (any size >= 75 works; FID uses 299).  Returns
    (N, 2048) pool3 features."""
    x = _bc(params, "Conv2d_1a_3x3", x)
    x = _bc(params, "Conv2d_2a_3x3", x)
    x = _bc(params, "Conv2d_2b_3x3", x)
    x = _max3s2(x)
    x = _bc(params, "Conv2d_3b_1x1", x)
    x = _bc(params, "Conv2d_4a_3x3", x)
    x = _max3s2(x)
    for pre, _pf in (("Mixed_5b", 32), ("Mixed_5c", 64), ("Mixed_5d", 64)):
        x = _inception_a(params, pre, x)
    x = _inception_b(params, x)
    for pre in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, pre, x)
    x = _inception_d(params, x)
    x = _inception_e(params, "Mixed_7b", x)
    x = _inception_e(params, "Mixed_7c", x)
    return x.astype(jnp.float32).mean(axis=(1, 2))  # adaptive avg pool -> 2048


def init_inception_params(rng: jax.Array) -> Dict[str, Dict[str, jax.Array]]:
    """Kaiming-fan-in random fallback (same rationale as the VGG19 fallback:
    keeps activation variance ~constant so relative FID trajectories are
    meaningful even without ImageNet weights)."""
    params = {}
    for name, (i, o, (kh, kw), _s, _p) in INCEPTION_SPEC.items():
        rng, k = jax.random.split(rng)
        fan_in = i * kh * kw
        params[name] = {
            "kernel": jax.random.normal(k, (kh, kw, i, o), jnp.float32)
            * jnp.sqrt(2.0 / fan_in),
            "bn_scale": jnp.ones((o,), jnp.float32),
            "bn_bias": jnp.zeros((o,), jnp.float32),
            "bn_mean": jnp.zeros((o,), jnp.float32),
            "bn_var": jnp.ones((o,), jnp.float32),
        }
    return params


INCEPTION_ENV = "MICHIGAN_INCEPTION"


def find_inception_weights(checkpoints_dir: str = "./checkpoints"):
    import os

    cand = [os.environ.get(INCEPTION_ENV, "")]
    for base in (checkpoints_dir, "."):
        cand += [
            os.path.join(base, "inception_v3.npz"),
            os.path.join(base, "inception_v3_google-0cc3c7bd.pth"),
            os.path.join(base, "inception_v3.pth"),
        ]
    for path in cand:
        if path and os.path.exists(path):
            return path
    return None


def save_inception_npz(params, path: str) -> None:
    import numpy as np

    flat = {f"{name}/{k}": np.asarray(v)
            for name, p in params.items() for k, v in p.items()}
    np.savez(path, **flat)


def load_inception_params(rng, checkpoints_dir: str = "./checkpoints",
                          context: str = "FID"):
    """Returns (params, pretrained: bool), mirroring load_vgg19_variables."""
    import warnings

    import numpy as np

    path = find_inception_weights(checkpoints_dir)
    if path and path.endswith(".npz"):
        flat = dict(np.load(path))
        params: Dict[str, Dict] = {}
        for key, v in flat.items():
            name, leaf = key.rsplit("/", 1)
            params.setdefault(name, {})[leaf] = v
        print(f"loaded pretrained InceptionV3 from {path}")
        return params, True
    if path:  # torchvision .pth
        from michigan_tpu.training.convert import convert_inception_v3, load_pth

        params = convert_inception_v3(load_pth(path))
        print(f"loaded pretrained InceptionV3 from {path} (converted)")
        return params, True
    warnings.warn(
        f"InceptionV3 weights not found (searched ${INCEPTION_ENV}, "
        f"{checkpoints_dir}/inception_v3.npz): {context} runs on a RANDOM "
        "Inception backbone — NOT comparable to published FID. Convert "
        "with `python -m michigan_tpu.training.convert --inception "
        "<torch.pth> --out checkpoints/inception_v3.npz`.",
        stacklevel=2,
    )
    return init_inception_params(rng), False
