"""Step-time breakdown of the bs8 512^2 training config on one TPU chip.

Times jitted sub-programs (forward and forward+backward where meaningful) so
the G-step total can be attributed: generator fwd, IG fwd, VGG tower (x3),
orientation filter bank loss, discriminator fwd, full g/d steps.

Usage:  python scripts/profile_train.py [--dtype float32] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _sync(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    # value fetch: through the axon relay block_until_ready does not block
    float(np.asarray(leaves[0]).ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from michigan_tpu.config import Options
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training.state import TrainState
    from michigan_tpu.training.train_step import make_train_steps

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    opt = Options(
        isTrain=True, batchSize=args.batch, crop_size=args.size,
        load_size=args.size, netG="spadeb", use_encoder=True, use_ig=True,
        noise_background=True, random_expand_mask=True, remat=True,
        num_upsampling_layers="more", dtype=args.dtype, donate_buffers=False,
    ).finalize()
    model = MichiGANModel(opt)

    rng_np = np.random.default_rng(0)
    s, n = opt.crop_size, opt.batchSize
    batch = {
        "label_ref": jnp.asarray(rng_np.integers(0, 2, (n, s, s, 1)), jnp.float32),
        "label_tag": jnp.asarray(rng_np.integers(0, 2, (n, s, s, 1)), jnp.float32),
        "image_ref": jnp.asarray(rng_np.uniform(-1, 1, (n, s, s, 3)), jnp.float32),
        "image_tag": jnp.asarray(rng_np.uniform(-1, 1, (n, s, s, 3)), jnp.float32),
        "orient": jnp.asarray(rng_np.uniform(0, 255, (n, s, s, 1)), jnp.float32),
        "hole": jnp.asarray(rng_np.integers(0, 2, (n, s, s, 1)), jnp.float32),
        "orient_rgb": jnp.asarray(rng_np.uniform(0, 1, (n, s, s, 3)), jnp.float32),
        "noise": jnp.asarray(rng_np.uniform(0, 1, (n, s, s, 3)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init_variables)(key, batch)
    extra = jnp.asarray(2, jnp.int32)

    times = {}

    def record(name, fn, *a):
        times[name] = timeit(fn, *a, iters=args.iters)
        print(f"{name}: {times[name] * 1e3:.2f} ms", flush=True)

    if os.environ.get("PROFILE_FULL_STEPS", "0") == "1":
        _, g_step, d_step = make_train_steps(opt)
        state = TrainState.create(opt, variables)
        record("g_step_total",
               lambda: g_step(state, batch, key, extra)[1]["GAN"])
        record("d_step_total",
               lambda: d_step(state, batch, key, extra)[1]["D_Fake"])

    # ---- components (forward only) ----
    pre = jax.jit(model.preprocess)(batch)

    # every timed jit reduces its output to a scalar ON DEVICE: the relay
    # sync fetches the jit output, so returning an activation tensor would
    # add D2H transfer (~57 MB/s) to the measurement (one fetch per
    # timeit, amortized over iters — a 5-10% distortion at these sizes)

    @jax.jit
    def ig_fwd(variables):
        hair = pre["input_tag"][..., 1:2]
        _, o = model.inpaint_orient(
            variables, pre["hole"], pre["orient_rgb"], pre["noise"], hair
        )
        return jnp.sum(o)

    record("ig_forward", ig_fwd, variables)

    @jax.jit
    def ig_out(variables):
        hair = pre["input_tag"][..., 1:2]
        return model.inpaint_orient(
            variables, pre["hole"], pre["orient_rgb"], pre["noise"], hair
        )[1]

    orient = ig_out(variables)

    def _gen(variables):
        fake, _, _, _ = model.generate_fake(
            variables, pre, orient, rng=key, train=True, mutable=False,
            extra_dilate_steps=extra,
        )
        return fake

    record("generator_forward", jax.jit(lambda v: jnp.sum(_gen(v))), variables)
    fake = jax.jit(_gen)(variables)

    @jax.jit
    def vgg_fwd(variables):
        return jnp.sum(model.vgg.apply(variables["vgg"], fake)[-1])

    record("vgg_forward_x1", vgg_fwd, variables)

    @jax.jit
    def d_fwd(variables):
        pf, pr = model.discriminate(
            variables, pre["input_tag"], fake, pre["image_tag"], orient,
            train=True, curr_step=1,
        )
        return jnp.sum(pf[0][-1])

    record("discriminator_forward", d_fwd, variables)

    from michigan_tpu import losses as L

    @jax.jit
    def orient_loss_fwd(fake):
        l1, conf = L.orient_loss(fake, orient, pre["input_tag"], opt)
        return l1 + conf

    record("orient_loss_forward", orient_loss_fwd, fake)

    @jax.jit
    def orient_loss_grad(fake):
        return jnp.sum(jax.grad(
            lambda f: sum(L.orient_loss(f, orient, pre["input_tag"], opt))
        )(fake))

    record("orient_loss_fwd_bwd", orient_loss_grad, fake)

    @jax.jit
    def gen_fwd_bwd(variables):
        def loss(params):
            v = dict(variables)
            v["netG"] = dict(v["netG"])
            v["netG"]["params"] = params
            f, _, _, _ = model.generate_fake(
                v, pre, orient, rng=key, train=True, mutable=False,
                extra_dilate_steps=extra,
            )
            return jnp.mean(f)

        g = jax.grad(loss)(variables["netG"]["params"])
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    record("generator_fwd_bwd", gen_fwd_bwd, variables)

    report = {
        "config": f"bs{n} {s}px {args.dtype} remat",
        "times_ms": {k: round(v * 1e3, 2) for k, v in times.items()},
    }
    if "g_step_total" in times:
        report["imgs_per_sec_g_plus_d"] = round(
            n / (times["g_step_total"] + times["d_step_total"]), 2
        )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
