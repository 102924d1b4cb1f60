"""bf16 vs fp32 training-quality check: overfit one real batch (sample
67172) for N steps and compare reconstruction-loss trajectories.  Justifies
(or rejects) bf16 as the recommended training dtype (ROADMAP)."""

from __future__ import annotations

import json
import os

import numpy as np


def run(dtype: str, steps: int, size: int = 128):
    import jax
    import jax.numpy as jnp

    from michigan_tpu.config import Options
    from michigan_tpu.data.single import single_inference_data
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training.state import TrainState
    from michigan_tpu.training.train_step import make_train_steps

    opt = Options(
        isTrain=True, batchSize=4, crop_size=size, load_size=size,
        netG="spadeb", use_encoder=True, use_ig=True, noise_background=True,
        random_expand_mask=True, num_upsampling_layers="more", dtype=dtype,
        donate_buffers=False, seed=0,
        data_dir="./datasets/FFHQ_single",
        inference_ref_name="67172", inference_tag_name="67172",
        inference_orient_name="67172", subset="val",
    ).finalize()
    data = single_inference_data(opt)
    batch = {
        k: jnp.asarray(np.repeat(v, 4, axis=0))
        for k, v in data.items()
        if isinstance(v, np.ndarray) and v.ndim >= 3
    }
    model, g_step, d_step = make_train_steps(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(2, jnp.int32)

    track = {"lab": [], "rgb": [], "background": [], "GAN": []}
    for i in range(steps):
        srng = jax.random.fold_in(rng, i)
        state, g_losses, _, orient = g_step(state, batch, srng, extra)
        state, d_losses = d_step(state, batch, srng, extra, orient=orient)
        if i % 10 == 0 or i == steps - 1:
            for k in track:
                track[k].append(round(float(g_losses[k]), 4))
    return track


def main():
    steps = int(os.environ.get("QSTEPS", "100"))
    for dtype in ("float32", "bfloat16"):
        track = run(dtype, steps)
        print(json.dumps({"dtype": dtype, **track}), flush=True)


if __name__ == "__main__":
    main()
