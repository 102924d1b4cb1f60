"""Single-image and batched inference CLI (reference inference.py).

`--batch_inference` extends the reference (which only ships single-image
inference): renders every name in --val_list_dir (up to --how_many) through
the jit-compiled pipeline in batches of --batchSize into --results_dir,
ready for evaluate.py's FID pass.


Usage matches the reference README:
  python inference.py --name MichiGAN --gpu_ids 0 --inference_ref_name 67172 \
      --inference_tag_name 67172 --inference_orient_name 67172 \
      --netG spadeb --use_encoder --noise_background --use_ig \
      --expand_mask_be --expand_th 5 --use_stroke --add_feat_zeros \
      --data_dir ./datasets/FFHQ_single --which_epoch 50

Loads converted torch checkpoints if present under checkpoints/<name>/
(falls back to an Orbax checkpoint, then to random init with a warning),
runs the jit-compiled inference function, writes
./inference_samples/{inpaint_,}fake_image.jpg like the reference.
"""

from __future__ import annotations

import os

import numpy as np


def batch_inference(opt, model, variables, rng):
    """Render the validation list in batches (beyond-reference capability)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from michigan_tpu.data.single import single_inference_data
    from michigan_tpu.utils.imaging import save_image, tensor2im

    names = [
        l.strip() for l in open(opt.val_list_dir) if l.strip()
    ][: opt.how_many]
    infer = jax.jit(lambda v, b: model.infer(v, b, rng=rng)[0])
    os.makedirs(opt.results_dir, exist_ok=True)
    bs = opt.batchSize
    # the seeded noise pyramid is identical for every sample — draw once
    from michigan_tpu.ops.noise import generate_noise

    noise = generate_noise(
        opt.crop_size, opt.crop_size, np.random.default_rng(opt.seed)
    )[None]
    for i in range(0, len(names), bs):
        chunk = names[i : i + bs]
        samples = []
        for name in chunk:
            o = dataclasses.replace(
                opt, inference_ref_name=name, inference_tag_name=name,
                inference_orient_name=name,
            )
            samples.append(single_inference_data(o, noise=noise))
        batch = {
            k: jnp.asarray(np.concatenate([s[k] for s in samples]))
            for k in samples[0]
            if isinstance(samples[0][k], np.ndarray) and samples[0][k].ndim >= 3
        }
        if len(chunk) < bs:  # pad the tail to the compiled batch shape
            padn = bs - len(chunk)
            batch = {
                k: jnp.concatenate([v] + [v[-1:]] * padn) for k, v in batch.items()
            }
        out = np.asarray(infer(variables, batch))
        r = opt.add_th // 2 if opt.add_feat_zeros else 0
        for j, name in enumerate(chunk):
            img = out[j]
            if r:
                img = img[r : r + opt.crop_size, r : r + opt.crop_size]
            save_image(tensor2im(img), os.path.join(opt.results_dir, name + ".jpg"))
        print(f"rendered {min(i + bs, len(names))}/{len(names)}")


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from michigan_tpu.config import test_options
    from michigan_tpu.data.single import single_inference_data
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training import checkpoint as CK
    from michigan_tpu.utils.imaging import crop_feat_pad, save_image, tensor2im

    import argparse

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--batch_inference", action="store_true")
    pre_args, rest = pre.parse_known_args(argv)

    opt = test_options(rest)
    model = MichiGANModel(opt)

    data = single_inference_data(opt)
    batch = {
        k: jnp.asarray(v) for k, v in data.items() if isinstance(v, np.ndarray)
    }

    rng = jax.random.PRNGKey(opt.seed)
    # jitted init: eager init is hundreds of tiny dispatches, pathological
    # through a remote-TPU relay (see bench.py)
    variables = jax.jit(model.init_variables)(rng, batch)

    restored = CK.load_variables(opt, opt.which_epoch)
    if restored is not None:
        variables = restored
        print(f"restored Orbax checkpoint epoch {opt.which_epoch}")
    variables = CK.load_pretrained_torch(opt, variables)

    if pre_args.batch_inference:
        batch_inference(opt, model, variables, rng)
        return

    infer = jax.jit(lambda v, b: model.infer(v, b, rng=rng))
    generated, _orient = infer(variables, batch)
    generated = np.asarray(generated)
    print(f"process image... {data['path']}")

    if opt.add_feat_zeros:
        # crop the zero-pad frame before compositing; the reference crops
        # only after compositing, which breaks --remove_background with
        # --add_feat_zeros (shape mismatch) — documented divergence
        r = opt.add_th // 2
        generated = generated[:, r : r + opt.crop_size, r : r + opt.crop_size, :]

    if opt.remove_background:
        mask = data["label_tag"]
        generated = generated * mask + data["image_tag"] * (1 - mask)

    fake = tensor2im(generated[0])
    if opt.add_zeros:
        fake = crop_feat_pad(fake, opt.crop_size, opt.add_th)

    os.makedirs("./inference_samples", exist_ok=True)
    name = "inpaint_fake_image.jpg" if opt.use_ig else "fake_image.jpg"
    save_image(fake, os.path.join("./inference_samples", name))
    print(f"saved ./inference_samples/{name}")


if __name__ == "__main__":
    main()
