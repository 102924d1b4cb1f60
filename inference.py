"""Single-image inference CLI (reference inference.py).

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
import sys

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from michigan_tpu.config import test_options
    from michigan_tpu.data.single import single_inference_data
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training import checkpoint as CK
    from michigan_tpu.utils.imaging import crop_feat_pad, save_image, tensor2im

    opt = test_options(argv)
    model = MichiGANModel(opt)

    data = single_inference_data(opt)
    batch = {
        k: jnp.asarray(v) for k, v in data.items() if isinstance(v, np.ndarray)
    }

    rng = jax.random.PRNGKey(opt.seed)
    variables = model.init_variables(rng, batch)

    restored = CK.load_variables(opt, opt.which_epoch)
    if restored is not None:
        variables = restored
        print(f"restored Orbax checkpoint epoch {opt.which_epoch}")
    variables = CK.load_pretrained_torch(opt, variables)

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
