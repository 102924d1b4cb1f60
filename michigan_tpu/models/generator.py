"""SPADEB generator — the backbone (reference generator.py:19-230).

Pure-function Flax rewrite: the reference's mode flags become static config,
per-scale background compositing and hair-mask pyramids are computed inline,
and all upsampling is exact 2x pixel replication.  Inputs are NHWC:

  input_ref   (N,H,W,label_nc)  one-hot reference segmentation
  input_tag   (N,H,W,label_nc)  one-hot target segmentation
  orient      (N,H,W,1) raw dense orient in [0,255]  (use_ig=False), or
              (N,H,W,2) already-decoded (sin2t,cos2t)*mask (use_ig=True)
  image_ref   (N,H,W,3) in [-1,1]
  image_tag   (N,H,W,3) in [-1,1]
  noise       (N,H,W,3) noise pyramid in [0,1]
  z           (N,z_dim) optional VAE latent
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from michigan_tpu.models.architecture import SPADEResnetBlock
from michigan_tpu.models.encoders import (
    BackgroundEncode,
    BackgroundEncode2,
    ImageEncoder,
    ImageEncoder2,
    ImageEncoder3,
)
from michigan_tpu.models.layers import TorchConv, TorchLinear
from michigan_tpu.ops.masks import wide_edges_outer
from michigan_tpu.ops.resize import resize_nearest, upsample2x_nearest


def orient_to_two_channel(orient255: jax.Array, hair_mask: jax.Array) -> jax.Array:
    """Raw [0,255] orientation map -> (sin 2t, cos 2t) * hair mask
    (generator.py:131-133, pix2pix_model.py:548-551)."""
    t = orient255 / 255.0 * math.pi
    two = jnp.concatenate([jnp.sin(2 * t), jnp.cos(2 * t)], axis=-1)
    return two * hair_mask


class SPADEBGenerator(nn.Module):
    opt: object
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        input_ref: jax.Array,
        input_tag: jax.Array,
        orient: jax.Array,
        image_ref: jax.Array,
        image_tag: jax.Array,
        noise: jax.Array,
        z: Optional[jax.Array] = None,
        train: bool = False,
        extra_dilate_steps=None,
    ) -> jax.Array:
        opt = self.opt
        nf = opt.ngf
        sw, sh = opt.latent_size()
        seg = input_tag
        hair_mask = input_tag[..., 1:2]

        # ---- latent seed (generator.py:110-127) ----
        if opt.use_vae:
            x = TorchLinear(16 * nf * sw * sh, name="fc")(z)
            x = x.reshape(-1, 16 * nf, sh, sw)  # torch channel-major view
            x = jnp.transpose(x, (0, 2, 3, 1))
        elif opt.use_encoder:
            if opt.Image_encoder_mode == "norm":
                x = ImageEncoder(opt, sw, sh, self.axis_name, name="fc")(
                    image_ref, train=train
                )
            else:
                enc = {"instance": ImageEncoder2, "partialconv": ImageEncoder3}[
                    opt.Image_encoder_mode
                ]
                x = enc(opt, sw, sh, self.axis_name, name="fc")(
                    image_ref, input_ref[..., 1:2], input_tag[..., 1:2], train=train
                )
        else:
            # F.interpolate default mode is nearest (generator.py:126)
            x = resize_nearest(image_ref, (sh, sw))
            x = TorchConv(16 * nf, 3, padding=1, name="fc")(x, train)

        # ---- conditioning map (generator.py:129-142) ----
        if not opt.no_orientation:
            if not opt.use_ig:
                orient_input = orient_to_two_channel(orient, hair_mask)
            else:
                orient_input = orient
            if opt.orient_random_disturb:
                edges = wide_edges_outer(hair_mask, 5)
                orient_input = orient_input * (1 - edges) + edges * noise[..., 0:1]
            seg = jnp.concatenate([seg, orient_input.astype(seg.dtype)], axis=-1)

        # ---- background features (generator.py:144-147) ----
        if not opt.noise_background:
            back_feats, back_masks = BackgroundEncode(opt, name="backgroud_enc")(
                image_tag, input_tag, train=train
            )
        else:
            back_feats, back_masks = BackgroundEncode2(opt, name="backgroud_enc")(
                image_tag, input_tag, noise, train=train,
                extra_dilate_steps=extra_dilate_steps,
            )

        # ---- hair-mask pyramid (generator.py:149-159) ----
        H, W = hair_mask.shape[1], hair_mask.shape[2]
        hm = [resize_nearest(hair_mask, (H // f, W // f)) for f in (2, 4, 8, 16)]
        if opt.num_upsampling_layers == "most":
            hair_masks = [hm[3], hm[2], hm[1], hm[0], hair_mask]
        else:
            hair_masks = [hm[2], hm[1], hm[0], hair_mask]

        remat_sel = getattr(opt, "remat_blocks", "all")
        remat_names = None if remat_sel == "all" else set(
            s for s in remat_sel.split(",") if s
        )
        if remat_names is not None:
            valid = {"head_0", "G_middle_0", "G_middle_1",
                     "up_0", "up_1", "up_2", "up_3"}
            if opt.num_upsampling_layers == "most":
                valid.add("up_4")
            unknown = remat_names - valid
            if unknown:
                # a typo here would silently disable remat and OOM later
                raise ValueError(
                    f"--remat_blocks: unknown block(s) {sorted(unknown)}; "
                    f"valid: {sorted(valid)} or 'all'"
                )

        def block(name, fin, fout):
            cls = SPADEResnetBlock
            selected = remat_names is None or name in remat_names
            if getattr(opt, "remat", False) and train and selected:
                # rematerialize this SPADE block's activations in the
                # backward pass (HBM for FLOPs; SURVEY §7 hard-parts).
                # --remat_blocks selects which (high-res blocks hold nearly
                # all the memory; skipping the small ones skips recompute)
                # flax remat argnums count `self` as position 0
                cls = nn.remat(SPADEResnetBlock, static_argnums=(3,))
            return cls(fin, fout, opt, self.axis_name, name=name)

        def composite(xx, i):
            if opt.bf_direct_add:
                return back_feats[i] + xx
            return back_feats[i] * (1 - hair_masks[i]) + xx * (1 - back_masks[i])

        def clip(xx):
            if opt.use_clip:
                return jnp.where(xx > opt.clip_th, 0.0, xx)
            return xx

        # ---- trunk (generator.py:161-229) ----
        x = block("head_0", 16 * nf, 16 * nf)(x, seg, train)
        x = upsample2x_nearest(x)
        x = block("G_middle_0", 16 * nf, 16 * nf)(x, seg, train)
        if opt.num_upsampling_layers in ("more", "most"):
            x = upsample2x_nearest(x)
        x = clip(block("G_middle_1", 16 * nf, 16 * nf)(x, seg, train))

        x = upsample2x_nearest(x)
        x = clip(block("up_0", 16 * nf, 8 * nf)(x, seg, train))
        x = composite(x, 0)

        x = upsample2x_nearest(x)
        x = clip(block("up_1", 8 * nf, 4 * nf)(x, seg, train))
        x = composite(x, 1)

        x = upsample2x_nearest(x)
        x = clip(block("up_2", 4 * nf, 2 * nf)(x, seg, train))
        x = composite(x, 2)

        x = upsample2x_nearest(x)
        x = clip(block("up_3", 2 * nf, 1 * nf)(x, seg, train))
        x = composite(x, 3)

        if opt.num_upsampling_layers == "most":
            x = upsample2x_nearest(x)
            x = block("up_4", 1 * nf, nf // 2)(x, seg, train)
            x = composite(x, 4)

        x = TorchConv(3, 3, padding=1, name="conv_img")(
            jax.nn.leaky_relu(x, 0.2), train
        )
        return jnp.tanh(x)
