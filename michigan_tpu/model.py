"""MichiGAN model orchestrator — the reference `Pix2PixModel`
(models/pix2pix_model.py:18-610) re-designed as pure jit-compiled functions.

The reference funnels everything through `forward(data, mode)` because
DataParallel can only parallelize `forward` (pix2pix_model.py:58-61).  Here
each behavior is its own pure function over explicit variable trees:

  preprocess(batch)            one-hot labels, instance edges
  inpaint_orient(...)          IG path (pix2pix_model.py:407-429)
  inpaint_stroke_orient(...)   SIG path (pix2pix_model.py:431-464)
  generate_fake(...)           VAE + zeros-pad + netG + netB (:495-541)
  discriminate(...)            fake+real single batch + divide (:546-594)
  generator_loss(...)          (:257-365)
  discriminator_loss(...)      (:367-398)
  infer(...)                   'inference'/'demo_inference' modes (:80-120)

All arrays NHWC.  `variables` is a dict of per-net flax variable trees:
{'netG':…, 'netD':…, 'netE':…, 'netIG':…, 'netSIG':…, 'netB':…, 'vgg':…}.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from michigan_tpu import models as nets
from michigan_tpu import losses as L
from michigan_tpu.models.generator import orient_to_two_channel
from michigan_tpu.models.vgg import VGG19
from michigan_tpu.ops.masks import instance_edges, one_hot_label
from michigan_tpu.ops.resize import resize_nearest


class MichiGANModel:
    """Holds static config + module definitions; all methods are pure in
    (variables, batch) and safe to close over in jit."""

    def __init__(self, opt, axis_name: Optional[str] = None):
        self.opt = opt
        self.axis_name = axis_name
        self.compute_dtype = (
            jnp.bfloat16 if getattr(opt, "dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        self.netG = nets.define_G(opt, axis_name)
        self.netD = nets.define_D(opt, axis_name) if opt.isTrain else None
        self.netD2 = (
            nets.define_D(opt, axis_name) if (opt.isTrain and opt.unpairTrain) else None
        )
        self.netE = nets.define_E(opt, axis_name) if opt.use_vae else None
        self.netIG = nets.define_IG(opt) if opt.use_ig else None
        self.netSIG = nets.define_SIG(opt) if opt.use_stroke else None
        self.netB = nets.define_B(opt) if opt.use_blender else None
        self.netFE = nets.define_FE(opt) if opt.use_instance_feat else None
        self.vgg = VGG19() if opt.isTrain else None

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def init_variables(self, rng: jax.Array, batch: Dict[str, Any]) -> Dict[str, Any]:
        opt = self.opt
        from michigan_tpu.models.layers import set_default_init_type

        prev_type, prev_gain = set_default_init_type(
            getattr(opt, "init_type", "xavier"),
            getattr(opt, "init_variance", None),
        )
        try:
            return self._init_variables(rng, batch)
        finally:
            set_default_init_type(prev_type, prev_gain)

    def _init_variables(self, rng: jax.Array, batch: Dict[str, Any]) -> Dict[str, Any]:
        opt = self.opt
        pre = self.preprocess(batch)
        keys = jax.random.split(rng, 8)
        out: Dict[str, Any] = {}

        orient_for_g = pre["orient"]
        if opt.use_ig:
            s = pre["input_tag"].shape[1]
            orient_for_g = jnp.zeros(pre["input_tag"].shape[:3] + (2,))
        z = None
        if opt.use_vae:
            out["netE"] = self.netE.init(keys[3], pre["image_ref"])
            z = jnp.zeros((pre["image_ref"].shape[0], opt.z_dim))

        # init always traces train=False: every variable (params, running
        # stats, spectral u/v) is created either way, and the eval path has
        # no psum — init can run outside shard_map even on a meshed model
        gin = self._padded_gen_inputs(pre, orient_for_g)
        out["netG"] = self.netG.init(
            keys[0], gin["input_ref"], gin["input_tag"], gin["orient"],
            gin["image_ref"], gin["image_tag"], gin["noise"], z=z, train=False,
        )
        if self.netD is not None:
            s = pre["input_tag"].shape[1]
            dummy = jnp.zeros((2, s, s, opt.d_input_nc()))
            out["netD"] = self.netD.init(keys[1], dummy, train=False)
        if self.netD2 is not None:
            s = pre["input_tag"].shape[1]
            dummy = jnp.zeros((2, s, s, opt.d_input_nc()))
            out["netD2"] = self.netD2.init(keys[2], dummy, train=False)
        if self.netIG is not None:
            out["netIG"] = self.netIG.init(keys[4], jnp.zeros((1, 256, 256, 4)))
        if self.netSIG is not None:
            out["netSIG"] = self.netSIG.init(keys[5], jnp.zeros((1, 256, 256, 5)))
        if self.netB is not None:
            out["netB"] = self.netB.init(
                keys[6], pre["image_tag"], pre["image_tag"], pre["input_tag"],
                pre["noise"],
            )
        if self.netFE is not None:
            # --no_instance pipelines carry a degenerate (N,) placeholder
            # under "instance" (single.py/pix2pix loaders); netFE init needs
            # a real NHWC map (flushed by the r5 flag-matrix inference run)
            inst = batch.get("instance")
            if inst is None or getattr(inst, "ndim", 0) != 4:
                inst = jnp.zeros_like(pre["image_tag"][..., :1])
            out["netFE"] = self.netFE.init(
                jax.random.fold_in(keys[6], 1), pre["image_tag"], inst,
            )
        if self.vgg is not None:
            from michigan_tpu.models.vgg import load_vgg19_variables

            out["vgg"], self.vgg_pretrained = load_vgg19_variables(
                keys[7], getattr(opt, "checkpoints_dir", "./checkpoints"),
                context="training",
            )
        return self.compact_frozen_variables(out)

    def compact_frozen_variables(self, variables):
        """Under the bf16 compute policy, store the FROZEN towers' weights
        in bf16: IG/SIG/VGG never train (stop_gradient + outside every
        optimizer tree) and their convs already run bf16, so fp32 storage
        only doubles their HBM weight-read traffic (3 VGG towers/step) and
        wastes ~55 MB.  fp32 compute keeps fp32 storage byte-identical."""
        if self.compute_dtype != jnp.bfloat16:
            return variables
        out = dict(variables)
        for name in ("vgg", "netIG", "netSIG"):
            if name in out:
                out[name] = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a,
                    out[name],
                )
        return out

    # ------------------------------------------------------------------
    # preprocessing (pix2pix_model.py:209-254)
    # ------------------------------------------------------------------

    def preprocess(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        opt = self.opt
        # uint8-wire images (dataset.py get_sample) reaching preprocess
        # undecoded (e.g. the init path): apply the exact ToTensor+Normalize
        # decode here; batches that came through train_step._f32 are
        # already float and pass through untouched
        batch = {
            k: (v.astype(jnp.float32) / 127.5 - 1.0
                if hasattr(v, "dtype") and v.dtype == jnp.uint8
                and k in ("image_ref", "image_tag") else v)
            for k, v in batch.items()
        }
        nc = opt.label_nc + (1 if opt.contain_dontcare_label else 0)
        input_ref = one_hot_label(batch["label_ref"], nc)
        input_tag = one_hot_label(batch["label_tag"], nc)
        if not opt.no_instance:
            edges = instance_edges(batch["instance"])
            input_tag = jnp.concatenate([input_tag, edges], axis=-1)
        out = dict(batch)
        out["input_ref"] = input_ref
        out["input_tag"] = input_tag
        return out

    # ------------------------------------------------------------------
    # orientation inpainting (pix2pix_model.py:407-464)
    # ------------------------------------------------------------------

    def _run_ig(self, net, variables, inp):
        opt = self.opt
        if opt.crop_size != 256 or inp.shape[1] != 256:
            inp = resize_nearest(inp, (256, 256))
        # frozen tower follows the compute policy: under --dtype bfloat16 the
        # IG conv stack runs bf16 (half the HBM traffic, double MXU rate);
        # the orient decode and compositing stay fp32
        out = net.apply(variables, inp.astype(self.compute_dtype))
        out = out.astype(jnp.float32)
        if out.shape[1] != opt.crop_size:
            out = resize_nearest(out, (opt.crop_size, opt.crop_size))
        return out

    @staticmethod
    def _decode_orient_rgb(output: jax.Array, mask: jax.Array) -> jax.Array:
        """RGB [0,1] -> 2ch (sin2t, cos2t)*mask.  The RGB encoding stores
        cos in R and sin in G (base_dataset.py:363-385), so channels swap."""
        two = (output[..., :2] - 0.5) * 2.0
        return jnp.stack([two[..., 1], two[..., 0]], axis=-1) * mask

    def inpaint_orient(self, variables, hole, orient_rgb, noise, mask):
        """(inpainted_rgb, 2ch orient) — pix2pix_model.py:407-429."""
        comp = orient_rgb * (1 - hole) + noise * hole
        inp = jnp.concatenate([comp, hole], axis=-1)
        output = self._run_ig(self.netIG, variables["netIG"], inp)
        output = output * hole + orient_rgb * (1 - hole)
        return output, self._decode_orient_rgb(output, mask)

    def inpaint_stroke_orient(
        self, variables, hole, orient_rgb, noise, mask, stroke, stroke_mask,
        mask_orient_rgb,
    ):
        """SIG path with the conditional two-stage inpaint
        (pix2pix_model.py:431-464), expressed as lax.cond so it stays
        jittable."""

        def two_stage(_):
            rgb1, _o = self.inpaint_orient(
                variables, mask - mask_orient_rgb, orient_rgb, noise, mask
            )
            return rgb1

        def one_stage(_):
            return orient_rgb

        need_prefill = jnp.max(mask - mask_orient_rgb) != 0
        orient_rgb_1 = jax.lax.cond(need_prefill, two_stage, one_stage, None)

        comp = (
            orient_rgb_1 * (1 - hole)
            + noise * (hole - stroke_mask)
            + stroke * stroke_mask
        )
        inp = jnp.concatenate([comp, hole, stroke_mask], axis=-1)
        output = self._run_ig(self.netSIG, variables["netSIG"], inp)
        output = output * hole + orient_rgb_1 * (1 - hole)
        return output, self._decode_orient_rgb(output, mask)

    # ------------------------------------------------------------------
    # generation (pix2pix_model.py:495-541)
    # ------------------------------------------------------------------

    def _zeros_pad(self, x: jax.Array) -> jax.Array:
        th = self.opt.add_th
        r = th // 2
        return jnp.pad(x, ((0, 0), (r, th - r), (r, th - r), (0, 0)))

    def _padded_gen_inputs(self, pre, orient) -> Dict[str, jax.Array]:
        opt = self.opt
        gin = {
            "input_ref": pre["input_ref"],
            "input_tag": pre["input_tag"],
            "orient": orient,
            "image_ref": pre["image_ref"],
            "image_tag": pre["image_tag"],
            "noise": pre["noise"],
        }
        if opt.add_feat_zeros:
            gin = {k: self._zeros_pad(v) for k, v in gin.items()}
        # bf16 compute policy: halve HBM traffic / double MXU rate; params
        # stay fp32 (cast per-conv), norm statistics accumulate in fp32
        gin = {k: v.astype(self.compute_dtype) for k, v in gin.items()}
        return gin

    def encode_z(self, variables, image, rng):
        mu, logvar = self.netE.apply(variables["netE"], image)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape)
        return eps * std + mu, mu, logvar

    def generate_fake(
        self, variables, pre, orient, rng=None, train=False, mutable=False,
        extra_dilate_steps=None,
    ):
        """Returns (fake_image, kld_loss, blend_image, netG state updates)."""
        opt = self.opt
        z, kld = None, None
        if opt.use_vae:
            z, mu, logvar = self.encode_z(variables, pre["image_ref"], rng)
            kld = L.kld_loss(mu, logvar) * opt.lambda_kld

        gin = self._padded_gen_inputs(pre, orient)
        updates = {}
        fake_image = None
        if not opt.only_blend:
            if mutable:
                fake_image, updates = self.netG.apply(
                    variables["netG"],
                    gin["input_ref"], gin["input_tag"], gin["orient"],
                    gin["image_ref"], gin["image_tag"], gin["noise"], z=z,
                    train=train, extra_dilate_steps=extra_dilate_steps,
                    mutable=["batch_stats", "spectral"],
                )
            else:
                fake_image = self.netG.apply(
                    variables["netG"],
                    gin["input_ref"], gin["input_tag"], gin["orient"],
                    gin["image_ref"], gin["image_tag"], gin["noise"], z=z,
                    train=train, extra_dilate_steps=extra_dilate_steps,
                )

        if fake_image is not None:
            fake_image = fake_image.astype(jnp.float32)

        blend_image = None
        if opt.use_blender:
            src = pre["image_ref"] if opt.only_blend else fake_image
            blend_image = self.netB.apply(
                variables["netB"], src.astype(self.compute_dtype),
                pre["image_tag"].astype(self.compute_dtype),
                pre["input_tag"].astype(self.compute_dtype),
                pre["noise"].astype(self.compute_dtype), train=train,
            ).astype(jnp.float32)
        return fake_image, kld, blend_image, updates

    # ------------------------------------------------------------------
    # discrimination (pix2pix_model.py:546-594)
    # ------------------------------------------------------------------

    def _orient_input(self, orient, input_tag):
        if not self.opt.use_ig:
            return orient_to_two_channel(orient, input_tag[..., 1:2])
        return orient

    def discriminate(self, variables, input_tag, fake_image, real_image, orient,
                     train=False, curr_step=None):
        """Fake+real in ONE batch for consistent norm statistics
        (pix2pix_model.py:562-574), then split.

        `curr_step` is a trace-time Python constant: the caller (train_step)
        compiles one program per unpair stage, so netD vs netD2 selection is
        baked into each compiled function (reference pix2pix_trainer.py:61-77
        re-dispatches eagerly each step)."""
        opt = self.opt
        if curr_step is None:
            curr_step = opt.curr_step
        orient_input = self._orient_input(orient, input_tag)
        fake_concat = jnp.concatenate([input_tag, orient_input, fake_image], axis=-1)
        real_concat = jnp.concatenate([input_tag, orient_input, real_image], axis=-1)
        fake_and_real = jnp.concatenate([fake_concat, real_concat], axis=0)
        fake_and_real = fake_and_real.astype(self.compute_dtype)

        net = self.netD
        dvars = variables["netD"]
        if opt.unpairTrain and curr_step == 2:
            net = self.netD2
            dvars = variables["netD2"]
        out = net.apply(dvars, fake_and_real, train=train)

        n = fake_concat.shape[0]
        # features stay at the compute dtype: casting to fp32 here fuses
        # into the D convs and doubles their write traffic (same finding as
        # the VGG tower — model.py _vgg_tower); the GAN/GAN-feat losses
        # upcast inside their reductions instead
        pred_fake = [[t[:n] for t in scale] for scale in out]
        pred_real = [[t[n:] for t in scale] for scale in out]
        return pred_fake, pred_real

    # ------------------------------------------------------------------
    # losses (pix2pix_model.py:257-398)
    # ------------------------------------------------------------------

    def _orient_for_training(self, variables, pre):
        """IG inpainting under stop-gradient (pix2pix_model.py:260-265)."""
        opt = self.opt
        if opt.use_ig:
            hair_mask = pre["input_tag"][..., 1:2]
            _, orient = self.inpaint_orient(
                variables, pre["hole"], pre["orient_rgb"], pre["noise"], hair_mask
            )
            return jax.lax.stop_gradient(orient)
        return pre["orient"]

    def generator_loss(
        self, variables, batch, rng, ab_count=None, extra_dilate_steps=None,
        curr_step=None,
    ) -> Tuple[jax.Array, Tuple[Dict[str, jax.Array], jax.Array, Dict]]:
        """Total G loss + (loss dict, fake image, mutable-state updates).

        `curr_step` (1=paired, 2=unpair) is a trace-time constant selecting
        which loss terms exist in the compiled program — see discriminate()."""
        opt = self.opt
        assert opt.isTrain
        if curr_step is None:
            curr_step = opt.curr_step
        pre = self.preprocess(batch)
        losses: Dict[str, jax.Array] = {}

        orient = self._orient_for_training(variables, pre)
        fake, kld, blend, updates = self.generate_fake(
            variables, pre, orient, rng=rng, train=True, mutable=True,
            extra_dilate_steps=extra_dilate_steps,
        )
        if opt.use_vae:
            losses["KLD"] = kld
        out_img = blend if opt.use_blender else fake

        pred_fake, pred_real = self.discriminate(
            variables, pre["input_tag"], out_img, pre["image_tag"], orient,
            train=True, curr_step=curr_step,
        )
        label_tag = pre["input_tag"][..., 1:2]
        label_ref = pre["input_ref"][..., 1:2]

        if not opt.no_gan_loss:
            losses["GAN"] = L.multiscale_gan_loss(
                pred_fake, True, False, opt, label_tag
            )

        # paired-data gate (pix2pix_model.py:286-291): as a traced indicator
        ref_is_tag = (
            jnp.sum(jnp.abs(label_tag - label_ref)) == 0
        ).astype(jnp.float32)

        def _vgg_tower(x):
            # the conv tower runs at the compute dtype (bf16 halves its HBM
            # traffic / doubles MXU rate).  Features are handed to the losses
            # AT the compute dtype: an fp32 cast here fuses into the tower's
            # last convs and doubles their write traffic (profiled: the
            # relu1_1 conv emitted fp32[16,512,512,64]).  Every loss upcasts
            # inside its reductions instead (losses/perceptual.py), so the
            # accumulation precision is unchanged while the stored/re-read
            # feature maps stay bf16.
            return self.vgg.apply(variables["vgg"], x.astype(self.compute_dtype))

        vgg_apply = _vgg_tower
        if getattr(opt, "remat", False):
            # rematerialize the frozen VGG tower in the backward pass —
            # its relu1 activations at 512^2 dominate HBM otherwise
            vgg_apply = jax.checkpoint(_vgg_tower)

        if curr_step == 1:
            # one VGG forward per distinct image; fake/tag features shared
            # between the perceptual and style/content losses (the reference
            # recomputes them, pix2pix_model.py:301-315)
            f_fake = vgg_apply(out_img)
            # tag+ref towers need no gradient: run them as ONE 2x-batch
            # forward (fewer launch sequences, better MXU occupancy) and
            # keep the differentiated fake tower at 1x batch
            n_img = out_img.shape[0]
            f_tr = vgg_apply(
                jax.lax.stop_gradient(
                    jnp.concatenate([pre["image_tag"], pre["image_ref"]], axis=0)
                )
            )
            f_tag = [jax.lax.stop_gradient(t[:n_img]) for t in f_tr]
            f_ref = [jax.lax.stop_gradient(t[n_img:]) for t in f_tr]
            if not opt.no_ganFeat_loss:
                losses["GAN_Feat"] = ref_is_tag * L.gan_feat_loss(
                    pred_fake, pred_real, opt, label_tag
                )
            if not opt.no_vgg_loss:
                losses["VGG"] = ref_is_tag * (
                    L.vgg_loss_from_features(f_fake, f_tag, opt, label_tag)
                    * opt.lambda_vgg
                )
            loss_c, loss_s = L.style_content_loss_from_features(
                f_fake, f_ref, f_tag, opt, label_ref, label_tag,
            )
            if not opt.no_content_loss:
                losses["content"] = loss_c * opt.lambda_content
            if not opt.no_style_loss:
                losses["style"] = loss_s * opt.lambda_style
            if not opt.no_background_loss:
                losses["background"] = ref_is_tag * (
                    L.rgb_background_l1_loss(out_img, pre["input_tag"], pre["image_tag"])
                    * opt.lambda_background
                )
            if not opt.no_rgb_loss:
                losses["rgb"] = ref_is_tag * (
                    jnp.mean(jnp.abs(out_img - jax.lax.stop_gradient(pre["image_tag"])))
                    * opt.lambda_rgb
                )
            if not opt.no_lab_loss:
                losses["lab"] = ref_is_tag * (
                    L.lab_color_loss(out_img, pre["image_tag"], opt, label_tag, ab_count)
                    * opt.lambda_lab
                )

        if not opt.no_orient_loss:
            o_l1, conf = L.orient_loss(out_img, orient, pre["input_tag"], opt)
            losses["ORIENT"] = o_l1 * opt.lambda_orient
            if not opt.no_confidence_loss:
                losses["CONFIDENCE"] = conf * opt.lambda_confidence

        if opt.unpairTrain and curr_step == 2:
            if opt.use_blender:
                losses["hairAvgLab"] = L.hair_avg_lab_loss(
                    blend, jax.lax.stop_gradient(fake), label_tag, label_tag, opt,
                    ab_count,
                ) * opt.lambda_hairavglab
            else:
                losses["hairAvgLab"] = L.hair_avg_lab_loss(
                    fake, pre["image_ref"], label_tag, label_ref, opt, ab_count
                ) * opt.lambda_hairavglab
            losses["background"] = (
                L.rgb_background_l1_loss(out_img, pre["input_tag"], pre["image_tag"])
                * opt.lambda_background
            )

        total = sum(losses.values())
        # orient is exposed so the D step can reuse it: the IG inpainting is
        # a pure function of frozen weights + the batch, so reusing it is
        # bit-exact, unlike --reuse_fake_for_d (config: reuse_orient_for_d)
        return total, (losses, fake, updates, jax.lax.stop_gradient(orient))

    def discriminator_loss(
        self, variables, batch, rng, extra_dilate_steps=None, curr_step=None,
        fake_image=None, orient=None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """When `fake_image` is provided (--reuse_fake_for_d), the generator
        forward is skipped: D trains against the image the G step already
        produced (pre-G-update weights).  The reference recomputes the fake
        with post-update G (pix2pix_trainer.py:61-77) — a documented
        divergence traded for skipping the most expensive forward (PERF.md
        breakdown); off by default.

        When `orient` is provided (reuse_orient_for_d, default on), the
        frozen-IG inpainting forward is skipped — bit-exact reuse, since the
        IG output is a pure function of frozen weights + the batch."""
        opt = self.opt
        if curr_step is None:
            curr_step = opt.curr_step
        pre = self.preprocess(batch)
        if orient is None:
            orient = self._orient_for_training(variables, pre)
        else:
            orient = jax.lax.stop_gradient(orient)
        if fake_image is None:
            fake, _, blend, _ = self.generate_fake(
                variables, pre, orient, rng=rng, train=True, mutable=False,
                extra_dilate_steps=extra_dilate_steps,
            )
            out_img = blend if opt.use_blender else fake
        else:
            out_img = fake_image
        out_img = jax.lax.stop_gradient(out_img)

        pred_fake, pred_real = self.discriminate(
            variables, pre["input_tag"], out_img, pre["image_tag"], orient,
            train=True, curr_step=curr_step,
        )
        label_tag = pre["input_tag"][..., 1:2]
        d_fake = L.multiscale_gan_loss(pred_fake, False, True, opt, label_tag)
        d_real = L.multiscale_gan_loss(pred_real, True, True, opt, label_tag)
        losses = {"D_Fake": d_fake, "D_real": d_real}
        return d_fake + d_real, losses

    # ------------------------------------------------------------------
    # inference (pix2pix_model.py:80-120)
    # ------------------------------------------------------------------

    def infer(self, variables, batch, rng=None, inpaint_mode=None):
        """mode='inference': returns (fake or blend, inpainted orient rgb).

        `inpaint_mode` ('ref'/'stroke') is a static argument selecting the
        orientation-inpainting branch (pix2pix_model.py:94-120); it defaults
        to opt.inpaint_mode but callers that compile one program per mode
        (demo engine) pass it explicitly rather than mutating shared config.
        """
        opt = self.opt
        if inpaint_mode is None:
            inpaint_mode = opt.inpaint_mode
        pre = self.preprocess(batch)
        orient_rgb_out = None
        if opt.use_ig and "stroke" not in inpaint_mode:
            hair_mask = pre["input_tag"][..., 1:2]
            orient_rgb_out, orient = self.inpaint_orient(
                variables, pre["hole"], pre["orient_rgb"], pre["noise"], hair_mask
            )
        elif opt.use_ig and "stroke" in inpaint_mode:
            hair_mask = pre["input_tag"][..., 1:2]
            orient_rgb_out, orient = self.inpaint_stroke_orient(
                variables, pre["hole"], pre["orient_rgb"], pre["noise"], hair_mask,
                pre["orient_stroke"], pre["mask_stroke"], pre["orient_rgb_mask"],
            )
        else:
            orient = pre["orient"]

        z = None
        if opt.use_vae:
            z, _, _ = self.encode_z(variables, pre["image_ref"], rng)

        fake, _, blend, _ = self.generate_fake(variables, pre, orient, rng=rng)
        out = blend if opt.use_blender else fake
        return out, orient_rgb_out
