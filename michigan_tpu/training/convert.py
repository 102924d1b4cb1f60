"""PyTorch .pth checkpoint -> Flax variable-tree converter.

Covers the released MichiGAN checkpoints (50_net_G.pth for SPADEBGenerator,
InpaintingModel_gen.pth / SInpaintingModel_gen.pth for IG/SIG — reference
util/util.py:195-272) plus D/E/B nets and torchvision VGG19 features.

Layout rules:
  conv weight        OIHW   -> HWIO
  conv-transpose     IOHW   -> spatially-flipped HWIO of the equivalent conv
  linear             (O,I)  -> (I,O)
  spectral norm      weight_orig + weight_u/weight_v -> kernel + spectral u/v
  batchnorm          running_mean/var -> batch_stats collection

The converter is name-driven: Flax module names were chosen to mirror the
torch attribute paths (e.g. head_0.conv_0, norm_0.mlp_gamma), so conversion
is a mechanical key rewrite.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_np(t) -> np.ndarray:
    # torch tensor or ndarray
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(_to_np(t), (2, 3, 1, 0))


def convT_w(t) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kh,kw) -> equivalent-conv HWIO, pre-flipped:
    K[h,w,i,o] = W[i,o,K-1-h,K-1-w]  (see models/layers.TorchConvTranspose)."""
    w = _to_np(t)
    w = w[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1)).copy()


def linear_w(t) -> np.ndarray:
    """(O,I) -> (I,O)."""
    return np.transpose(_to_np(t), (1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _strip_module_prefix(state: Mapping[str, Any]) -> Dict[str, Any]:
    """DataParallel checkpoints prefix keys with 'module.' (util/util.py:202-218)."""
    return {re.sub(r"^module\.", "", k): v for k, v in state.items()}


class _Rewriter:
    """Accumulates params/spectral/batch_stats trees from torch keys."""

    def __init__(self):
        self.params: Dict = {}
        self.spectral: Dict = {}
        self.batch_stats: Dict = {}

    def conv(self, tpath: str, fpath: Tuple[str, ...], state, transpose_conv=False,
             has_bias=True):
        wkey = tpath + ".weight"
        wf = convT_w if transpose_conv else conv_w
        if wkey + "_orig" in state:  # spectral-normalized
            _set(self.params, fpath + ("kernel",), wf(state[wkey + "_orig"]))
            _set(self.spectral, fpath + ("u",), _to_np(state[tpath + ".weight_u"]))
            _set(self.spectral, fpath + ("v",), _to_np(state[tpath + ".weight_v"]))
        elif wkey + "_v" in state:  # torch weight_norm
            _set(self.params, fpath + ("kernel",), wf(state[wkey + "_v"]))
            _set(self.params, fpath + ("wn_g",), _to_np(state[wkey + "_g"]).reshape(-1))
        elif wkey in state:
            _set(self.params, fpath + ("kernel",), wf(state[wkey]))
        else:
            raise KeyError(f"missing conv weight for {tpath}")
        bkey = tpath + ".bias"
        if has_bias and bkey in state and state[bkey] is not None:
            _set(self.params, fpath + ("bias",), _to_np(state[bkey]))

    def linear(self, tpath: str, fpath: Tuple[str, ...], state):
        _set(self.params, fpath + ("kernel",), linear_w(state[tpath + ".weight"]))
        if tpath + ".bias" in state:
            _set(self.params, fpath + ("bias",), _to_np(state[tpath + ".bias"]))

    def bn_stats(self, tpath: str, fpath: Tuple[str, ...], state):
        _set(self.batch_stats, fpath + ("running_mean",), _to_np(state[tpath + ".running_mean"]))
        _set(self.batch_stats, fpath + ("running_var",), _to_np(state[tpath + ".running_var"]))

    def variables(self) -> Dict[str, Dict]:
        out = {"params": self.params}
        if self.spectral:
            out["spectral"] = self.spectral
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


def _convert_spade(rw: _Rewriter, tprefix: str, fprefix: Tuple[str, ...], state):
    """One SPADE module: param_free_norm (stats) + mlp_shared.0 + gamma/beta."""
    pf = tprefix + ".param_free_norm"
    if pf + ".running_mean" in state:
        rw.bn_stats(pf, fprefix + ("param_free_norm",), state)
    rw.conv(tprefix + ".mlp_shared.0", fprefix + ("mlp_shared_0",), state)
    rw.conv(tprefix + ".mlp_gamma", fprefix + ("mlp_gamma",), state)
    rw.conv(tprefix + ".mlp_beta", fprefix + ("mlp_beta",), state)


def _convert_spade_block(rw: _Rewriter, tprefix: str, fprefix: Tuple[str, ...],
                         state, learned_shortcut: bool):
    rw.conv(tprefix + ".conv_0", fprefix + ("conv_0",), state)
    rw.conv(tprefix + ".conv_1", fprefix + ("conv_1",), state)
    _convert_spade(rw, tprefix + ".norm_0", fprefix + ("norm_0",), state)
    _convert_spade(rw, tprefix + ".norm_1", fprefix + ("norm_1",), state)
    if learned_shortcut:
        rw.conv(tprefix + ".conv_s", fprefix + ("conv_s",), state, has_bias=False)
        _convert_spade(rw, tprefix + ".norm_s", fprefix + ("norm_s",), state)


def convert_generator(state: Mapping[str, Any], opt) -> Dict[str, Dict]:
    """SPADEBGenerator checkpoint (e.g. 50_net_G.pth) -> flax variables."""
    state = _strip_module_prefix(dict(state))
    rw = _Rewriter()

    # latent seed
    if opt.use_vae:
        rw.linear("fc", ("fc",), state)
    elif opt.use_encoder:
        if opt.Image_encoder_mode == "partialconv":
            for i in range(1, 6):
                rw.conv(f"fc.layer{i}", ("fc", f"layer{i}"), state)
        elif opt.Image_encoder_mode == "instance":
            for i in range(1, 6):
                rw.conv(f"fc.layer{i}.0", ("fc", f"layer{i}", "conv"), state)
        else:  # norm
            for i in range(1, 6):
                rw.conv(f"fc.layer{i}.0", ("fc", f"layer{i}", "conv"), state)
            rw.conv("fc.fc", ("fc", "fc"), state)
    else:
        rw.conv("fc", ("fc",), state)

    blocks = [("head_0", 16, 16), ("G_middle_0", 16, 16), ("G_middle_1", 16, 16),
              ("up_0", 16, 8), ("up_1", 8, 4), ("up_2", 4, 2), ("up_3", 2, 1)]
    if opt.num_upsampling_layers == "most":
        blocks.append(("up_4", 1, 0.5))
    for name, fin, fout in blocks:
        _convert_spade_block(rw, name, (name,), state, learned_shortcut=fin != fout)

    rw.conv("conv_img", ("conv_img",), state)

    # background encoder — both variants share the working pyramid
    # structure now (the reference's non-noise BackgroundEncode was a
    # dead-broken path, rebuilt to BackgroundEncode2's contract; its
    # unused 16*ngf layer4 is dropped here and ignored in checkpoints)
    be = "backgroud_enc"
    if opt.num_upsampling_layers == "most":
        rw.conv(be + ".conv0.conv", (be, "conv0", "conv"), state)
        rw.conv(be + ".layer0.conv", (be, "layer0", "conv"), state)
    else:
        rw.conv(be + ".conv1.conv", (be, "conv1", "conv"), state)
    for i in range(1, 4):
        rw.conv(be + f".layer{i}.conv", (be, f"layer{i}", "conv"), state)

    return rw.variables()


def convert_inpaint(state: Mapping[str, Any], blocks: int = 12) -> Dict[str, Dict]:
    """IG/SIG checkpoint ['generator'] state_dict -> flax variables.

    Torch Sequential indices: encoder 1/4/7 convs, middle.N resblocks with
    conv_block.1/.5, middle.12 self-attention, decoder 0/3 convT + 7 conv.
    """
    state = _strip_module_prefix(dict(state))
    rw = _Rewriter()
    for idx in (1, 4, 7):
        rw.conv(f"encoder.{idx}", (f"encoder_{idx}",), state)
    for b in range(blocks):
        rw.conv(f"middle.{b}.conv_block.1", (f"middle_{b}", "conv1"), state)
        rw.conv(f"middle.{b}.conv_block.5", (f"middle_{b}", "conv2"), state)
    att = f"middle.{blocks}"
    for name in ("query_conv", "key_conv", "value_conv"):
        rw.conv(f"{att}.{name}", (f"middle_{blocks}", name), state)
    rw.conv("decoder.0", ("decoder_0",), state, transpose_conv=True)
    rw.conv("decoder.3", ("decoder_3",), state, transpose_conv=True)
    rw.conv("decoder.7", ("decoder_7",), state)
    return rw.variables()


def convert_discriminator(state: Mapping[str, Any], opt) -> Dict[str, Dict]:
    """MultiscaleDiscriminator checkpoint -> flax variables."""
    state = _strip_module_prefix(dict(state))
    rw = _Rewriter()
    for d in range(opt.num_D):
        dp = f"discriminator_{d}"
        rw.conv(f"{dp}.model0.0", (dp, "model0_conv"), state)
        for n in range(1, opt.n_layers_D):
            rw.conv(f"{dp}.model{n}.0.0", (dp, f"model{n}", "conv"), state)
        rw.conv(
            f"{dp}.model{opt.n_layers_D}.0",
            (dp, f"model{opt.n_layers_D}_conv"), state,
        )
    return rw.variables()


def convert_vae_encoder(state: Mapping[str, Any], opt) -> Dict[str, Dict]:
    state = _strip_module_prefix(dict(state))
    rw = _Rewriter()
    n_layers = 6 if opt.crop_size >= 256 else 5
    for i in range(1, n_layers + 1):
        rw.conv(f"layer{i}.0", (f"layer{i}", "conv"), state)
    rw.linear("fc_mu", ("fc_mu",), state)
    rw.linear("fc_var", ("fc_var",), state)
    return rw.variables()


def convert_vgg19(features_state: Mapping[str, Any]) -> Dict[str, Dict]:
    """torchvision vgg19.features state_dict -> flax VGG19 params."""
    rw = _Rewriter()
    from michigan_tpu.models.vgg import VGG19_CONVS

    for fidx, _ in VGG19_CONVS:
        rw.conv(str(fidx), (f"features_{fidx}",), features_state)
    return rw.variables()


def convert_inception_v3(state: Mapping[str, Any]) -> Dict[str, Dict]:
    """torchvision inception_v3 state_dict -> the flat params dict consumed
    by models/inception.inception_features.  Geometry is validated against
    INCEPTION_SPEC so a truncated/mismatched checkpoint fails loudly."""
    from michigan_tpu.models.inception import INCEPTION_SPEC

    state = _strip_module_prefix(dict(state))
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for name, (i, o, (kh, kw), _s, _p) in INCEPTION_SPEC.items():
        w = conv_w(state[f"{name}.conv.weight"])
        if w.shape != (kh, kw, i, o):
            raise ValueError(
                f"{name}: checkpoint kernel {w.shape} != spec {(kh, kw, i, o)}"
            )
        params[name] = {
            "kernel": w,
            "bn_scale": _to_np(state[f"{name}.bn.weight"]),
            "bn_bias": _to_np(state[f"{name}.bn.bias"]),
            "bn_mean": _to_np(state[f"{name}.bn.running_mean"]),
            "bn_var": _to_np(state[f"{name}.bn.running_var"]),
        }
    return params


def load_pth(path: str, key: str | None = None):
    """torch.load a checkpoint on CPU (util/util.py:245-272 reads IG/SIG
    payloads from data['generator'])."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and isinstance(data, dict) and key in data:
        data = data[key]
    return data


def _main(argv=None):
    """Converter CLI.

    VGG19:  python -m michigan_tpu.training.convert \
                --vgg vgg19-dcbb9e9d.pth --out checkpoints/vgg19.npz
    InceptionV3 (for literature-comparable FID):
            python -m michigan_tpu.training.convert \
                --inception inception_v3_google-0cc3c7bd.pth \
                --out checkpoints/inception_v3.npz
    The outputs are auto-discovered by training/evaluate
    (models/vgg.find_vgg19_weights, models/inception.find_inception_weights).
    """
    import argparse

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("--vgg", help="torchvision vgg19 .pth (full model or .features)")
    p.add_argument("--inception", help="torchvision inception_v3 .pth")
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args(argv)

    if args.vgg:
        from michigan_tpu.models.vgg import save_vgg19_npz

        state = load_pth(args.vgg)
        state = {
            k[len("features."):] if k.startswith("features.") else k: v
            for k, v in dict(state).items()
        }
        variables = convert_vgg19(state)
        save_vgg19_npz(variables, args.out)
        n = sum(np.asarray(v).size for v in variables["params"].values()
                for v in v.values())
        print(f"wrote {args.out} ({n / 1e6:.1f}M params)")
    elif args.inception:
        from michigan_tpu.models.inception import save_inception_npz

        params = convert_inception_v3(load_pth(args.inception))
        save_inception_npz(params, args.out)
        n = sum(v.size for pr in params.values() for v in pr.values())
        print(f"wrote {args.out} ({n / 1e6:.1f}M params)")
    else:
        p.error("nothing to convert (pass --vgg or --inception)")


if __name__ == "__main__":
    _main()
