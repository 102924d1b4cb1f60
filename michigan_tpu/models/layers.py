"""Conv primitives with exact torch semantics, as Flax modules. NHWC.

Torch layers map as:
  nn.Conv2d(p)                 -> TorchConv(padding=p)           kernel HWIO
  spectral_norm(nn.Conv2d)     -> TorchConv(spectral=True)       + u/v state
  weight_norm(nn.Conv2d)       -> TorchConv(weight_norm="torch") + g param
  custom weight_norm (g==1)    -> TorchConv(weight_norm="fixed") (normalization.py:122-150)
  nn.ConvTranspose2d           -> TorchConvTranspose              kernel pre-flipped HWIO
  PartialConv2d                -> PartialConv (partialconv2d.py:15-86)
  nn.ReflectionPad2d           -> reflect_pad
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from michigan_tpu.ops.norms import spectral_normalize

DEFAULT_PRECISION = None  # let XLA pick (bf16-friendly on MXU)


# Active --init_type for weight creation.  The reference walks every module
# and re-initializes conv/linear weights by name (base_network.py:28-59);
# here every conv/linear param calls weight_init(), which reads this
# process-level default.  MichiGANModel.init_variables() sets it from
# opt.init_type for the duration of initialization (init only ever happens
# eagerly, never inside jit, so this is deterministic).
_DEFAULT_INIT_TYPE = "xavier"
_DEFAULT_INIT_GAIN: Optional[float] = None  # overrides per-layer gain (--init_variance)


def set_default_init_type(init_type: str, gain: Optional[float] = None):
    """Set the weight-init scheme (+ optional --init_variance gain override);
    returns the previous (type, gain) for restoring."""
    global _DEFAULT_INIT_TYPE, _DEFAULT_INIT_GAIN
    prev = (_DEFAULT_INIT_TYPE, _DEFAULT_INIT_GAIN)
    _DEFAULT_INIT_TYPE = init_type
    _DEFAULT_INIT_GAIN = gain
    return prev


def weight_init(gain: float = 0.02, init_type: Optional[str] = None):
    """Reference init_weights (base_network.py:28-59), all --init_type
    variants, with init_variance as gain.  Fans computed over HWIO kernels
    (fan_in = H*W*I, fan_out = H*W*O), matching torch's for NCHW OIHW."""

    def init(key, shape, dtype=jnp.float32):
        it = init_type or _DEFAULT_INIT_TYPE
        g = _DEFAULT_INIT_GAIN if _DEFAULT_INIT_GAIN is not None else gain
        rf = 1
        for d in shape[:-2]:
            rf *= d
        fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
        if it == "normal":
            return jax.random.normal(key, shape, dtype) * g
        if it == "xavier":
            std = g * (2.0 / (fan_in + fan_out)) ** 0.5
            return jax.random.normal(key, shape, dtype) * std
        if it == "xavier_uniform":
            # torch uses gain=1.0 for this branch (base_network.py:41-42)
            a = (6.0 / (fan_in + fan_out)) ** 0.5
            return jax.random.uniform(key, shape, dtype, -a, a)
        if it == "kaiming":
            # kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2/fan_in)
            std = (2.0 / fan_in) ** 0.5
            return jax.random.normal(key, shape, dtype) * std
        if it == "orthogonal":
            flat = nn.initializers.orthogonal(scale=g, column_axis=-1)(
                key, (fan_in, shape[-1]), dtype
            )
            return flat.reshape(shape[:-1] + (shape[-1],))
        if it == "none":
            # torch's default conv init: kaiming_uniform_(a=sqrt(5))
            # -> uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))
            b = 1.0 / fan_in ** 0.5
            return jax.random.uniform(key, shape, dtype, -b, b)
        raise NotImplementedError(f"initialization method [{it}]")

    return init


def xavier_init(gain: float = 0.02):
    """Back-compat alias: initializer honoring the active --init_type."""
    return weight_init(gain)


def reflect_pad(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def replicate_pad(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")


def _conv(x, kernel, stride, padding, lhs_dilation=None, rhs_dilation=None):
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=DEFAULT_PRECISION,
    )


class TorchConv(nn.Module):
    """nn.Conv2d with integer padding; optional spectral / weight norm.

    Spectral norm keeps torch's exact power-iteration trajectory: `u`/`v`
    live in the 'spectral' variable collection and update only when `train`
    and the collection is mutable (torch updates them on training forwards).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    spectral: bool = False
    weight_norm: Optional[str] = None  # None | "torch" | "fixed"
    dilation: int = 1
    gain: float = 0.02
    # return the (normalized kernel, bias) instead of running the conv —
    # feeds fused Pallas epilogue kernels (ops/pallas/epilogue.py) while
    # keeping param/variable names checkpoint-identical
    return_kernel: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", xavier_init(self.gain), (k, k, in_ch, self.features))
        kernel = kernel.astype(jnp.float32)

        if self.spectral:
            # torch flattens OIHW to (O, I*kh*kw); replicate that exact order.
            w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(self.features, -1)
            u = self.variable(
                "spectral", "u",
                lambda: jax.random.normal(self.make_rng("params"), (self.features,)),
            )
            v = self.variable(
                "spectral", "v",
                lambda: jax.random.normal(self.make_rng("params"), (w_mat.shape[1],)),
            )
            # torch normalizes u/v at init; converted checkpoints are already unit
            sigma, u_new, v_new = spectral_normalize(w_mat, u.value, v.value, update=train)
            if (
                train
                and not self.is_initializing()
                and self.is_mutable_collection("spectral")
            ):
                # persisted once per optimizer step (the D step); torch also
                # iterates during the G-step forward — the iterated sigma is
                # still used here, only the write-back is skipped
                u.value = u_new
                v.value = v_new
            kernel = kernel / sigma
        elif self.weight_norm == "torch":
            # w = g * v/||v||_per-outchannel (norm over I,kh,kw)
            g = self.param(
                "wn_g",
                lambda rng, shape: jnp.linalg.norm(
                    kernel.transpose(3, 2, 0, 1).reshape(self.features, -1), axis=1
                ),
                (self.features,),
            )
            norms = jnp.linalg.norm(
                kernel.transpose(3, 2, 0, 1).reshape(self.features, -1), axis=1
            )
            kernel = kernel * (g / norms).reshape(1, 1, 1, self.features)
        elif self.weight_norm == "fixed":
            # reference Weight_norm: one-time w/(||w||+1e-10) — a converted
            # checkpoint already contains the normalized weight, and training
            # treats it as a plain parameter after that (normalization.py:137)
            pass

        if self.return_kernel:
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias
                else jnp.zeros((self.features,), jnp.float32)
            )
            return kernel, bias

        p = self.padding
        y = _conv(
            x, kernel, self.stride, ((p, p), (p, p)),
            rhs_dilation=(self.dilation, self.dilation) if self.dilation != 1 else None,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class TorchConvTranspose(nn.Module):
    """nn.ConvTranspose2d(k, s, p) as an lhs-dilated conv.

    The kernel param is stored in equivalent-conv HWIO form (spatially
    flipped, in/out transposed relative to torch's (I,O,kh,kw)); the weight
    converter performs the flip once at load time.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True
    spectral: bool = False
    gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        kernel = self.param("kernel", xavier_init(self.gain), (k, k, in_ch, self.features))
        kernel = kernel.astype(jnp.float32)

        if self.spectral:
            # torch spectral_norm uses dim=1 for ConvTranspose2d: permute the
            # out-channel dim to the front, flatten to (O, I*kh*kw).  Our
            # kernel is the pre-flipped equivalent-conv HWIO tensor, so undo
            # the flip to recover torch's spatial order.
            w_mat = jnp.transpose(kernel[::-1, ::-1], (3, 2, 0, 1)).reshape(
                self.features, -1
            )
            u = self.variable(
                "spectral", "u",
                lambda: jax.random.normal(self.make_rng("params"), (self.features,)),
            )
            v = self.variable(
                "spectral", "v",
                lambda: jax.random.normal(self.make_rng("params"), (w_mat.shape[1],)),
            )
            sigma, u_new, v_new = spectral_normalize(w_mat, u.value, v.value, update=train)
            if (
                train
                and not self.is_initializing()
                and self.is_mutable_collection("spectral")
            ):
                u.value = u_new
                v.value = v_new
            kernel = kernel / sigma

        pad = ((k - 1 - p, k - 1 - p + op), (k - 1 - p, k - 1 - p + op))
        y = _conv(x, kernel, 1, pad, lhs_dilation=(s, s))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class PartialConv(nn.Module):
    """NVIDIA partial convolution (partialconv2d.py:15-86), single-channel mask.

    out = ((conv(x*m) - b) * winsize/(conv(m)+1e-8)) * clamp(conv(m),0,1) + b*...
    Returns (out, updated_mask).
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param("kernel", xavier_init(self.gain), (k, k, in_ch, self.features))
        ones = jnp.ones((k, k, 1, 1), dtype=jnp.float32)
        winsize = float(k * k)  # slide_winsize for single-channel mask updater

        update_mask = _conv(mask.astype(jnp.float32), ones, s, ((p, p), (p, p)))
        mask_ratio = winsize / (update_mask + 1e-8)
        update_mask = jnp.clip(update_mask, 0.0, 1.0)
        mask_ratio = mask_ratio * update_mask
        update_mask = jax.lax.stop_gradient(update_mask)
        mask_ratio = jax.lax.stop_gradient(mask_ratio)

        raw = _conv(x * mask.astype(x.dtype), kernel, s, ((p, p), (p, p)))
        mask_ratio = mask_ratio.astype(raw.dtype)
        update_mask_c = update_mask.astype(raw.dtype)
        if self.use_bias:
            # torch computes (conv_with_bias - b) * ratio + b; our conv is
            # biasless so that is conv * ratio + b, gated by the mask.
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            b = bias.astype(raw.dtype).reshape(1, 1, 1, -1)
            out = (raw * mask_ratio + b) * update_mask_c
        else:
            out = raw * mask_ratio
        return out, update_mask


class TorchLinear(nn.Module):
    """nn.Linear with xavier init; kernel stored (in, out)."""

    features: int
    use_bias: bool = True
    gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", xavier_init(self.gain), (x.shape[-1], self.features)
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvBlock(nn.Module):
    """MaskGAN_networks.py:114-173 pad->conv->norm->act block (the background
    encoder building block).  Only the configurations the reference exercises
    are implemented: pad reflect/zero, norm none/in, act relu/lrelu/tanh/none.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    norm: str = "none"
    activation: str = "relu"
    pad_type: str = "zero"
    gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.padding:
            if self.pad_type == "reflect":
                x = reflect_pad(x, self.padding)
            elif self.pad_type == "replicate":
                x = replicate_pad(x, self.padding)
            else:
                x = jnp.pad(x, ((0, 0), (self.padding,) * 2, (self.padding,) * 2, (0, 0)))
        y = TorchConv(
            self.features, self.kernel_size, self.stride, padding=0, gain=self.gain,
            name="conv",
        )(x, train)
        if self.norm == "in":
            from michigan_tpu.ops.norms import instance_norm

            y = instance_norm(y)
        elif self.norm != "none":
            raise NotImplementedError(self.norm)
        if self.activation == "relu":
            y = jax.nn.relu(y)
        elif self.activation == "lrelu":
            y = jax.nn.leaky_relu(y, 0.2)
        elif self.activation == "tanh":
            y = jnp.tanh(y)
        elif self.activation != "none":
            raise NotImplementedError(self.activation)
        return y
