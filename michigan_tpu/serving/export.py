"""Portable deployment artifacts via `jax.export` (StableHLO).

The reference "deploys" by loading .pth checkpoints into live torch modules
inside demo.py / inference.py (reference demo.py:55-101, inference.py:23-56)
— code and weights must ship together and every process re-traces.  The
TPU-native deployment unit is different: the jitted inference program is
serialized once to StableHLO and the serving fleet deserializes and calls
it without the model code, Flax, or the config system present — only jax.
Weights stay a separate artifact (Orbax checkpoint, training/checkpoint.py)
and are passed as ordinary call arguments, so one program artifact serves
every checkpoint of the same architecture.

Cross-platform lowering is supported: `platforms=("tpu",)` exports a TPU
program from a CPU dev machine.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
from jax import export as jax_export


def export_inference(
    model,
    variables,
    example_batch,
    path: str,
    platforms: Optional[Sequence[str]] = None,
):
    """Serialize `jit(model.infer)(variables, batch)` to `path`.

    Shapes/dtypes are fixed by the example arguments (TPU programs are
    static-shape; serve other batch sizes by exporting one artifact per
    bucket — serving.session does this in-process).  `platforms` defaults
    to the current backend; pass ("tpu",) to cross-compile from a CPU host.
    Returns the `jax.export.Exported` for immediate use.
    """
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(model.infer), **kwargs)(
        variables, example_batch
    )
    data = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return exported


def load_exported(path: str):
    """Deserialize a `export_inference` artifact.  Returns a callable with
    the original signature: `fn(variables, batch) -> (image, orient_rgb)`.
    Needs only jax — no michigan_tpu model code."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)
