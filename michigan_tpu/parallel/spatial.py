"""Spatial activation sharding — the image-GAN analog of sequence
parallelism (SURVEY §5.7: an optional stretch beyond the reference, which
only scales spatially by the normal/more/most switch).

For 1024^2 ('most') generation a single chip runs out of HBM headroom; here
the H dimension of every activation is sharded over a ('space',) mesh axis
and XLA's SPMD partitioner (GSPMD) inserts the halo exchanges for the 3x3
convolutions automatically — the TPU-native alternative to hand-written
ring/halo code.  Params stay replicated.

TRAINING needs no dedicated wrapper: place the batch arrays with
`shard_batch(batch, mesh)` and call the ordinary jitted train steps —
GSPMD propagates the spatial sharding through forward, backward, and the
optimizer update (equivalence proven by
tests/test_spatial_sharding.py::test_spatial_sharded_train_step_matches).
This is the memory path for 1024^2 training at bs>=2 per chip (PERF.md:
bs2 exceeds single-chip HBM by 0.9G even with remat).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPACE_AXIS = "space"


def make_spatial_infer(model, mesh: Mesh):
    """jit-compiled `infer(variables, batch)` with batch activations sharded
    along H over `mesh`'s 'space' axis.  Batch arrays are NHWC; every entry
    is sharded P(None, 'space'); variables are replicated."""
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(None, SPACE_AXIS))

    def infer(variables, batch):
        batch = {
            k: jax.lax.with_sharding_constraint(v, row) for k, v in batch.items()
        }
        out, orient_rgb = model.infer(variables, batch)
        return out, orient_rgb

    return jax.jit(
        infer,
        in_shardings=(rep, {k: row for k in (
            "label_ref", "label_tag", "image_ref", "image_tag", "orient",
            "hole", "orient_rgb", "noise",
        )}),
    )


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for NHWC batch arrays on `mesh`: N over 'data' (if the
    mesh has it), H over 'space' (if the mesh has it).  A 2-D
    `make_mesh("data:2,space:4")` composes batch parallelism with spatial
    activation sharding in one program — GSPMD handles both."""
    from michigan_tpu.parallel.mesh import DATA_AXIS

    n = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    h = SPACE_AXIS if SPACE_AXIS in mesh.axis_names else None
    return P(n, h)


def shard_batch(batch, mesh: Mesh):
    row = NamedSharding(mesh, batch_spec(mesh))
    return {k: jax.device_put(v, row) for k, v in batch.items()}
