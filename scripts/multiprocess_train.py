"""Real multi-process (multi-host analog) data-parallel training step.

The reference's distribution story is single-host DataParallel (SURVEY §2.7).
This framework claims multi-host readiness: the same `('data',)` mesh spans
processes once `jax.distributed.initialize` has run, train.py assembles only
per-host batch shards (train.py:44-107), and the psum'd grads/BN stats ride
whatever transport links the processes (ICI/DCN on real pods).

This script *executes* that claim without a pod: it launches N worker
processes on this host, each owning `devices_per_proc` virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count), connects them through
jax.distributed + Gloo CPU collectives, and runs one full G+D training step
over the global 2x4 process x device mesh with per-process input shards.
Every process must report identical finite losses (grads are psum'd, the
update is replicated) — the launcher asserts it.

Usage:
    python scripts/multiprocess_train.py            # launcher: 2 procs x 4 dev
    python scripts/multiprocess_train.py --nproc 2 --devices-per-proc 4
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(rank: int, nproc: int, devices_per_proc: int, port: int,
           tiny: bool = False) -> None:
    # env (set by the launcher, asserted here) must predate the jax import;
    # the config update must additionally land before first backend init —
    # a sitecustomize that pre-imports jax makes the env var alone a no-op
    # (same bootstrap as __graft_entry__._force_virtual_cpu_devices)
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=rank,
    )
    assert jax.process_index() == rank
    assert jax.local_device_count() == devices_per_proc
    n_global = nproc * devices_per_proc
    assert jax.device_count() == n_global, (
        f"global devices {jax.device_count()} != {n_global}"
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from michigan_tpu.config import Options
    from michigan_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from michigan_tpu.training.state import TrainState
    from michigan_tpu.training.train_step import make_train_steps

    mesh = make_mesh("data:-1")  # all global devices

    # Initialize the Gloo clique while the ranks are still in lockstep: the
    # context rendezvous has a 30s deadline, and the first collective of the
    # big train-step program would hit it whenever the two ranks' multi-
    # minute compiles skew (observed on a 1-core host).  A barrier psum
    # compiles in seconds and creates the same all-devices clique the train
    # step reuses.
    barrier_in = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)),
        np.ones((devices_per_proc,), np.float32),
    )
    barrier = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(barrier_in)
    assert float(jax.device_get(barrier.addressable_shards[0].data)) == n_global

    if tiny:
        # smallest useful config for the un-gated (slow-tier) test: still
        # runs the full cross-process G+D step (psum'd
        # grads, cross-replica BN) — IG/encoder off to keep compile short
        opt = Options(
            isTrain=True, crop_size=32, load_size=32, ngf=4, ndf=4,
            batchSize=n_global, use_encoder=False, use_ig=False,
            noise_background=False,
            num_upsampling_layers="normal", no_vgg_loss=True,
            no_content_loss=True, no_style_loss=True,
        ).finalize()
    else:
        opt = Options(
            isTrain=True, crop_size=64, load_size=64, ngf=8, ndf=8,
            batchSize=n_global, use_encoder=True, use_ig=True,
            noise_background=True, random_expand_mask=True,
            num_upsampling_layers="normal",
        ).finalize()

    model, g_step, d_step = make_train_steps(opt, mesh=mesh)

    # per-process batch shard, exactly as train.py:57,104 does on a pod:
    # every process materializes ONLY its local rows of the global batch
    rng_np = np.random.default_rng(0)  # same stream; rows selected per rank
    s = opt.crop_size
    n = opt.batchSize
    lab = rng_np.integers(0, 2, (n, s, s, 1)).astype(np.float32)
    full = {
        # paired labels: ref_is_tag=1 keeps the GAN_Feat/background/rgb/lab
        # loss paths live so their gradients actually cross processes
        "label_ref": lab,
        "label_tag": lab.copy(),
        "image_ref": rng_np.uniform(-1, 1, (n, s, s, 3)).astype(np.float32),
        "image_tag": rng_np.uniform(-1, 1, (n, s, s, 3)).astype(np.float32),
        "orient": rng_np.uniform(0, 255, (n, s, s, 1)).astype(np.float32),
        "hole": rng_np.integers(0, 2, (n, s, s, 1)).astype(np.float32),
        "orient_rgb": rng_np.uniform(0, 1, (n, s, s, 3)).astype(np.float32),
        "noise": rng_np.uniform(0, 1, (n, s, s, 3)).astype(np.float32),
    }
    lo = rank * (n // nproc)
    hi = lo + (n // nproc)
    local = {k: v[lo:hi] for k, v in full.items()}
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local.items()
    }

    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, {k: jnp.asarray(v) for k, v in full.items()})
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(2, jnp.int32)

    state, g_losses, _fake, orient = g_step(state, batch, rng, extra)
    state, d_losses = d_step(state, batch, rng, extra, orient=orient)
    out = {k: float(v) for k, v in {**g_losses, **d_losses}.items()}
    print("MPLOSSES " + json.dumps({"rank": rank, "losses": out}), flush=True)
    jax.distributed.shutdown()


def launch(nproc: int, devices_per_proc: int, tiny: bool = False) -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU relay
    flags = [
        f"--xla_force_host_platform_device_count={devices_per_proc}",
        "--xla_cpu_max_isa=AVX2",
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--rank", str(r), "--nproc", str(nproc),
             "--devices-per-proc", str(devices_per_proc), "--port", str(port)]
            + (["--tiny"] if tiny else []),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(nproc)
    ]
    outs = [p.communicate()[0] for p in procs]
    rcs = [p.returncode for p in procs]

    results = {}
    for r, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith("MPLOSSES "):
                d = json.loads(line[len("MPLOSSES "):])
                results[d["rank"]] = d["losses"]
        if rcs[r] != 0:
            print(f"--- rank {r} (rc={rcs[r]}) ---\n{out}")

    if any(rcs) or len(results) != nproc:
        print(f"FAILED: rcs={rcs}, results from {sorted(results)}")
        return 1

    ref = results[0]
    for name, val in ref.items():
        assert all(abs(results[r][name] - val) < 1e-5 for r in range(nproc)), (
            f"loss {name} differs across processes: "
            f"{[results[r][name] for r in range(nproc)]}"
        )
        assert val == val and abs(val) != float("inf"), f"non-finite {name}={val}"
    print(
        f"multiprocess_train OK — {nproc} processes x {devices_per_proc} "
        f"devices, identical finite losses: {ref}"
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="~1-min config (32^2 ngf4, no IG/encoder)")
    args = ap.parse_args()
    if args.worker:
        worker(args.rank, args.nproc, args.devices_per_proc, args.port,
               tiny=args.tiny)
        return 0
    return launch(args.nproc, args.devices_per_proc, tiny=args.tiny)


if __name__ == "__main__":
    sys.exit(main())
