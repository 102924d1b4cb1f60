"""Training driver CLI (reference train.py).

Keeps the reference's epoch loop shape: alternating G/D steps gated by
D_steps_per_G / G_steps_per_D, the optional two-stage unpair outer path,
periodic print/display/save, epoch-level LR decay — but each step is one
jit-compiled sharded function over a `jax.sharding.Mesh` instead of a
DataParallel dispatch.
"""

from __future__ import annotations

import os
import random
import sys
import time

import numpy as np


def _vm_rss_gb() -> float:
    """Current process resident set size in GiB (Linux /proc)."""
    try:
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 0.0


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from michigan_tpu.config import train_options
    from michigan_tpu.data.dataset import create_dataloader, prefetch_with
    from michigan_tpu.losses.color import load_ab_count
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.parallel.mesh import make_mesh
    from michigan_tpu.training import checkpoint as CK
    from michigan_tpu.training.state import TrainState, init_netd2_from_netd
    from michigan_tpu.training.train_step import make_train_steps
    from michigan_tpu.utils.iter_counter import IterationCounter
    from michigan_tpu.utils.visualizer import Visualizer

    opt = train_options(argv)
    print(" ".join(sys.argv))

    # multi-host (DCN) training: one process per host, same command on each,
    # coordinator from the standard JAX env (JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the TPU metadata server).
    # Must run before any other jax API touches the backend.
    if opt.multihost or os.environ.get("MICHIGAN_MULTIHOST") == "1":
        jax.distributed.initialize()
        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local of {jax.device_count()} devices"
        )

    # persist the experiment options (reference base_options.py:186-197)
    opt.save(os.path.join(opt.checkpoints_dir, opt.name, "opt.json"))

    if opt.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # per-host input sharding: each host loads only its slice of every
    # global batch (jax.process_count()==1 on single-host; the reference is
    # single-host DataParallel only, SURVEY §2.7)
    shard = (jax.process_index(), jax.process_count())
    dataloader = create_dataloader(opt, shard=shard)
    dataloader2 = create_dataloader(opt, 2, shard=shard) if opt.unpairTrain else None

    n_dev = jax.device_count()
    assert opt.batchSize % n_dev == 0, (
        f"batchSize {opt.batchSize} must divide across {n_dev} devices"
    )
    mesh = make_mesh(opt.mesh_shape) if n_dev > 1 else None
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from michigan_tpu.parallel.mesh import DATA_AXIS

        batch_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

    # Compact host->device transfer (bf16 training only): image-like
    # tensors ship as bf16, 0/1 labels/masks as uint8 (exact), the raw
    # orientation label stays fp32.  Note the images/orient_rgb also feed
    # loss TARGETS (rgb/Lab/VGG, and the IG output) — those targets see one
    # extra bf16 rounding (~2^-8 relative), consistent with the bf16
    # compute policy that already produces the fake through bf16 convs.
    # --compact_transfer false restores untouched fp32 transfers; fp32
    # training always transfers untouched.
    # the loader already emits uint8 for images/labels/orient/hole (the
    # uint8 wire — dataset.py get_sample; train_step._f32 decodes
    # in-program), so _compact only needs to shrink the float leftovers
    _BF16_KEYS = ("noise", "orient_rgb")
    _U8_KEYS = ("label_ref", "label_tag", "hole")
    compact_transfer = opt.compact_transfer and opt.dtype == "bfloat16"

    def _compact(k, v):
        if v.dtype == np.uint8 or not compact_transfer:
            return v
        if k in _U8_KEYS:
            return v.astype(np.uint8)
        if k in _BF16_KEYS:
            import ml_dtypes

            return v.astype(ml_dtypes.bfloat16)
        return v

    # --device_noise: the loader ships no noise; one jitted program draws
    # the whole batch's pyramid on device (sharded over the mesh like the
    # rest of the batch).  The pyramid costs the TPU microseconds; on the
    # host it is the single hottest per-sample op (PERF.md).
    noise_batch_fn = None
    if opt.device_noise:
        from michigan_tpu.ops.noise import generate_noise_jax

        _s = opt.crop_size
        _ndt = jnp.bfloat16 if compact_transfer else jnp.float32

        # PRNGKey/fold_in happen INSIDE the jitted program from plain scalar
        # inputs: eager fold_in would commit the key array to this process's
        # default device, which is illegal as an input to a program whose
        # out_shardings span the global multi-host mesh.  Uncommitted scalars
        # are treated as replicated across processes, so the same program
        # works single- and multi-host.
        def _noise_batch(seed, ctr):
            key = jax.random.fold_in(jax.random.PRNGKey(seed), ctr)
            keys = jax.random.split(key, opt.batchSize)
            out = jax.vmap(lambda k: generate_noise_jax(k, _s, _s))(keys)
            return out.astype(_ndt)

        noise_batch_fn = (
            jax.jit(_noise_batch, out_shardings=batch_sharding)
            if batch_sharding is not None else jax.jit(_noise_batch)
        )
        _noise_seed = np.uint32((opt.seed ^ 0x6E015E) & 0xFFFFFFFF)
        _noise_ctr = [0]  # bumped per batch; single producer (feeder thread)

    # --device_orient_rgb: recompute the RGB orient encoding in-program
    # from the shipped orient+label planes.  Bit-equal to the host path
    # (preprocess.py trans_orient_to_rgb -> uint8 png -> ToTensor): the
    # encoding is pointwise, so it commutes with NEAREST/crop/flip, and the
    # uint8 quantisation (trunc) is replicated before the /255.
    orient_rgb_fn = None
    if (getattr(opt, "device_orient_rgb", False)
            and opt.use_ig and not opt.no_orientation):
        _ordt = jnp.bfloat16 if compact_transfer else jnp.float32

        def _orient_rgb(orient_u8, label_u8):
            t = orient_u8.astype(jnp.float32) / 255.0 * np.pi
            m = label_u8.astype(jnp.float32)
            r = (jnp.cos(2 * t) + 1.0) * 0.5
            g = (jnp.sin(2 * t) + 1.0) * 0.5
            b = jnp.full_like(r, 0.5)
            rgb = jnp.concatenate([r, g, b], axis=-1) * m
            q = jnp.floor(rgb * 255.0)  # np.uint8() truncation
            return (q / 255.0 * m).astype(_ordt)

        orient_rgb_fn = (
            jax.jit(_orient_rgb, out_shardings=batch_sharding)
            if batch_sharding is not None else jax.jit(_orient_rgb)
        )

    def device_batch(data):
        """Host-local numpy -> global device array sharded over the mesh.

        Compact dtypes stay compact ON DEVICE — the train step upcasts
        inside the program (train_step.py _f32), so only the half-size
        batch persists in HBM between steps."""
        if batch_sharding is None:
            out = {
                k: jnp.asarray(_compact(k, np.asarray(v)))
                for k, v in data.items()
            }
        else:
            out = {
                k: jax.make_array_from_process_local_data(
                    batch_sharding, _compact(k, np.asarray(v))
                )
                for k, v in data.items()
            }
        if noise_batch_fn is not None:
            out["noise"] = noise_batch_fn(_noise_seed, np.int32(_noise_ctr[0]))
            _noise_ctr[0] += 1
        if orient_rgb_fn is not None and "orient_rgb" not in out:
            out["orient_rgb"] = orient_rgb_fn(out["orient"], out["label_tag"])
        # paired-stage dedup: the loader omits the ref planes when they are
        # bit-equal to the tag planes (dataset.py get_sample) — alias the
        # same device buffers instead of shipping them twice
        if "label_ref" not in out:
            out["label_ref"] = out["label_tag"]
        if "image_ref" not in out:
            out["image_ref"] = out["image_tag"]
        return out

    def prefetch_to_device(loader):
        """Yield (host_data, device_batch) with the NEXT batch's transfer
        overlapping the current step's compute — through a remote-TPU relay
        the H2D copy (~57 MB/s measured) otherwise serializes with the step.
        --device_prefetch N sets how many batches sit transferred ahead
        (each pins a batch in HBM); 0 disables the feeder thread."""
        if opt.device_prefetch <= 0:
            return ((data, device_batch(data)) for data in loader)
        return prefetch_with(device_batch, loader, opt.device_prefetch)

    ab_count = None
    if opt.balance_Lab and os.path.exists(opt.weight_dir):
        ab_count = load_ab_count(opt.weight_dir)

    use_fused = (
        opt.fused_step and opt.D_steps_per_G == 1 and opt.G_steps_per_D == 1
        and not opt.no_discriminator
    )
    if use_fused:
        model, g_step, d_step, fused_step = make_train_steps(
            opt, mesh=mesh, ab_count=ab_count, with_fused=True
        )
    else:
        model, g_step, d_step = make_train_steps(opt, mesh=mesh, ab_count=ab_count)

    iter_counter = IterationCounter(opt, len(dataloader) * opt.batchSize)
    visualizer = Visualizer(opt)

    diag_fn = None
    if opt.stats_freq > 0:
        from michigan_tpu.training.diagnostics import make_diag_fn

        diag_fn = make_diag_fn()

    # ---- initialize or resume ----
    rng = jax.random.PRNGKey(opt.seed)
    assert len(dataloader) > 0, (
        f"dataset at {opt.data_dir} yields no full batches of {opt.batchSize}"
    )
    first_batch = next(iter(dataloader))
    batch0 = device_batch(first_batch)
    # jit the init: eager init is hundreds of tiny dispatches, pathological
    # through the remote-TPU relay (same reason bench.py jits it)
    variables = jax.jit(model.init_variables)(rng, batch0)
    if opt.unpairTrain and opt.same_netD_model and "netD2" in variables:
        variables = init_netd2_from_netd(variables)
    state = TrainState.create(opt, variables)
    if opt.continue_train:
        restored = CK.restore_train_state(opt, opt.which_epoch, state)
        if restored is not None:
            # re-apply the frozen-tower storage policy: a checkpoint saved
            # under fp32 restores fp32 leaves into the bf16 template
            state = restored.replace(
                variables=model.compact_frozen_variables(restored.variables)
            )
            print(f"resumed checkpoint '{opt.which_epoch}'")
    del variables

    host_rng = random.Random(opt.seed)

    def run_epoch(epoch, loader, curr_step):
        nonlocal state
        opt.curr_step = curr_step
        iter_counter.record_epoch_start(epoch)
        # loader-INCLUSIVE wall throughput — the reference's own metric is
        # wall-clock around the whole loop (util/iter_counter.py:42-50).
        # Steps are dispatched async, so the clock starts only after the
        # first step's losses are fetched (compile excluded) and stops after
        # a final fetch drains the queue.
        wall_t0 = None
        wall_steps = 0
        g_losses = d_losses = {}
        stop = False
        for i, (data, batch) in enumerate(prefetch_to_device(loader)):
            if opt.max_steps and (
                iter_counter.total_steps_so_far // opt.batchSize >= opt.max_steps
            ):
                stop = True
                break
            iter_counter.record_one_iteration()
            step_rng = jax.random.fold_in(
                jax.random.PRNGKey(opt.seed), int(iter_counter.total_steps_so_far)
            )
            # host-side sample of the random mask dilation width
            # (encoder.py:294: k in {th-4..th+4} -> 0..4 extra 3x3 steps)
            extra = jnp.asarray(host_rng.randint(0, 4), jnp.int32)

            g_losses = d_losses = {}
            fake = None
            orient = None
            if use_fused:
                state, g_losses, d_losses, fake = fused_step(
                    state, batch, step_rng, extra)
            else:
                if i % opt.D_steps_per_G == 0:
                    state, g_losses, fake, orient = g_step(
                        state, batch, step_rng, extra)
                if i % opt.G_steps_per_D == 0 and not opt.no_discriminator:
                    reuse = fake if opt.reuse_fake_for_d else None
                    state, d_losses = d_step(state, batch, step_rng, extra,
                                             fake=reuse, orient=orient)

            if i == 0:
                for v in {**g_losses, **d_losses}.values():
                    np.asarray(v)  # drain compile+first step off the clock
                wall_t0 = time.perf_counter()
            else:
                wall_steps += 1

            if opt.debug_nans and (g_losses or d_losses):
                for k, v in {**g_losses, **d_losses}.items():
                    val = float(np.asarray(v))
                    assert np.isfinite(val), (
                        f"non-finite loss {k}={val} at step "
                        f"{iter_counter.total_steps_so_far}"
                    )

            if opt.profile_dir and iter_counter.total_steps_so_far == (
                3 * opt.batchSize
            ):
                # trace one steady-state step (post-compile)
                with jax.profiler.trace(opt.profile_dir):
                    state, g_losses, fake, orient = g_step(
                        state, batch, step_rng, extra)
                print(f"profiler trace written to {opt.profile_dir}")

            if iter_counter.needs_printing():
                losses = {**{k: np.asarray(v) for k, v in g_losses.items()},
                          **{k: np.asarray(v) for k, v in d_losses.items()}}
                visualizer.print_current_errors(
                    epoch, iter_counter.epoch_iter, losses,
                    iter_counter.time_per_iter,
                )
                visualizer.plot_current_errors(
                    losses, iter_counter.total_steps_so_far
                )
            if diag_fn is not None and iter_counter._trigger(opt.stats_freq):
                stats = {k: np.asarray(v)
                         for k, v in diag_fn(state.variables).items()}
                visualizer.plot_current_errors(
                    stats, iter_counter.total_steps_so_far
                )
            if iter_counter.needs_displaying() and fake is not None:
                # ref planes may be deduped off the wire in the paired
                # stage (dataset.py get_sample); tensor2im handles both
                # uint8-wire and [-1,1] float images
                visuals = {
                    "input_ref": np.asarray(
                        data.get("label_ref", data["label_tag"])[0]),
                    "input_tag": np.asarray(data["label_tag"][0]),
                    "synthesized_image": np.asarray(fake[0]),
                    "image_ref": np.asarray(
                        data.get("image_ref", data["image_tag"])[0]),
                    "image_tag": np.asarray(data["image_tag"][0]),
                }
                visualizer.display_current_results(
                    visuals, epoch, iter_counter.total_steps_so_far
                )
            if iter_counter.needs_saving():
                print(
                    f"saving the latest model (epoch {epoch}, "
                    f"total_steps {iter_counter.total_steps_so_far})"
                )
                CK.save_checkpoint(opt, "latest", state)
                iter_counter.record_current_iter()

        if wall_t0 is not None and wall_steps > 0:
            for v in {**g_losses, **d_losses}.values():
                np.asarray(v)  # drain the async queue before stopping the clock
            dt = time.perf_counter() - wall_t0
            rate = wall_steps * opt.batchSize / dt
            print(
                f"epoch {epoch} wall throughput: {rate:.2f} img/s over "
                f"{wall_steps} steps ({dt / wall_steps:.3f} s/step incl. data)"
            )
            visualizer.plot_current_errors(
                {"wall_img_per_s": np.float32(rate)},
                iter_counter.total_steps_so_far,
            )
        return stop

    for epoch in iter_counter.training_epochs():
        stopped = False
        if opt.unpairTrain:
            stopped = run_epoch(epoch, dataloader2, curr_step=2)
        if not stopped:
            stopped = run_epoch(epoch, dataloader, curr_step=1)
        if stopped:
            print(f"stopping at --max_steps {opt.max_steps}")
            CK.save_checkpoint(opt, "latest", state)
            break
        state = state.set_learning_rate(opt, epoch + 1)
        iter_counter.record_epoch_end()
        if epoch % opt.save_epoch_freq == 0 or epoch == iter_counter.total_epochs:
            print(
                f"saving the model at the end of epoch {epoch}, "
                f"iters {iter_counter.total_steps_so_far}"
            )
            CK.save_checkpoint(opt, "latest", state)
            CK.save_checkpoint(opt, epoch, state)

        rss_gb = _vm_rss_gb() if opt.rss_restart_gb > 0 else 0.0
        if opt.rss_restart_gb > 0 and rss_gb >= opt.rss_restart_gb:
            # the axon relay leaks every H2D staging buffer (PERF.md):
            # checkpoint, persist the epoch boundary, and exec-restart this
            # process through the --continue_train path so host RSS resets
            print(
                f"host RSS {rss_gb:.1f} GiB >= --rss_restart_gb "
                f"{opt.rss_restart_gb:g}: checkpointing and re-exec'ing "
                "to shed leaked H2D staging buffers"
            )
            CK.save_checkpoint(opt, "latest", state)
            iter_counter.current_epoch = epoch + 1
            iter_counter.epoch_iter = 0
            iter_counter.record_current_iter()
            argv = [sys.executable] + sys.argv
            if "--continue_train" not in argv:
                argv.append("--continue_train")
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable, argv)

    print("Training was successfully finished.")


if __name__ == "__main__":
    main()
