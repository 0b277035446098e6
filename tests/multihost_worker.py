"""Worker process for the multi-host (2-process jax.distributed) proof test.

Usage: python tests/multihost_worker.py <coordinator> <num_processes> \
       <process_id> <local_devices>

Each process brings up `local_devices` virtual CPU devices, joins the
cluster through `parallel.initialize_distributed` (the production code
path), builds the GLOBAL ('data',) mesh over all processes' devices, runs
ONE data-parallel train step on a deterministic batch, and prints the loss.
The pytest driver asserts the 2-process loss equals the 1-process loss —
the executed multi-controller equivalent of the reference's 4-device
MirroredStrategy run (/root/reference/main_training.py:49-56,323-332).

Data contract: every process holds the full global batch (same seed), and
`parallel.put_global` donates only the shards local devices own.
"""

import sys


def main() -> int:
    coordinator, num_processes, process_id, local_devices = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))

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

    from unet_rir_tpu import models, train
    from unet_rir_tpu.train.losses import LossConfig

    # Deterministic global batch — identical on every process (seed 500).
    rng = np.random.default_rng(500)
    B, H, W, C = 8, 144, 160, 2
    spec_in = rng.uniform(0, 1, (B, H, W, C)).astype(np.float32)
    emb = rng.integers(0, 1500, (B, 2, 16)).astype(np.int32)
    spec_out = rng.uniform(0, 1, (B, H, W, C)).astype(np.float32)

    model = models.UNet(number_filters_0=4, batch_norm=False)
    variables = train.init_model(model, (jnp.asarray(spec_in[:2]),
                                         jnp.asarray(emb[:2]),
                                         jnp.asarray(spec_out[:2])))
    opt = train.build_optimizer("adam", 1e-3)
    step = train.make_train_step(model, opt, LossConfig())

    mesh = parallel.make_mesh(n_data=n_global, n_spatial=1)
    state = parallel.replicate_state(
        train.TrainState.create(variables, opt), mesh)
    batch = parallel.shard_batch((spec_in, emb, spec_out), mesh)
    # The PRNG key must also be a global (replicated) array under
    # multi-controller jit; raw uint32 key data keeps put_global simple.
    key = parallel.put_global(
        np.asarray(jax.random.PRNGKey(0)), parallel.replicated(mesh))

    state, metrics = step(state, batch, key, 1e-3)
    loss = float(metrics["loss"])
    # First-parameter checksum proves the update (not just the loss) agrees.
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    print(f"MULTIHOST pid={process_id} nproc={jax.process_count()} "
          f"ndev={n_global} loss={loss:.10f} psum={float(np.sum(p0)):.10f}",
          flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
