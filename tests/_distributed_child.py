"""Child process for tests/test_distributed_launch.py: one rank of a
2-process CPU 'pod'. Joins the jax.distributed coordinator, forms a
global mesh over all processes' devices, and runs cross-process
collectives (psum via shard_map, global-array reduction via jit).

Prints 'OK <sum>' on success, 'SKIP: <reason>' when this jaxlib has no
CPU cross-process collective backend."""

import sys


def main():
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # the axon sitecustomize overrides JAX_PLATFORMS; force CPU before the
    # backend initialises (same trick as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception as e:  # jaxlib without CPU collectives
        print(f"SKIP: no cpu collectives config: {e}")
        return
    try:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
    except Exception as e:
        print(f"SKIP: distributed init failed: {e}")
        return

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()  # all processes' devices, addressable + not
    if len(devs) < nprocs:
        print(f"SKIP: only {len(devs)} global devices")
        return
    mesh = Mesh(np.asarray(devs), ("dp",))

    # each process contributes its local shard of a global batch
    local = np.full(
        (len(jax.local_devices()), 4), float(pid + 1), np.float32
    )
    global_shape = (len(devs), 4)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local, global_shape
    )

    # cross-process reduction through jit (XLA inserts the collective)
    total = jax.jit(
        lambda x: jnp.sum(x),
        out_shardings=NamedSharding(mesh, P()),
    )(arr)

    # explicit psum through shard_map (the collective the sharded
    # attention / dp-eval paths rely on)
    from jax.experimental.shard_map import shard_map

    psummed = jax.jit(
        shard_map(
            lambda x: jax.lax.psum(jnp.sum(x), "dp"),
            mesh=mesh,
            in_specs=P("dp"),
            out_specs=P(),
        )
    )(arr)

    t, p = float(total), float(psummed)
    assert abs(t - p) < 1e-5, (t, p)

    # --- the flagship KD train step across the 2-process mesh ----------
    # (what scripts/launch.py runs per pod host: replicated params, batch
    # sharded over dp spanning BOTH processes, XLA inserting the
    # cross-process grad all-reduce)
    import os
    import sys as _sys

    _sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )
    import optax

    from sea_tpu.training.opt_trainer import tiny_configs
    from sea_tpu.training.distill import SeaOptKD
    from sea_tpu.training.optimizer import make_optimizer

    t_cfg, s_cfg = tiny_configs("perlin")
    kd = SeaOptKD(t_cfg, s_cfg)
    N, T = len(devs), 32
    ids_l = np.ones((len(jax.local_devices()), T), np.int32)
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("dp"))
    ids = jax.make_array_from_process_local_data(dsh, ids_l, (N, T))

    ids_host = jnp.ones((N, T), jnp.int32)  # same content on every rank
    t_vars = kd.teacher.init(jax.random.key(0), ids_host, ids_host)
    s_vars = kd.student.init(jax.random.key(1), ids_host, ids_host)
    tx = make_optimizer(lr=1e-3)
    opt_state = tx.init(s_vars["params"])
    t_vars = jax.device_put(t_vars, repl)
    s_params = jax.device_put(s_vars["params"], repl)
    s_extra = jax.device_put(
        {k: v for k, v in s_vars.items() if k != "params"}, repl
    )
    opt_state = jax.device_put(opt_state, repl)

    def train_step(t_vars, s_params, opt_state, ids):
        def loss_fn(prm):
            sv = dict(s_extra)
            sv["params"] = prm
            loss, _ = kd.kd_loss(t_vars, sv, ids, ids, ids)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(s_params)
        updates, opt_state2 = tx.update(grads, opt_state, s_params)
        return loss, optax.apply_updates(s_params, updates), opt_state2

    step = jax.jit(
        train_step,
        in_shardings=(repl, repl, repl, dsh),
        out_shardings=(repl, repl, repl),
    )
    loss, new_params, _ = step(t_vars, s_params, opt_state, ids)
    # a replicated-out scalar is fully addressable on every rank
    loss_v = float(loss)
    assert np.isfinite(loss_v), loss_v
    # updated params must be identical across ranks (the all-reduce ran)
    csum = float(
        sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(new_params))
    )
    print(f"OK {t} loss {loss_v:.6f} csum {csum:.6f}")


if __name__ == "__main__":
    main()
