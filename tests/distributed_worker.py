"""Multi-process worker for test_distributed.py.

Run as ``python distributed_worker.py <process_id> <num_processes> <port>
<out_dir>`` — one OS process per simulated host, 2 virtual CPU devices each.
Exercises the real `xdeepfm_tpu.parallel.distributed` surface:

* ``initialize()`` via the XDEEPFM_* env vars (the multi-host bootstrap),
* ``global_batch_from_host_local`` (each process contributes only its local
  slice of the global batch),
* one explicit-psum train step under ``shard_map`` (grads averaged over the
  ``data`` axis, SGD update on replicated params).

The updated params are written to ``<out_dir>/params_<pid>.npz`` for the
driving test to compare against a single-process full-batch step.
"""

import os
import sys


def main():
    pid, nproc, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    # each simulated host gets 2 virtual CPU devices
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["XDEEPFM_NUM_PROCESSES"] = str(nproc)
    os.environ["XDEEPFM_COORDINATOR"] = f"localhost:{port}"
    os.environ["XDEEPFM_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from xdeepfm_tpu.parallel import distributed

    started = distributed.initialize()  # env-var path
    assert started, "initialize() must bootstrap when XDEEPFM_NUM_PROCESSES>1"
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))

    # deterministic global batch; each process loads ONLY its slice
    B_global, D = 32, 4
    rng = np.random.default_rng(0)
    x_all = rng.normal(size=(B_global, D)).astype(np.float32)
    y_all = (rng.uniform(size=(B_global, 1)) < 0.4).astype(np.float32)
    lo = pid * (B_global // nproc)
    hi = lo + B_global // nproc
    batch = distributed.global_batch_from_host_local(
        {"x": x_all[lo:hi], "y": y_all[lo:hi]}, mesh
    )
    assert batch["x"].shape == (B_global, D)

    w0 = np.linspace(-0.5, 0.5, D).astype(np.float32).reshape(D, 1)
    b0 = np.zeros((1,), np.float32)
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}

    def local_loss(params, x, y):
        logits = x @ params["w"] + params["b"]
        p = jax.nn.sigmoid(logits)
        eps = 1e-7
        return jnp.sum(-(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps)))

    def shard_step(params, x, y):
        # per-shard grads; explicit psum over the data axis (sum-loss
        # semantics, matching the engine's sum-BCE) then SGD
        grads = jax.grad(local_loss)(params, x, y)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        return jax.tree.map(lambda p, g: p - 0.1 * g / B_global, params, grads)

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    step = jax.jit(
        shard_map(
            shard_step, mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
            check_rep=False,
        ),
        in_shardings=(repl, data_sh, data_sh),
        out_shardings=repl,
    )
    params = jax.device_put(params, repl)
    new_params = step(params, batch["x"], batch["y"])
    out = {k: np.asarray(jax.device_get(v)) for k, v in new_params.items()}
    np.savez(os.path.join(out_dir, f"params_{pid}.npz"), **out)
    print(f"[worker {pid}] OK", flush=True)


if __name__ == "__main__":
    main()
