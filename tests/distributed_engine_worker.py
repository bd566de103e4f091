"""Engine-level multi-process worker for test_distributed.py.

Run as ``python distributed_engine_worker.py <pid> <nproc> <port> <out_dir>``
— one OS process per simulated host, 2 virtual CPU devices each.  Unlike
``distributed_worker.py`` (a toy logistic regression over the raw collective
primitives), this drives the REAL engine across the process boundary:

* a small xDeepFM (CIN + DNN + linear + stacked embedding tables) built and
  compiled exactly as a user would,
* ``shard_model_state`` row-shards the tables over the global (data, embed)
  mesh spanning both processes,
* each process contributes only its host-local slice of the batch via
  ``global_batch_from_host_local``,
* one jitted ``BaseModel._train_step`` executes SPMD across processes.

Updated params are allgathered to host and written to
``<out_dir>/engine_params_<pid>.npz`` (flattened path->array) for the driving
test to compare against a single-process single-device step.

The reference has no analog (its parallelism is single-process DataParallel,
``deepctr/models/basemodel.py:206-209``); this closes SURVEY §4's
"multi-process tests via jax.distributed" commitment at engine level.
"""

import os
import sys


def main():
    pid, nproc, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    # "dense" (default) or "lazy_packed": the round-sparse optimizer with
    # the packed param|state layout — its shard-local row update (dedup +
    # block exchange over the embed axis) then runs across REAL process
    # boundaries
    mode = sys.argv[5] if len(sys.argv) > 5 else "dense"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["XDEEPFM_NUM_PROCESSES"] = str(nproc)
    os.environ["XDEEPFM_COORDINATOR"] = f"localhost:{port}"
    os.environ["XDEEPFM_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    from xdeepfm_tpu.parallel import distributed, make_mesh, shard_model_state

    started = distributed.initialize()
    assert started and jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g

    B_GLOBAL = 32
    model, _ = g._build_model(
        n_sparse=4, n_dense=3, vocab=64, emb_dim=8, cin=(8, 6), dnn=(16,)
    )
    if mode == "lazy_packed":
        model.compile("adam", "binary_crossentropy", metrics=[],
                      embedding_optimizer="lazy",
                      embedding_gradient="split")
    else:
        model.compile("adam", "binary_crossentropy", metrics=[])

    mesh = make_mesh()  # all 2*nproc global devices -> (data, embed)
    assert mesh.shape["embed"] > 1, "tables must actually shard"
    with mesh:
        shard_model_state(model, mesh)
        if mode == "lazy_packed":
            assert model._packed_tables, "packed layout expected"
        batch_np = g._make_batch(model, B_GLOBAL, 64, seed=0)
        y_all = (
            np.random.default_rng(1)
            .integers(0, 2, size=(B_GLOBAL, 1))
            .astype(np.float32)
        )
        lo = pid * (B_GLOBAL // nproc)
        hi = lo + B_GLOBAL // nproc
        local = {k: np.asarray(v)[lo:hi] for k, v in batch_np.items()}
        local["__y"] = y_all[lo:hi]
        local["__mask"] = np.ones((hi - lo,), np.float32)
        gbatch = distributed.global_batch_from_host_local(local, mesh)
        y = gbatch.pop("__y")
        mask = gbatch.pop("__mask")
        (
            model.params, model.batch_stats, model.opt_state,
            total, loss, _,
        ) = model._train_step(
            model.params, model.batch_stats, model.opt_state, gbatch, y,
            mask, 0,
        )
        total = float(total)

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(model.params)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        flat[key] = np.asarray(
            multihost_utils.process_allgather(leaf, tiled=True)
        )
    flat["__total"] = np.float32(total)
    suffix = "" if mode == "dense" else f"_{mode}"
    np.savez(
        os.path.join(out_dir, f"engine_params_{pid}{suffix}.npz"), **flat
    )
    print(f"[engine worker {pid}] OK mode={mode} total={total:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
