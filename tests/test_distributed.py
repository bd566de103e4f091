"""Multi-process ``jax.distributed`` smoke test (SURVEY §4 commitment).

Spawns 2 local OS processes (2 virtual CPU devices each → a 4-device global
mesh) that bootstrap through ``parallel.distributed.initialize`` (gloo CPU
collectives), assemble a globally-sharded batch with
``global_batch_from_host_local``, and run one explicit-psum train step.
The resulting params must match a single-process full-batch step exactly —
the same parity contract as the in-process DP test
(test_sharding.py::test_dp_training_step_matches_single_device), but across
real process boundaries.

The reference has no multi-host story (its parallelism is single-process
DataParallel, ``deepctr/models/basemodel.py:206-209``); this covers the
repo's own multi-host input-pipeline primitive.
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _reference_params():
    """Single-process full-batch step with identical math (numpy, fp32)."""
    B_global, D = 32, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B_global, D)).astype(np.float32)
    y = (rng.uniform(size=(B_global, 1)) < 0.4).astype(np.float32)
    w = np.linspace(-0.5, 0.5, D).astype(np.float32).reshape(D, 1)
    b = np.zeros((1,), np.float32)
    p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
    # d(sum-BCE)/dlogits = p - y
    dlogits = (p - y).astype(np.float32)
    gw = x.T @ dlogits
    gb = dlogits.sum(axis=0)
    return {"w": w - 0.1 * gw / B_global, "b": b - 0.1 * gb / B_global}


def test_two_process_psum_step_matches_single_process(tmp_path):
    nproc = 2
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    ref = _reference_params()
    results = []
    for pid in range(nproc):
        path = tmp_path / f"params_{pid}.npz"
        assert path.exists(), f"worker {pid} wrote no result"
        results.append(dict(np.load(path)))
    # grads are psum'd → params replicated and identical across processes
    for k in ("w", "b"):
        np.testing.assert_array_equal(results[0][k], results[1][k])
        np.testing.assert_allclose(results[0][k], ref[k], rtol=1e-5, atol=1e-6)


ENGINE_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "distributed_engine_worker.py")


def test_engine_train_step_across_two_processes(tmp_path):
    """The REAL BaseModel._train_step (small xDeepFM, row-sharded embedding
    tables) across 2 OS processes == the same step on a single device."""
    nproc = 2
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, ENGINE_WORKER, str(pid), str(nproc), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"engine worker failed:\n{out}"

    results = []
    for pid in range(nproc):
        path = tmp_path / f"engine_params_{pid}.npz"
        assert path.exists(), f"engine worker {pid} wrote no result"
        results.append(dict(np.load(path)))

    # single-process, single-device reference with identical model/batch
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    B = 32
    model, _ = g._build_model(
        n_sparse=4, n_dense=3, vocab=64, emb_dim=8, cin=(8, 6), dnn=(16,)
    )
    model.compile("adam", "binary_crossentropy", metrics=[])
    batch = {
        k: jnp.asarray(v) for k, v in g._make_batch(model, B, 64, seed=0).items()
    }
    y = jnp.asarray(
        np.random.default_rng(1).integers(0, 2, size=(B, 1)).astype(np.float32)
    )
    mask = jnp.ones((B,), jnp.float32)
    p_ref, _, _, total_ref, _, _ = model._train_step(
        model.params, model.batch_stats, model.opt_state, batch, y, mask, 0
    )
    ref = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(p_ref)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        ref[key] = np.asarray(leaf)

    # both processes saw identical (replicated/allgathered) updated params
    for k in ref:
        np.testing.assert_array_equal(results[0][k], results[1][k])
    np.testing.assert_allclose(
        float(results[0]["__total"]), float(total_ref), rtol=1e-5
    )
    for k in ref:
        np.testing.assert_allclose(
            results[0][k], ref[k], rtol=1e-4, atol=1e-6, err_msg=k
        )


def test_engine_lazy_packed_step_across_two_processes(tmp_path):
    """The lazy+split PACKED train step (row-sparse optimizer, param|state
    in one array, shard-local row updates) across 2 OS processes == the
    same step on a single device.  The dedup + block exchange of
    sharded_lazy_row_update rides REAL cross-process collectives here."""
    nproc = 2
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, ENGINE_WORKER, str(pid), str(nproc), str(port),
             str(tmp_path), "lazy_packed"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"engine worker failed:\n{out}"

    results = []
    for pid in range(nproc):
        path = tmp_path / f"engine_params_{pid}_lazy_packed.npz"
        assert path.exists(), f"engine worker {pid} wrote no result"
        results.append(dict(np.load(path)))

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    B = 32
    model, _ = g._build_model(
        n_sparse=4, n_dense=3, vocab=64, emb_dim=8, cin=(8, 6), dnn=(16,)
    )
    model.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient="split")
    batch = {
        k: jnp.asarray(v)
        for k, v in g._make_batch(model, B, 64, seed=0).items()
    }
    y = jnp.asarray(
        np.random.default_rng(1).integers(0, 2, size=(B, 1)).astype(np.float32)
    )
    mask = jnp.ones((B,), jnp.float32)
    p_ref, _, _, total_ref, _, _ = model._train_step(
        model.params, model.batch_stats, model.opt_state, batch, y, mask, 0
    )
    ref = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(p_ref)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        ref[key] = np.asarray(leaf)

    for k in ref:
        np.testing.assert_array_equal(results[0][k], results[1][k])
    np.testing.assert_allclose(
        float(results[0]["__total"]), float(total_ref), rtol=1e-5
    )
    # the packed param arrays carry the adam m|v row state too — this
    # comparison proves moment parity across the process boundary as well
    for k in ref:
        np.testing.assert_allclose(
            results[0][k], ref[k], rtol=1e-4, atol=1e-6, err_msg=k
        )
