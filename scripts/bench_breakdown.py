"""Component budget of the canonical train step (bench.py shapes).

Slope timing of nested subsets of the step so the pieces attribute cleanly:
  fwd            — forward pass only (loss value)
  fwd_bwd        — value_and_grad (no optimizer update)
  full           — the engine's real train step (grad + Adam + reg + metrics)
Differences give bwd cost and optimizer/reg cost.

Usage: python scripts/bench_breakdown.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, N_SPARSE, N_DENSE, VOCAB, EMB = 4096, 26, 13, 10000, 10


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/xdeepfm_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import xDeepFM

    cols = [
        SparseFeat(f"C{i}", VOCAB, embedding_dim=EMB) for i in range(N_SPARSE)
    ] + [DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]
    model = xDeepFM(
        cols, cols, dnn_hidden_units=(256, 256), cin_layer_size=(256, 128),
        seed=1024,
    )
    model.compile("adam", "binary_crossentropy", metrics=[])

    rng = np.random.default_rng(0)
    x = {}
    for f in model.schema.sparse:
        x[f.name] = rng.integers(0, VOCAB, size=BATCH).astype(np.int64)
    for f in model.schema.dense:
        x[f.name] = rng.uniform(0, 1, size=BATCH).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in model.schema.pack(x).items()}
    batch["labels"] = jnp.zeros((BATCH, 1), jnp.float32)
    batch["sample_mask"] = jnp.ones((BATCH,), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, size=(BATCH, 1)).astype(np.float32))
    mask = jnp.ones((BATCH,), jnp.float32)

    module = model.module
    rngkey = jax.random.PRNGKey(0)

    def _with_compact(params, b):
        """Reproduce the engine's fused `_compact` lookup (see
        BaseModel._build_steps) so fwd/fwd_bwd attribute like the real step."""
        groups = getattr(model, "_fused_dense_groups", ())
        if not groups:
            return b
        from xdeepfm_tpu.embeddings import fused_gather, touched_ids

        def tree_get(tree, path):
            for seg in path.split("/"):
                tree = tree[seg]
            return tree

        compact = {}
        for entries, paths in groups:
            ids = touched_ids(b, entries)
            tables = tuple(tree_get(params, path) for path in paths)
            meta = (tables[0].shape[0], tuple(t.shape[1] for t in tables))
            occ = fused_gather(meta, tables, ids)
            o = 0
            for path, t in zip(paths, tables):
                compact[path] = occ[:, o : o + t.shape[1]]
                o += t.shape[1]
        b = dict(b)
        b["_compact"] = compact
        return b

    def loss_fn(params, noise):
        b = {k: (v + noise if v.dtype == jnp.float32 else v)
             for k, v in batch.items()}
        b = _with_compact(params, b)
        out = module.apply(
            {"params": params},
            b,
            training=True,
            rngs={"dropout": rngkey},
        )
        p = jnp.clip(out["pred"].reshape(-1), 1e-7, 1 - 1e-7)
        yy = y.reshape(-1)
        return jnp.sum(-(yy * jnp.log(p) + (1 - yy) * jnp.log(1 - p)))

    # chain via a scalar noise input derived from the previous output so the
    # tunnel cannot overlap independent dispatches
    fwd = jax.jit(lambda params, s: loss_fn(params, s * 1e-20))

    def _fwd_bwd(params, s):
        v, g = jax.value_and_grad(loss_fn)(params, s * 1e-20)
        # fold every grad leaf into the output so DCE can't drop the backward
        gs = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
        return v + 1e-30 * gs

    fwd_bwd = jax.jit(_fwd_bwd)

    def slope(fn, *states):
        def run(n, s):
            t0 = time.time()
            for _ in range(n):
                s = fn(s)
            jax.block_until_ready(s)
            return time.time() - t0, s

        s = states[0]
        _, s = run(2, s)
        d1, s = run(5, s)
        d2, s = run(20, s)
        return (d2 - d1) / 15.0

    params = model.params

    t_fwd = slope(lambda s: fwd(params, s), jnp.zeros(()))
    t_fwd_bwd = slope(lambda s: fwd_bwd(params, s), jnp.zeros(()))

    # full engine step (threads params/opt so chaining is inherent)
    st = [model.params, model.batch_stats, model.opt_state]

    def full_one(i):
        st[0], st[1], st[2], total, loss, mvals = model._train_step(
            st[0], st[1], st[2], batch, y, mask, i
        )
        return total

    def run_full(n, i0):
        t0 = time.time()
        total = None
        for i in range(i0, i0 + n):
            total = full_one(i)
        float(total)
        return time.time() - t0

    run_full(2, 0)
    d1 = run_full(5, 2)
    d2 = run_full(20, 7)
    t_full = (d2 - d1) / 15.0

    print(json.dumps({
        "fwd_ms": round(t_fwd * 1e3, 3),
        "fwd_bwd_ms": round(t_fwd_bwd * 1e3, 3),
        "full_step_ms": round(t_full * 1e3, 3),
        "bwd_ms": round((t_fwd_bwd - t_fwd) * 1e3, 3),
        "opt_reg_metrics_ms": round((t_full - t_fwd_bwd) * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
