"""Additive ablation of the canonical train step (fused-lookup path).

Times fwd+bwd of nested model slices so components attribute cleanly, plus
the optimizer update alone.  All variants reproduce the engine's fused
`_compact` lookup exactly (one combined [R, 11] gather; backward = one
scatter), so numbers match the real `bench.py` step.

Usage: python scripts/bench_ablate.py
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
    import optax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/xdeepfm_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from xdeepfm_tpu.embeddings import fused_gather, touched_ids
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
    assert model._fused_dense_groups

    rng = np.random.default_rng(0)
    x = {}
    for f in model.schema.sparse:
        x[f.name] = rng.integers(0, VOCAB, size=BATCH).astype(np.int64)
    for f in model.schema.dense:
        x[f.name] = rng.uniform(0, 1, size=BATCH).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in model.schema.pack(x).items()}
    y = jnp.asarray(rng.integers(0, 2, size=(BATCH,)).astype(np.float32))

    module = model.module
    groups = model._fused_dense_groups

    def tree_get(tree, path):
        for seg in path.split("/"):
            tree = tree[seg]
        return tree

    def with_compact(p, b):
        compact = {}
        for entries, paths in groups:
            ids = touched_ids(b, entries)
            tables = tuple(tree_get(p, path) for path in paths)
            meta = (tables[0].shape[0], tuple(t.shape[1] for t in tables))
            occ = fused_gather(meta, tables, ids)
            o = 0
            for path, t in zip(paths, tables):
                compact[path] = occ[:, o : o + t.shape[1]]
                o += t.shape[1]
        b = dict(b)
        b["_compact"] = compact
        return b

    def noised(b, s):
        b = dict(b)
        b["dense"] = b["dense"] + s * 1e-20
        return b

    def make(fn):
        """fn(module, params-bound apply fn closure) -> scalar; wrap into a
        chained fwd+bwd slope target."""

        def loss(params, s):
            b = with_compact(params, noised(batch, s))

            def run(m):
                return fn(m, b)

            return module.apply({"params": params}, method=run)

        def f(params, s):
            v, g = jax.value_and_grad(loss)(params, s)
            gs = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
            return v + 1e-30 * gs

        return f

    def slope(fn, n1=5, n2=20):
        jfn = jax.jit(fn)
        params = model.params

        def run(n, s):
            t0 = time.time()
            for _ in range(n):
                s = jfn(params, s)
            jax.block_until_ready(s)
            return time.time() - t0, s

        s = jnp.zeros(())
        _, s = run(2, s)
        d1, s = run(n1, s)
        d2, s = run(n2, s)
        return (d2 - d1) / (n2 - n1)

    out = {}

    # 1. fused lookup alone (embed + linear-table walk, no towers)
    out["lookup_ms"] = round(slope(make(
        lambda m, b: jnp.sum(m.embedding_dict.stacked_inputs(b, m.dnn_cols)[0])
        + jnp.sum(m.linear_model(b))
    )) * 1e3, 3)

    # 2. lookup + DNN tower
    def dnn_slice(m, b):
        stack, dense = m.embedding_dict.stacked_inputs(b, m.dnn_cols)
        din = jnp.concatenate([stack.reshape(stack.shape[0], -1), dense], -1)
        return jnp.sum(m.dnn_linear(m.dnn(din, training=True))) + jnp.sum(
            m.linear_model(b)
        )

    out["lookup_dnn_ms"] = round(slope(make(dnn_slice)) * 1e3, 3)

    # 3. lookup + CIN tower
    def cin_slice(m, b):
        stack, _ = m.embedding_dict.stacked_inputs(b, m.dnn_cols)
        return jnp.sum(m.cin_linear(m.cin(stack, training=True))) + jnp.sum(
            m.linear_model(b)
        )

    out["lookup_cin_ms"] = round(slope(make(cin_slice)) * 1e3, 3)

    # 4. full forward + loss (everything but optimizer/reg)
    def full_slice(m, b):
        out_ = m(b, training=True)
        p = jnp.clip(out_["pred"].reshape(-1), 1e-7, 1 - 1e-7)
        return jnp.sum(-(y * jnp.log(p) + (1 - y) * jnp.log(1 - p)))

    out["full_loss_ms"] = round(slope(make(full_slice)) * 1e3, 3)

    # 5. optimizer alone: fixed grads, threaded (params, opt_state)
    grads = jax.tree_util.tree_map(lambda w: jnp.full_like(w, 1e-8),
                                   model.params)

    def opt_only(params, opt_state):
        updates, opt_state = model.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    jopt = jax.jit(opt_only, donate_argnums=(0, 1))
    ps = jax.tree_util.tree_map(jnp.copy, model.params)
    os_ = jax.tree_util.tree_map(
        lambda w: jnp.copy(w) if hasattr(w, 'dtype') else w, model.opt_state)

    def run_opt(n, ps, os_):
        t0 = time.time()
        for _ in range(n):
            ps, os_ = jopt(ps, os_)
        jax.block_until_ready(ps)
        return time.time() - t0, ps, os_

    _, ps, os_ = run_opt(2, ps, os_)
    d1, ps, os_ = run_opt(5, ps, os_)
    d2, ps, os_ = run_opt(20, ps, os_)
    out["adam_only_ms"] = round((d2 - d1) / 15.0 * 1e3, 3)

    # 6. reg value+grad alone
    def reg_only(params, s):
        def rf(p):
            leaf = jax.tree_util.tree_leaves(p)[0]
            return model._regularization_loss(p) + jnp.sum(leaf) * s * 1e-20
        v, g = jax.value_and_grad(rf)(params)
        gs = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
        return v + 1e-30 * gs

    out["reg_only_ms"] = round(slope(reg_only) * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
