"""A/B: single-step dispatch vs K-step multi-dispatch train throughput.

Same shapes as bench.py (reference canonical Criteo config).  Slope timing
over chained dispatches with a value fetch; multi-dispatch stacks the same
batch K times (input values don't affect timing; params thread through scan).

Usage: python scripts/bench_dispatch.py [K ...]   (default: 1 4 8 16)
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
    y = jnp.asarray(rng.integers(0, 2, size=(BATCH, 1)).astype(np.float32))
    mask = jnp.ones((BATCH,), jnp.float32)

    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]
    # host snapshot: the train steps donate their inputs, so each K restarts
    # from a fresh device copy of the same initial state
    master = jax.tree.map(
        np.asarray, (model.params, model.batch_stats, model.opt_state)
    )
    for K in ks:
        params, bs, opt = jax.tree.map(jnp.asarray, master)
        if K == 1:
            def run(n, i0, state):
                params, bs, opt = state
                t0 = time.time()
                total = None
                for i in range(i0, i0 + n):
                    params, bs, opt, total, _, _ = model._train_step(
                        params, bs, opt, batch, y, mask, i
                    )
                float(total)
                return time.time() - t0, (params, bs, opt)
        else:
            kbatch = {k: jnp.stack([v] * K) for k, v in batch.items()}
            ky = jnp.stack([y] * K)
            kmask = jnp.stack([mask] * K)

            def run(n, i0, state, K=K, kbatch=kbatch, ky=ky, kmask=kmask):
                params, bs, opt = state
                t0 = time.time()
                totals = None
                for i in range(i0, i0 + n):
                    params, bs, opt, totals, _ = model._train_step_multi(
                        params, bs, opt, kbatch, ky, kmask, i0 + i * K
                    )
                float(totals[-1])
                return time.time() - t0, (params, bs, opt)

        _, state = run(2, 0, (params, bs, opt))
        n1, n2 = 5, 20
        d1, state = run(n1, 2, state)
        d2, state = run(n2, 2 + n1, state)
        step_s = (d2 - d1) / (n2 - n1) / K
        print(json.dumps({
            "steps_per_dispatch": K,
            "step_ms": round(step_s * 1e3, 3),
            "examples_per_s": round(BATCH / step_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
