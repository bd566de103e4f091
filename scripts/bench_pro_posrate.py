"""Masked flash-CE positive-rate scaling (xDeepFMPro, sfg_positive_only).

The round-4 masked-CE path sorts rows by the loss mask and skips zero-weight
rows' batch tiles (compute AND DMA), so the SFG slice of the step should
shrink roughly linearly with the positive rate.  One process, ONE compiled
step (num_valid rides in as a dynamic SMEM scalar — label changes never
recompile), several label tensors: the deltas are same-process A/Bs, the
only timing the device tunnel makes decision-grade (BASELINE.md).

    python scripts/bench_pro_posrate.py [rate ...]   # default 0.5 0.25 0.1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 4096))
N_SPARSE, N_DENSE, VOCAB, EMB = 26, 13, 10000, 10


def main(rates):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/xdeepfm_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from xdeepfm_tpu import pro
    from xdeepfm_tpu.features import DenseFeat, SparseFeat

    rng = np.random.default_rng(0)
    cols = [
        SparseFeat(f"C{i}", VOCAB, embedding_dim=EMB) for i in range(N_SPARSE)
    ] + [DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]
    model = pro.xDeepFMPro(cols, cols)
    model.compile("adam", "binary_crossentropy", metrics=[])
    x = {
        f"C{i}": rng.integers(0, VOCAB, BATCH).astype(np.int64)
        for i in range(N_SPARSE)
    }
    x.update({
        f"I{i}": rng.uniform(0, 1, BATCH).astype(np.float32)
        for i in range(N_DENSE)
    })
    batch = {k: jnp.asarray(v) for k, v in model.schema.pack(x).items()}
    mask = jnp.ones((BATCH,), jnp.float32)

    def go(y, n, i0):
        t0 = time.time()
        total = None
        for i in range(i0, i0 + n):
            (
                model.params, model.batch_stats, model.opt_state,
                total, _, _,
            ) = model._train_step(
                model.params, model.batch_stats, model.opt_state,
                batch, y, mask, i,
            )
        float(total)
        return time.time() - t0

    ys = {
        r: jnp.asarray(
            (rng.uniform(0, 1, (BATCH, 1)) < r).astype(np.float32)
        )
        for r in rates
    }
    go(ys[rates[0]], 2, 0)  # compile once; later rates reuse the program
    step_counter = 2
    for r in rates:
        y = ys[r]
        go(y, 2, step_counter)  # settle
        d1 = go(y, 5, step_counter + 2)
        d2 = go(y, 20, step_counter + 7)
        step_counter += 27
        step = (d2 - d1) / 15.0
        print(json.dumps({
            "pos_rate": r,
            "step_ms": round(step * 1e3, 2),
            "examples_per_s": round(BATCH / step, 0),
        }), flush=True)


if __name__ == "__main__":
    rates = [float(a) for a in sys.argv[1:]] or [0.5, 0.25, 0.1]
    main(rates)
