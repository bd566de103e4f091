"""AutoInt step-cost attribution: sweep att_layer_num (slope = per-layer
InteractingLayer cost).  Slope timing per docs/DESIGN.md."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, N_SPARSE, N_DENSE, VOCAB, EMB = 4096, 26, 13, 10000, 10


def main(layer_counts):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/xdeepfm_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu import models as M

    rng = np.random.default_rng(0)
    cols = [SparseFeat(f"C{i}", VOCAB, embedding_dim=EMB)
            for i in range(N_SPARSE)] + [
        DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]
    for n in layer_counts:
        model = M.AutoInt(cols, cols, att_layer_num=n)
        model.compile("adam", "binary_crossentropy", metrics=[])
        x = {f.name: rng.integers(0, VOCAB, BATCH).astype(np.int64)
             for f in model.schema.sparse}
        x.update({f.name: rng.uniform(0, 1, BATCH).astype(np.float32)
                  for f in model.schema.dense})
        batch = {k: jnp.asarray(v) for k, v in model.schema.pack(x).items()}
        y = jnp.asarray(rng.integers(0, 2, (BATCH, 1)).astype(np.float32))
        mask = jnp.ones((BATCH,), jnp.float32)

        def go(m, i0):
            t0 = time.time()
            total = None
            for i in range(i0, i0 + m):
                (model.params, model.batch_stats, model.opt_state, total, _,
                 _) = model._train_step(model.params, model.batch_stats,
                                        model.opt_state, batch, y, mask, i)
            float(total)
            return time.time() - t0

        go(2, 0)
        d1 = go(5, 2)
        d2 = go(20, 7)
        step = (d2 - d1) / 15.0
        print(json.dumps({"att_layer_num": n,
                          "step_ms": round(step * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 3])
