"""FiBiNET step-cost attribution: stock vs ablated variants (slope timing
per docs/DESIGN.md)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, N_SPARSE, N_DENSE, VOCAB, EMB = 4096, 26, 13, 10000, 10


def main(variants):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/xdeepfm_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import flax.linen as nn
    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu import models as M
    from xdeepfm_tpu.nn import interaction as I

    rng = np.random.default_rng(0)
    cols = [SparseFeat(f"C{i}", VOCAB, embedding_dim=EMB)
            for i in range(N_SPARSE)] + [
        DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]

    for which in variants:
        kw = {}
        if which == "bilinear_all":
            kw["bilinear_type"] = "all"
        if which == "tiny_dnn":
            kw["dnn_hidden_units"] = (8,)
        if which == "nose":
            # SENET replaced by identity
            class _IdSE(nn.Module):
                filed_size: int = 0
                reduction_ratio: int = 3
                seed: int = 1024

                @nn.compact
                def __call__(self, x, training=False):
                    return x

            orig = I.SENETLayer
            import xdeepfm_tpu.models.fibinet as fb
            fb.SENETLayer = _IdSE
        model = M.FiBiNET(cols, cols, **kw)
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
        print(json.dumps({"variant": which,
                          "step_ms": round(step * 1e3, 2)}), flush=True)
        if which == "nose":
            import xdeepfm_tpu.models.fibinet as fb
            fb.SENETLayer = orig


if __name__ == "__main__":
    main(sys.argv[1:] or ["stock", "bilinear_all", "tiny_dnn", "nose"])
