"""ONN step-cost attribution (round-4, VERDICT #7): where do ~9 ms go?

ONN's O(F^2) pair tables hold 2*P*E*vocab = 65M params at canonical shapes
(325 pairs x vocab 10k x emb 10 x 2 sides) — 12.5x the flagship's 5.2M.
Dense Adam + L2 reg walk ALL of them every step regardless of the 2F
wide-row gathers.  End-to-end variants decompose table-size-bound cost
(optimizer/reg full-table passes) from row-touch-bound cost (gather/scatter):

  full      canonical ONN (vocab 10k, adam, l2 1e-5)
  noreg     l2_reg_embedding=0 (kills the reg value+gradient full passes)
  sgd       sgd optimizer (no moment state: 1/3 the optimizer traffic)
  vocab100  tables shrunk 100x (row-touch costs unchanged) — the gap to
            `full` is the total table-size-bound cost

Usage: python scripts/bench_onn_probe.py [variant ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 4096))
N_SPARSE, N_DENSE, VOCAB, EMB = 26, 13, 10000, 10


def main(names=None):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/xdeepfm_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import ONN

    variants = {
        "full": (VOCAB, "adam", 1e-5),
        "noreg": (VOCAB, "adam", 0.0),
        "sgd": (VOCAB, "sgd", 1e-5),
        "vocab100": (100, "adam", 1e-5),
    }
    run_names = names or list(variants)
    rng = np.random.default_rng(0)
    for name in run_names:
        vocab, opt, l2 = variants[name]
        try:
            cols = [
                SparseFeat(f"C{i}", vocab, embedding_dim=EMB)
                for i in range(N_SPARSE)
            ] + [DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]
            model = ONN(cols, cols, l2_reg_embedding=l2)
            model.compile(opt, "binary_crossentropy", metrics=[])
            x = {
                f"C{i}": rng.integers(0, vocab, BATCH).astype(np.int64)
                for i in range(N_SPARSE)
            }
            x.update({
                f"I{i}": rng.uniform(0, 1, BATCH).astype(np.float32)
                for i in range(N_DENSE)
            })
            y = jnp.asarray(
                rng.integers(0, 2, (BATCH, 1)).astype(np.float32)
            )
            batch = {
                k: jnp.asarray(v) for k, v in model.schema.pack(x).items()
            }
            mask = jnp.ones((BATCH,), jnp.float32)

            def go(n, i0):
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

            go(2, 0)
            d1 = go(5, 2)
            d2 = go(20, 7)
            step = (d2 - d1) / 15.0
            print(json.dumps({
                "variant": name,
                "step_ms": round(step * 1e3, 2),
                "examples_per_s": round(BATCH / step, 0),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or None)
