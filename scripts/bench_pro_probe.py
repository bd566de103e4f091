"""xDeepFMPro step-time attribution probe (round-4, VERDICT #1).

End-to-end train-step ablations (the only trustworthy timing through the
device tunnel — see BASELINE.md): each variant is a full compiled step with
one SFG glue component toggled, so component costs come out as differences
between chained-dispatch slope timings, never as isolated probes.

Variants:
  full        canonical xDeepFMPro (pallas flash-CE, label attention,
              dropout 0.1, positive_only)
  nosfg       use_sfg=False (the base xDeepFM skeleton)
  noattn      sfg_use_label_attention=False  -> label-attention cost
  nodrop      sfg_dropout=0.0                -> dropout/RNG cost
  allsamples  sfg_positive_only=False        -> mask-math cost
  light       xDeepFMProLight (reference smaller defaults)

Usage: python scripts/bench_pro_probe.py [variant ...]
Prints one JSON line per variant: {"variant", "step_ms", "examples_per_s"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 4096))
# Label positive rate: the masked flash-CE path skips zero-weight rows' batch
# tiles (sfg_positive_only), so the SFG cost scales with this.  Real CTR
# corpora run ~0.25; the default 0.5 matches the historical bench labels.
POS_RATE = float(os.environ.get("BENCH_POS_RATE", "0.5"))
N_SPARSE, N_DENSE, VOCAB, EMB = 26, 13, 10000, 10


def variants():
    from xdeepfm_tpu import pro

    return {
        "full": lambda c: pro.xDeepFMPro(c, c),
        "nosfg": lambda c: pro.xDeepFMPro(c, c, use_sfg=False),
        "noattn": lambda c: pro.xDeepFMPro(
            c, c, sfg_use_label_attention=False
        ),
        "nodrop": lambda c: pro.xDeepFMPro(c, c, sfg_dropout=0.0),
        "allsamples": lambda c: pro.xDeepFMPro(
            c, c, sfg_positive_only=False
        ),
        "light": lambda c: pro.xDeepFMProLight(c, c),
    }


def main(names=None):
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

    from xdeepfm_tpu.features import DenseFeat, SparseFeat

    all_v = variants()
    run_names = names or list(all_v)
    rng = np.random.default_rng(0)
    cols = [
        SparseFeat(f"C{i}", VOCAB, embedding_dim=EMB) for i in range(N_SPARSE)
    ] + [DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]
    x = {
        f"C{i}": rng.integers(0, VOCAB, BATCH).astype(np.int64)
        for i in range(N_SPARSE)
    }
    x.update({
        f"I{i}": rng.uniform(0, 1, BATCH).astype(np.float32)
        for i in range(N_DENSE)
    })
    y_np = (rng.uniform(0, 1, (BATCH, 1)) < POS_RATE).astype(np.float32)
    for name in run_names:
        try:
            model = all_v[name](cols)
            model.compile("adam", "binary_crossentropy", metrics=[])
            batch = {
                k: jnp.asarray(v) for k, v in model.schema.pack(x).items()
            }
            y = jnp.asarray(y_np)
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
                "pos_rate": POS_RATE,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or None)
