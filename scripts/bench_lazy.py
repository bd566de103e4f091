"""Big-table embedding-optimizer bench: dense vs lazy vs lazy+gradient-split.

Criteo-production shape: 26 sparse fields x vocab-per-field rows, emb 10,
13 dense, xDeepFM CIN(256,128)/DNN(256,256), batch 4096, Adam + L2(1e-5).

The dense path pays full-table optimizer traffic every step; the lazy path
with dense cotangents still materializes a [rows, dim] gradient; the
gradient-split path touches only the batch's rows (plus one reg-value scan).

Usage: python scripts/bench_lazy.py [vocab_per_field] [modes...]
Prints one JSON line per mode with step ms and examples/s.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(vocab, mode, opt="adam"):
    import jax
    import jax.numpy as jnp

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import xDeepFM

    BATCH, N_SPARSE, N_DENSE, EMB = 4096, 26, 13, 10
    cols = [
        SparseFeat(f"C{i}", vocab, embedding_dim=EMB) for i in range(N_SPARSE)
    ] + [DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]
    model = xDeepFM(
        cols, cols, dnn_hidden_units=(256, 256), cin_layer_size=(256, 128),
        seed=1024,
    )
    if mode == "dense":
        model.compile(opt, "binary_crossentropy", metrics=[])
    elif mode == "lazy":
        model.compile(opt, "binary_crossentropy", metrics=[],
                      embedding_optimizer="lazy", embedding_gradient="dense")
    elif mode == "lazy_split":
        # default layout: PACKED [rows, (1+k)D] param|state tables — one
        # gather + one scatter per table per step
        model.compile(opt, "binary_crossentropy", metrics=[],
                      embedding_optimizer="lazy", embedding_gradient="split")
    elif mode == "lazy_split_flat":
        # separate param/state arrays (pre-round-5 layout) for A/B
        model.compile(opt, "binary_crossentropy", metrics=[],
                      embedding_optimizer="lazy", embedding_gradient="split",
                      embedding_layout="flat")
    elif mode == "lazy_split_bf16":
        # bf16 bit-packed moments: half the state HBM (104M-row ADAM fits
        # one chip this way)
        model.compile(opt, "binary_crossentropy", metrics=[],
                      embedding_optimizer="lazy", embedding_gradient="split",
                      embedding_state_dtype="bfloat16")
    else:
        raise ValueError(mode)

    rng = np.random.default_rng(0)
    x = {}
    for f in model.schema.sparse:
        x[f.name] = rng.integers(0, vocab, size=BATCH).astype(np.int64)
    for f in model.schema.dense:
        x[f.name] = rng.uniform(0, 1, size=BATCH).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in model.schema.pack(x).items()}
    y = jnp.asarray(rng.integers(0, 2, size=(BATCH, 1)).astype(np.float32))
    mask = jnp.ones((BATCH,), jnp.float32)

    def run(n, i0):
        t0 = time.time()
        total = None
        for i in range(i0, i0 + n):
            (
                model.params, model.batch_stats, model.opt_state,
                total, loss, mvals,
            ) = model._train_step(
                model.params, model.batch_stats, model.opt_state,
                batch, y, mask, i,
            )
        float(total)
        return time.time() - t0

    run(2, 0)
    n1, n2 = 5, 20
    d1 = run(n1, 2)
    d2 = run(n2, 2 + n1)
    step_s = (d2 - d1) / (n2 - n1)
    print(json.dumps({
        "mode": mode,
        "optimizer": opt,
        "rows": vocab * 26,
        "step_ms": round(step_s * 1e3, 2),
        "examples_per_s": round(4096 / step_s, 1),
    }), flush=True)


def main():
    import os

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/xdeepfm_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    args = sys.argv[2:] or ["dense", "lazy", "lazy_split"]
    opt = "adam"
    if args and args[0] in ("adam", "adagrad"):
        opt, args = args[0], args[1:]
    for mode in args:
        bench(vocab, mode, opt)
        # at capacity shapes the previous mode's tables must be collected
        # before the next model's init allocates, or the A/B OOMs
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
