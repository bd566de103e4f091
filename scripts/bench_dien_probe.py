"""DIEN step-cost breakdown: where do the 9.4 ms go?

Times fwd+bwd+adam of three slices of the DIEN graph in isolation, each
threaded through optimizer updates so dispatches chain (see docs/DESIGN.md
"Benchmarking through the device tunnel"):

  lookups   — varlen hist/neg + query/user gathers and their backward
              scatters (the fused occurrence-block path)
  recurrence— InterestExtractor GRU + aux net + InterestEvolving
              attention+AUGRU on precomputed random [B, T, H] inputs
  full      — the whole train step (reference number)

Usage: python scripts/bench_dien_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, MAXLEN, IVOCAB, EMB = 4096, 50, 10000, 10


def main():
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/xdeepfm_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from xdeepfm_tpu import models as M
    from xdeepfm_tpu.features import DenseFeat, SparseFeat, VarLenSparseFeat

    rng = np.random.default_rng(0)
    cols = [
        SparseFeat("user", IVOCAB, embedding_dim=EMB),
        SparseFeat("item", IVOCAB, embedding_dim=EMB),
        DenseFeat("score", 1),
        VarLenSparseFeat(
            SparseFeat("hist_item", IVOCAB, embedding_dim=EMB,
                       embedding_name="item"),
            maxlen=MAXLEN, length_name="seq_length",
        ),
        VarLenSparseFeat(
            SparseFeat("neg_hist_item", IVOCAB, embedding_dim=EMB,
                       embedding_name="item"),
            maxlen=MAXLEN, length_name="seq_length",
        ),
    ]
    model = M.DIEN(cols, ["item"], gru_type="AUGRU", use_negsampling=True)
    model.compile("adam", "binary_crossentropy", metrics=[])

    lengths = rng.integers(1, MAXLEN + 1, BATCH)
    mask = np.arange(MAXLEN)[None, :] < lengths[:, None]
    x = {
        "user": rng.integers(0, IVOCAB, BATCH).astype(np.int64),
        "item": rng.integers(0, IVOCAB, BATCH).astype(np.int64),
        "score": rng.uniform(0, 1, BATCH).astype(np.float32),
        "hist_item": (rng.integers(1, IVOCAB, (BATCH, MAXLEN)) * mask
                      ).astype(np.int64),
        "neg_hist_item": (rng.integers(1, IVOCAB, (BATCH, MAXLEN)) * mask
                          ).astype(np.int64),
        "seq_length": lengths.astype(np.int64),
    }
    batch = {k: jnp.asarray(v) for k, v in model.schema.pack(x).items()}
    y = jnp.asarray(rng.integers(0, 2, (BATCH, 1)).astype(np.float32))
    msk = jnp.ones((BATCH,), jnp.float32)

    params = model.params
    tx = optax.adam(1e-3)

    def timed_loop(step_fn, p0):
        opt = tx.init(p0)

        def go(n, p, opt):
            t0 = time.time()
            for _ in range(n):
                p, opt, val = step_fn(p, opt)
            float(val)
            return time.time() - t0, p, opt

        _, p, opt = go(2, p0, opt)
        d1, p, opt = go(5, p, opt)
        d2, p, opt = go(20, p, opt)
        return (d2 - d1) / 15.0

    def make_step(loss_fn):
        @jax.jit
        def step(p, opt):
            val, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt = tx.update(grads, opt)
            p = optax.apply_updates(p, updates)
            return p, opt, val

        return step

    module = model.module

    # ---- slice 1: lookups (gather fwd + scatter bwd) -----------------------
    def lookups_method(m, b):
        hist = m.embedding_dict.lookup_varlen_seq(b, m._history_cols[0])
        neg = m.embedding_dict.lookup_varlen_seq(b, m._neg_history_cols[0])
        q = jnp.concatenate(
            [m.embedding_dict.lookup_sparse(b, f) for f in m._sparse_cols],
            axis=-1,
        )
        return jnp.sum(hist) + jnp.sum(neg) + jnp.sum(q)

    def lookups_loss(p):
        return module.apply({"params": p}, batch, method=lookups_method)

    t_lookups = timed_loop(make_step(lookups_loss), params)

    # ---- slice 2: recurrence + attention + aux net on random inputs --------
    keys_np = rng.normal(size=(BATCH, MAXLEN, EMB)).astype(np.float32)
    negs_np = rng.normal(size=(BATCH, MAXLEN, EMB)).astype(np.float32)
    qe_np = rng.normal(size=(BATCH, EMB)).astype(np.float32)
    keys = jnp.asarray(keys_np)
    negs = jnp.asarray(negs_np)
    qe = jnp.asarray(qe_np)
    klen = batch["len_seq_length"]

    def recur_method(m, keys, negs, qe):
        # round 3: the DIEN interior runs in transposed [T, H, B] lane space
        keys_t = jnp.transpose(keys, (1, 2, 0))
        negs_t = jnp.transpose(negs, (1, 2, 0))
        interest_t, aux = m.interest_extractor(
            keys_t, klen, negs_t, training=True
        )
        hist = m.interest_evolution(qe, interest_t, klen, training=True)
        return jnp.sum(hist) + aux

    def recur_loss(p):
        return module.apply(
            {"params": p}, keys, negs, qe, method=recur_method
        )

    t_recur = timed_loop(make_step(recur_loss), params)

    print(json.dumps({
        "lookups_ms": round(t_lookups * 1e3, 2),
        "recurrence_ms": round(t_recur * 1e3, 2),
        "note": "full step bench_zoo DIEN for the total",
    }), flush=True)


if __name__ == "__main__":
    main()
