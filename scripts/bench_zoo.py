"""Model-zoo train-step throughput sweep on the default device.

Canonical Criteo shapes (26 sparse vocab-10k emb-10, 13 dense, batch 4096,
adam + sum-BCE + L2) for every single-task zoo model at its reference default
tower sizes.  Slope timing with a value fetch (see docs/DESIGN.md
"Benchmarking through the device tunnel").

Usage: python scripts/bench_zoo.py [name ...]   (default: all)
Prints one JSON line per model: {"model", "step_ms", "examples_per_s"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 4096))
N_SPARSE, N_DENSE, VOCAB, EMB = 26, 13, 10000, 10


def builders():
    from xdeepfm_tpu import models as M
    from xdeepfm_tpu.features import SparseFeat

    def sp(c):
        return [f for f in c if isinstance(f, SparseFeat)]

    return {
        # reference-default tower sizes (each model's constructor defaults)
        "xDeepFM": lambda c: M.xDeepFM(c, c),
        "xDeepFMAttention": lambda c: M.xDeepFMAttention(c, c, cin_num_heads=2),
        "xDeepFMAttentionV2": lambda c: M.xDeepFMAttentionV2(
            c, c, cin_num_heads=4, cin_num_attn_layers=2
        ),
        "DeepFM": lambda c: M.DeepFM(c, c),
        "WDL": lambda c: M.WDL(c, c),
        "NFM": lambda c: M.NFM(c, c),
        "AFM": lambda c: M.AFM(c, sp(c), use_attention=True),
        "AFN": lambda c: M.AFN(c, c),
        "AutoInt": lambda c: M.AutoInt(c, c),
        "DCN": lambda c: M.DCN(c, c),
        "DCNMix": lambda c: M.DCNMix(c, c),
        "FiBiNET": lambda c: M.FiBiNET(c, c),
        "IFM": lambda c: M.IFM(c, c),
        "DIFM": lambda c: M.DIFM(c, c, att_head_num=2),
        "PNN": lambda c: M.PNN(c),
        "CCPM": lambda c: M.CCPM(c, sp(c)),
        "MLR": lambda c: M.MLR(c),
        "ONN": lambda c: M.ONN(c, c),
        "xDeepFMPro": lambda c: _pro().xDeepFMPro(c, c),
        # decoder-off control: (full - nosfg) isolates the SFG decoder+CE cost
        "xDeepFMPro_nosfg": lambda c: _pro().xDeepFMPro(c, c, use_sfg=False),
        "xDeepFMPro_autodis": lambda c: _pro().xDeepFMPro(
            c, c, use_autodis=True
        ),
        "xDeepFMProLight": lambda c: _pro().xDeepFMProLight(c, c),
    }


def _pro():
    from xdeepfm_tpu import pro

    return pro


def special_models():
    """Models needing non-Criteo inputs: behavior-sequence (DIN/DIEN at
    Amazon-like shapes: item vocab 10k, maxlen 50 history) and the multitask
    family (two binary labels on Criteo shapes).  Returns
    {name: (build_cols, build_model, build_xy, losses)}."""
    from xdeepfm_tpu import models as M
    from xdeepfm_tpu.features import DenseFeat, SparseFeat, VarLenSparseFeat

    MAXLEN, IVOCAB = 50, VOCAB

    def seq_cols(with_neg):
        cols = [
            SparseFeat("user", IVOCAB, embedding_dim=EMB),
            SparseFeat("item", IVOCAB, embedding_dim=EMB),
            DenseFeat("score", 1),
            VarLenSparseFeat(
                SparseFeat("hist_item", IVOCAB, embedding_dim=EMB,
                           embedding_name="item"),
                maxlen=MAXLEN, length_name="seq_length",
            ),
        ]
        if with_neg:
            cols.append(VarLenSparseFeat(
                SparseFeat("neg_hist_item", IVOCAB, embedding_dim=EMB,
                           embedding_name="item"),
                maxlen=MAXLEN, length_name="seq_length",
            ))
        return cols

    def seq_xy(rng, with_neg):
        x = {
            "user": rng.integers(0, IVOCAB, BATCH).astype(np.int64),
            "item": rng.integers(0, IVOCAB, BATCH).astype(np.int64),
            "score": rng.uniform(0, 1, BATCH).astype(np.float32),
        }
        lengths = rng.integers(1, MAXLEN + 1, BATCH)
        mask = np.arange(MAXLEN)[None, :] < lengths[:, None]
        x["hist_item"] = (
            rng.integers(1, IVOCAB, (BATCH, MAXLEN)) * mask).astype(np.int64)
        x["seq_length"] = lengths.astype(np.int64)
        if with_neg:
            x["neg_hist_item"] = (
                rng.integers(1, IVOCAB, (BATCH, MAXLEN)) * mask
            ).astype(np.int64)
        y = rng.integers(0, 2, (BATCH, 1)).astype(np.float32)
        return x, y

    def criteo_cols():
        return [
            SparseFeat(f"C{i}", VOCAB, embedding_dim=EMB)
            for i in range(N_SPARSE)
        ] + [DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]

    def criteo_xy2(rng, model):
        x = {f.name: rng.integers(0, VOCAB, BATCH).astype(np.int64)
             for f in model.schema.sparse}
        x.update({f.name: rng.uniform(0, 1, BATCH).astype(np.float32)
                  for f in model.schema.dense})
        y = rng.integers(0, 2, (BATCH, 2)).astype(np.float32)
        return x, y

    bce2 = ["binary_crossentropy", "binary_crossentropy"]
    return {
        "DIN": (
            lambda: seq_cols(False),
            lambda c: M.DIN(c, ["item"]),
            lambda rng, m: seq_xy(rng, False),
            "binary_crossentropy",
        ),
        "DIEN": (
            lambda: seq_cols(True),
            lambda c: M.DIEN(c, ["item"], gru_type="AUGRU",
                             use_negsampling=True),
            lambda rng, m: seq_xy(rng, True),
            "binary_crossentropy",
        ),
        "SharedBottom": (criteo_cols, lambda c: M.SharedBottom(c),
                         criteo_xy2, bce2),
        "ESMM": (criteo_cols, lambda c: M.ESMM(c), criteo_xy2, bce2),
        "MMOE": (criteo_cols, lambda c: M.MMOE(c), criteo_xy2, bce2),
        "PLE": (criteo_cols, lambda c: M.PLE(c), criteo_xy2, bce2),
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

    all_b = builders()
    special = special_models()
    run_names = names or (sorted(all_b) + sorted(special))
    rng = np.random.default_rng(0)
    for name in run_names:
        try:
            if name in special:
                build_cols, build_model, build_xy, losses = special[name]
                model = build_model(build_cols())
                model.compile("adam", losses, metrics=[])
                x, y_np = build_xy(rng, model)
            else:
                # ONN builds O(F^2) pair tables (canonical vocab by default;
                # override with BENCH_ONN_VOCAB for capacity-limited runs)
                vocab = (
                    int(os.environ.get("BENCH_ONN_VOCAB", VOCAB))
                    if name == "ONN"
                    else VOCAB
                )
                cols = [
                    SparseFeat(f"C{i}", vocab, embedding_dim=EMB)
                    for i in range(N_SPARSE)
                ] + [DenseFeat(f"I{i}", 1) for i in range(N_DENSE)]
                model = all_b[name](cols)
                model.compile("adam", "binary_crossentropy", metrics=[])
                x = {
                    f.name: rng.integers(0, vocab, BATCH).astype(np.int64)
                    for f in model.schema.sparse
                }
                x.update({
                    f.name: rng.uniform(0, 1, BATCH).astype(np.float32)
                    for f in model.schema.dense
                })
                y_np = rng.integers(0, 2, (BATCH, 1)).astype(np.float32)
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
                "model": name,
                "step_ms": round(step * 1e3, 2),
                "examples_per_s": round(BATCH / step, 0),
            }), flush=True)
        except Exception as e:  # keep sweeping
            print(json.dumps({"model": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or None)
