"""Flash-CE kernel microbench (ops/ce_pallas.fused_ce_rows) vs the XLA
materialized-logits path, at SFG decoder head shapes: 26 heads of
[B=4096, K=64] @ [64, vocab=10k] with per-row cross-entropy.

Slope timing with chained dispatches (the per-row loss feeds back into h) and
a value fetch — see docs/DESIGN.md "Benchmarking through the device tunnel".

Usage: python scripts/bench_ce_kernel.py [B K V HEADS]
Env: BENCH_CE_BT / BENCH_CE_VB tile overrides, BENCH_CE_PREC fp32|bf16.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
V = int(sys.argv[3]) if len(sys.argv) > 3 else 10000
HEADS = int(sys.argv[4]) if len(sys.argv) > 4 else 26


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/xdeepfm_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from xdeepfm_tpu.ops import ce_pallas

    prec = os.environ.get("BENCH_CE_PREC", "bf16")
    ce_pallas.set_precision(prec)
    bt = int(os.environ.get("BENCH_CE_BT", 512))
    vb = int(os.environ.get("BENCH_CE_VB", 512))
    ce_pallas.set_block_sizes(bt, vb)

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    Ws = [jnp.asarray(rng.normal(size=(K, V)).astype(np.float32) * 0.1)
          for _ in range(HEADS)]
    bs = [jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.1)
          for _ in range(HEADS)]
    ts = [jnp.asarray(rng.integers(0, V, size=(B,)).astype(np.int32))
          for _ in range(HEADS)]

    def heads_pallas(h):
        tot = jnp.zeros((B,))
        for W, b, t in zip(Ws, bs, ts):
            tot = tot + ce_pallas.fused_ce_rows(h, W, b, t)
        return tot

    Wstk = jnp.stack(Ws)
    bstk = jnp.stack(bs)
    tstk = jnp.stack(ts)

    def heads_stacked(h):
        return jnp.sum(
            ce_pallas.fused_ce_rows_stacked(h, Wstk, bstk, tstk), axis=0
        )

    def heads_xla(h):
        tot = jnp.zeros((B,))
        for W, b, t in zip(Ws, bs, ts):
            logits = h @ W + b
            tot = tot + (
                jax.nn.logsumexp(logits, axis=-1)
                - jnp.take_along_axis(logits, t[:, None], axis=-1)[:, 0]
            )
        return tot

    def bench(name, heads_fn):
        fwd = jax.jit(lambda h: h + 1e-6 * heads_fn(h)[:, None])

        def fwd_bwd_fn(h):
            g = jax.grad(lambda a: jnp.sum(heads_fn(a)))(h)
            return h + 1e-6 * g

        fwd_bwd = jax.jit(fwd_bwd_fn)

        def slope(fn):
            def run(n, a):
                t0 = time.time()
                for _ in range(n):
                    a = fn(a)
                np.asarray(jnp.sum(a))  # value fetch = completion barrier
                return time.time() - t0, a

            a = h0
            _, a = run(2, a)
            d1, a = run(4, a)
            d2, a = run(12, a)
            return (d2 - d1) / 8.0

        t_f = slope(fwd)
        t_fb = slope(fwd_bwd)
        print(json.dumps({
            "path": name,
            "shape": f"B{B} K{K} V{V} x{HEADS}",
            "precision": prec, "bt": bt, "vb": vb,
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd_bwd_ms": round(t_fb * 1e3, 3),
        }), flush=True)

    which = os.environ.get("BENCH_CE_PATH", "both")
    if which in ("both", "pallas", "stacked"):
        bench("pallas_stacked", heads_stacked)
    if which in ("both", "pallas"):
        bench("pallas", heads_pallas)
    if which in ("both", "xla"):
        bench("xla", heads_xla)


if __name__ == "__main__":
    main()
