"""CIN-attention kernel microbench (ops/attention_pallas.small_attention).

Times fwd and fwd+bwd (dh-major [G, dh, S] operands) at the xDeepFMAttention shapes: G = batch*heads pairs,
S = CIN feature maps + fields (~266), dh = emb/heads (~5).  Slope timing with
chained dispatches (output feeds back as q) and a value fetch — see
docs/DESIGN.md "Benchmarking through the device tunnel".

Usage: python scripts/bench_attn_kernel.py [G S dh]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
S = int(sys.argv[2]) if len(sys.argv) > 2 else 266
DH = int(sys.argv[3]) if len(sys.argv) > 3 else 5


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

    from xdeepfm_tpu.ops import attention_pallas
    from xdeepfm_tpu.ops.attention_pallas import small_attention

    prec = os.environ.get("BENCH_ATTN_PREC", "fp32")
    attention_pallas.set_precision(prec)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(G, DH, S)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(G, DH, S)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(G, DH, S)).astype(np.float32))
    scale = 1.0 / np.sqrt(DH)

    fwd = jax.jit(lambda q: small_attention(q, k, v, scale))

    def fwd_bwd_fn(q):
        out, vjp = jax.vjp(lambda a: small_attention(a, k, v, scale), q)
        (dq,) = vjp(out)
        return dq

    fwd_bwd = jax.jit(fwd_bwd_fn)

    def slope(fn):
        def run(n, a):
            t0 = time.time()
            for _ in range(n):
                a = fn(a)
            a = a + 1e-6 * jnp.sum(a)  # material change; defeat content cache
            np.asarray(jnp.sum(a))  # value fetch = real completion barrier
            return time.time() - t0, a

        a = q
        _, a = run(2, a)
        d1, a = run(6, a)
        d2, a = run(18, a)
        return (d2 - d1) / 12.0

    t_f = slope(fwd)
    t_fb = slope(fwd_bwd)
    print(json.dumps({
        "shape": f"G{G} S{S} dh{DH}",
        "precision": prec,
        "fwd_ms": round(t_f * 1e3, 3),
        "fwd_bwd_ms": round(t_fb * 1e3, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
