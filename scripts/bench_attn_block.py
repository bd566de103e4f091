"""Isolated timing of the fused attention-block kernel vs the round-2 path.

Times, at xDeepFMAttention bench shapes (B=4096, E=10, S=256, H=2):
  block_fwd      — fused attn_block forward
  block_fwdbwd   — fused attn_block forward + backward
  old_fwd        — small_attention kernel + XLA glue (projections, LN, pool)
  old_fwdbwd     — same, with backward

Chained slope timing with a value fetch (docs/DESIGN.md).  Inputs are
re-derived from the previous output so dispatches serialize.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, E, S, H, L = 4096, 10, 256, 2, 1


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

    from xdeepfm_tpu.ops import attn_block_pallas as abp
    from xdeepfm_tpu.ops.attention_pallas import small_attention

    rng = np.random.default_rng(0)
    dh = E // H
    f32 = lambda s, sc=0.1: jnp.asarray(rng.normal(size=s).astype(np.float32)) * sc
    x = f32((B, E, S), 1.0)
    weights = dict(
        wq=f32((L * H, E, dh)), wk=f32((L * H, E, dh)), wv=f32((L * H, E, dh)),
        wo=f32((L * H, dh, E)), gamma=jnp.ones((L, E, 1)),
        beta=jnp.zeros((L, E, 1)), w1=f32((E, E)), b1=jnp.zeros((E, 1)),
        w2=f32((E, 1)),
    )
    cfg = abp.BlockCfg(L, H, 1.0 / np.sqrt(dh), True, True, 1e-6)
    wl = list(weights.values())

    def block_fwd(x):
        p = abp.attn_block(cfg, x, *wl)                    # [B, E]
        # re-derive a full-size input so iterations chain
        return x + 1e-6 * p[:, :, None]

    def block_fwdbwd(x):
        g = jax.grad(lambda xx: jnp.sum(abp.attn_block(cfg, xx, *wl) ** 2))(x)
        return x + 1e-6 * g

    scale = 1.0 / np.sqrt(dh)

    def old_path(x):
        # round-2 composition: XLA projections -> dh-major kernel -> XLA glue
        def proj(w):
            return jnp.einsum("bes,ef->bfs", x, w.reshape(E, E)
                              if w.ndim != 2 else w)
        Wq = weights["wq"].transpose(1, 0, 2).reshape(E, E)
        Wk = weights["wk"].transpose(1, 0, 2).reshape(E, E)
        Wv = weights["wv"].transpose(1, 0, 2).reshape(E, E)
        Wo = weights["wo"].reshape(E, E)
        Q = jnp.einsum("bes,ef->bfs", x, Wq)
        K = jnp.einsum("bes,ef->bfs", x, Wk)
        V = jnp.einsum("bes,ef->bfs", x, Wv)
        perm = lambda t: t.reshape(B * H, dh, S)
        out = small_attention(perm(Q), perm(K), perm(V), float(scale))
        out = out.reshape(B, E, S)
        attn = jnp.einsum("bes,ef->bfs", out, Wo) + x
        mu = jnp.mean(attn, axis=1, keepdims=True)
        var = jnp.mean(attn * attn, axis=1, keepdims=True) - mu * mu
        y = (attn - mu) * jax.lax.rsqrt(var + 1e-6)
        y = y * weights["gamma"][0][None] + weights["beta"][0][None]
        h1 = jnp.tanh(jnp.einsum("bes,ef->bfs", y, weights["w1"])
                      + weights["b1"].T[:, :, None] * 0
                      + weights["b1"].reshape(1, E, 1))
        sc = jnp.einsum("bes,eo->bos", h1, weights["w2"])
        w = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("bos,bes->be", w, y)

    def old_fwd(x):
        return x + 1e-6 * old_path(x)[:, :, None]

    def old_fwdbwd(x):
        g = jax.grad(lambda xx: jnp.sum(old_path(xx) ** 2))(x)
        return x + 1e-6 * g

    for name, fn in (
        ("block_fwd", block_fwd), ("block_fwdbwd", block_fwdbwd),
        ("old_fwd", old_fwd), ("old_fwdbwd", old_fwdbwd),
    ):
        f = jax.jit(fn)
        v = f(x)
        v = f(v)
        float(v[0, 0, 0])

        def run(n, v):
            t0 = time.time()
            for _ in range(n):
                v = f(v)
            float(v[0, 0, 0])
            return time.time() - t0, v

        d1, v = run(4, v)
        d2, v = run(14, v)
        ms = (d2 - d1) / 10 * 1000
        print(json.dumps({"which": name, "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
