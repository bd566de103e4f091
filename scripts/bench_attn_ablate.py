"""Attention-kernel cost attribution: dots-only vs softmax-only variants.

Times three forward kernels at the CIN-attention shapes to attribute the
per-pair cost between the MXU contractions (score dot + output dot) and the
VPU softmax passes (max reduce, exp, sum reduce, normalize).  The variants
change ONLY the in-kernel math (same operands, same grid, same layouts), so
differences are pure compute attribution — HBM traffic is identical.

Usage: python scripts/bench_attn_ablate.py [G S dh]
"""

import functools
import json
import math
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/xdeepfm_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from xdeepfm_tpu.ops.attention_pallas import _pick_bt

    # The production kernel dropped the exp2 softmax (and its _LOG2E
    # constant); keep the ablation's exp2 form self-contained here.
    _LOG2E = math.log2(math.e)

    scale = 1.0 / np.sqrt(DH)
    Bt = _pick_bt(G, S)

    def full_kernel(q_ref, k_ref, v_ref, o_ref):
        c = scale * _LOG2E
        for b in range(Bt):
            q = q_ref[b]
            s = jax.lax.dot_general(
                q, k_ref[b], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2(s * c - m * c)
            z = jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                v_ref[b], e, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[b] = o * (1.0 / z).reshape(1, -1)

    def dots_kernel(q_ref, k_ref, v_ref, o_ref):
        # MXU only: score dot + output dot, softmax replaced by identity
        for b in range(Bt):
            q = q_ref[b]
            s = jax.lax.dot_general(
                q, k_ref[b], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(
                v_ref[b], s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[b] = o

    def soft_kernel(q_ref, k_ref, v_ref, o_ref):
        # VPU only: softmax passes over a fabricated [S, S] block (outer
        # broadcast instead of the dot), then a cheap [dh, S] reduce-out
        c = scale * _LOG2E
        for b in range(Bt):
            q = q_ref[b]
            s = q[:1].reshape(-1, 1) * k_ref[b][:1].reshape(1, -1)  # [S, S]
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2(s * c - m * c)
            z = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.broadcast_to(
                (1.0 / z).reshape(1, -1), (v_ref[b].shape[0], S)
            ) * jnp.sum(e, axis=0).reshape(1, -1)
            o_ref[b] = o

    sd = pl.BlockSpec((Bt, DH, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)

    def build(kernel):
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, DH, S), jnp.float32),
            grid=(G // Bt,),
            in_specs=[sd, sd, sd],
            out_specs=sd,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        return jax.jit(lambda q, k, v: call(q, k, v))

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(G, DH, S)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(G, DH, S)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(G, DH, S)).astype(np.float32))

    def slope(fn):
        def run(n, a):
            t0 = time.time()
            for _ in range(n):
                a = fn(a, k, v)
            a = a + 1e-6 * jnp.sum(a)
            np.asarray(jnp.sum(a))
            return time.time() - t0, a

        a = q
        _, a = run(2, a)
        d1, a = run(6, a)
        d2, a = run(18, a)
        return (d2 - d1) / 12.0

    out = {"shape": f"G{G} S{S} dh{DH}", "Bt": Bt}
    for name, kern in (
        ("full", full_kernel), ("dots_only", dots_kernel),
        ("softmax_only", soft_kernel),
    ):
        out[f"{name}_fwd_ms"] = round(slope(build(kern)) * 1e3, 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
