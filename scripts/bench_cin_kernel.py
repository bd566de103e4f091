"""CIN-kernel speed-of-light check: GFLOP/s and HBM-bandwidth utilization.

Times the fused Pallas CIN contraction (ops/cin_pallas.py) alone, per layer of
the canonical xDeepFM config (BASELINE.json north star: CIN-layer FLOP
utilization).  The contraction at D=10 is memory-layout-bound, not MXU-bound
(bf16 compute measured neutral), so the speed-of-light frame is HBM bytes
moved, reported alongside raw FLOP/s.

Usage: python scripts/bench_cin_kernel.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, D = 4096, 10
LAYERS = [  # (H_in, M, O) per canonical CIN (256,128) split-half stack
    (26, 26, 256),
    (128, 26, 128),
]


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

    from xdeepfm_tpu.ops.cin_pallas import cin_pallas_rows

    N = BATCH * D
    rng = np.random.default_rng(0)
    for H, M, O in LAYERS:
        h = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
        x0 = jnp.asarray(rng.normal(size=(N, M)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(O, H * M)).astype(np.float32) * 0.01)
        b = jnp.zeros((O,), jnp.float32)

        fwd = jax.jit(lambda h, x0: cin_pallas_rows(h, x0, W, b))

        def fwd_bwd_fn(h, x0):
            out, vjp = jax.vjp(lambda a, c: cin_pallas_rows(a, c, W, b), h, x0)
            da, dc = vjp(out)
            return da + 1e-30 * jnp.sum(dc)

        fwd_bwd = jax.jit(fwd_bwd_fn)

        def slope(fn, arg):
            def run(n, a):
                t0 = time.time()
                for _ in range(n):
                    a = fn(a, x0)
                jax.block_until_ready(a)
                return time.time() - t0, a

            a = arg
            _, a = run(2, a)
            d1, a = run(10, a)
            d2, a = run(40, a)
            return (d2 - d1) / 30.0

        # chain by feeding a same-shaped output back in; layer outputs are
        # [N, O] so only time chains where O == H (else re-project)
        proj = jnp.asarray(rng.normal(size=(O, H)).astype(np.float32) * 0.1)
        t_fwd = slope(lambda a, c: jnp.dot(fwd(a, c), proj), h)
        t_bwd = slope(lambda a, c: jnp.dot(fwd_bwd(a, c), jnp.eye(H, H)), h)

        flops_fwd = 2 * N * H * M * O
        # HBM bytes (fp32): read h + x0 + W, write out [N, O]
        bytes_fwd = 4 * (N * H + N * M + O * H * M + N * O)
        print(json.dumps({
            "layer": f"H{H}xM{M}->O{O}",
            "fwd_ms": round(t_fwd * 1e3, 3),
            "fwd_tflops": round(flops_fwd / t_fwd / 1e12, 2),
            "fwd_hbm_gbps": round(bytes_fwd / t_fwd / 1e9, 1),
            "fwd_bwd_ms": round(t_bwd * 1e3, 3),
            "fwd_bwd_tflops": round(3 * flops_fwd / t_bwd / 1e12, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
