"""Floor arithmetic for the packed lazy-split step (docs/DESIGN.md).

Measures, in one process at the 104M-row capacity shape:
  1. the isolated gather+scatter walk PAIR on the packed [104M, 20] table
     over the batch's ~106k sorted per-occurrence ids (the step's two
     serialized row walks), and
  2. the full packed adagrad train step,
so step - pair = compute/sort/overlap remainder.  Usage:
  python scripts/bench_packed_probe.py [vocab_per_field]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    R, W, N = vocab * 26, 20, 26 * 4096
    rng = np.random.default_rng(0)

    tab = jax.jit(lambda: jnp.zeros((R, W), jnp.float32))()
    ids = jnp.asarray(np.sort(rng.integers(0, R, N)).astype(np.int32))
    v = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))

    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def walk_pair(t, vv):
        rows = t.at[ids].get(mode="clip", indices_are_sorted=True)
        out = rows + vv
        t = t.at[ids].set(out, unique_indices=True, mode="drop",
                          indices_are_sorted=True)
        return t, out.sum()

    def run(n):
        nonlocal tab, v
        t0 = time.time()
        s = None
        for _ in range(n):
            tab, s = walk_pair(tab, v)
            v = v + s * 1e-12
        float(s)
        return time.time() - t0

    tab, s = walk_pair(tab, v)
    float(s)
    run(4)  # warm the dispatch pipeline fully
    reps = []
    for _ in range(3):
        d1 = run(5)
        d2 = run(20)
        reps.append((d2 - d1) / 15 * 1e3)
    pair_ms = float(np.median(reps))
    print(json.dumps({
        "probe": "gather+scatter pair",
        "rows": R, "ids": N, "ms": round(pair_ms, 2),
        "ns_per_row_per_walk": round(pair_ms * 1e6 / N / 2, 1),
    }), flush=True)
    del tab, v
    import gc

    gc.collect()


if __name__ == "__main__":
    main()
