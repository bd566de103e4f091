"""Generate a structured synthetic Criteo-format corpus (tab-separated data
rows, comma header — the reference's mixed-separator case,
``xdftrain.py:142-152``).

The label follows a logistic model over a handful of categorical effects, one
pairwise interaction, and two dense effects, so a CTR model can realistically
reach AUC ~0.75 — enough signal for A/B quality comparisons between training
configurations (see BASELINE.md round-1 protocol).

Usage: python scripts/make_synth_criteo.py OUT.txt [rows] [vocab] [seed]
"""

import sys

import numpy as np


def generate(path, rows=60_000, vocab=200, seed=2025):
    rng = np.random.default_rng(seed)
    cats = rng.integers(0, vocab, size=(rows, 26))
    dense = rng.uniform(0, 1, size=(rows, 13)).astype(np.float32)

    # per-category latent effects for a few influential fields
    w1 = rng.normal(0, 1.2, vocab)[cats[:, 0]]
    w2 = rng.normal(0, 0.9, vocab)[cats[:, 3]]
    w3 = rng.normal(0, 0.7, vocab)[cats[:, 7]]
    # pairwise interaction between fields 1 and 2 (hash-mixed)
    wx = rng.normal(0, 0.8, vocab)[(cats[:, 1] * 31 + cats[:, 2]) % vocab]
    logits = (
        w1 + w2 + w3 + wx + 1.5 * dense[:, 0] - 1.2 * dense[:, 4] - 0.6
    )
    y = (rng.uniform(size=rows) < 1 / (1 + np.exp(-logits))).astype(int)

    cols = (
        ["label"]
        + [f"I{i}" for i in range(1, 14)]
        + [f"C{i}" for i in range(1, 27)]
    )
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in range(rows):
            de = [f"{v:.4f}" for v in dense[r]]
            sp = [f"c{v:x}" for v in cats[r]]
            f.write("\t".join([str(y[r])] + de + sp) + "\n")
    print(f"wrote {rows} rows to {path} (positive ratio {y.mean():.3f})")


if __name__ == "__main__":
    generate(
        sys.argv[1],
        *(int(a) for a in sys.argv[2:]),
    )
