"""Production-scale embedding tables on one chip.

Demonstrates the lazy row-sparse optimizer with the lookup-boundary
gradient split and the packed param|state layout (docs/DESIGN.md "The
packed param|state layout"): only rows touched by each batch are read or
written, as ONE gather + ONE scatter per table per step, so table size
stops mattering to step time — one 16 GiB v5e chip trains 104M-row tables
(BASELINE.md: adagrad 31.7 ms/step; with bf16 moments even Adam fits).

Run small by default; pass a vocab-per-field to scale up:

    python examples/large_tables.py            # 26 x 40k rows (toy)
    python examples/large_tables.py 4000000    # 26 x 4M = 104M rows
"""

import sys

import numpy as np

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.models import xDeepFM

VOCAB = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
BATCH, EPOCH_BATCHES = 4096, 8

cols = [
    SparseFeat(f"C{i}", VOCAB, embedding_dim=10) for i in range(26)
] + [DenseFeat(f"I{i}", 1) for i in range(13)]
model = xDeepFM(cols, cols, dnn_hidden_units=(256, 256),
                cin_layer_size=(256, 128), seed=1024)
model.compile(
    "adam",
    "binary_crossentropy",
    metrics=["auc"],
    embedding_optimizer="lazy",        # touched-row updates only
    embedding_gradient="split",        # no full-table cotangent, ever
    # embedding_layout="auto" (default) -> packed [rows, (1+k)*dim]
    # param|state tables: one gather + one scatter per step.
    # At the capacity edge, halve the moment bytes (math stays fp32):
    embedding_state_dtype="bfloat16" if VOCAB >= 2_500_000 else "float32",
)

rng = np.random.default_rng(0)
n = BATCH * EPOCH_BATCHES
x = {f"C{i}": rng.integers(0, VOCAB, n) for i in range(26)}
x.update({f"I{i}": rng.uniform(0, 1, n).astype(np.float32)
          for i in range(13)})
y = (rng.uniform(size=n) < 0.25).astype(np.float32)

model.fit(x, y, batch_size=BATCH, epochs=2, verbose=1, shuffle=False)

# checkpoints are always written in the canonical flat format, whatever
# the live layout — they reload into any embedding_layout setting
model.save_checkpoint("/tmp/large_tables_ckpt.bin", epoch=2)
print("predictions:", model.predict(
    {k: v[:BATCH] for k, v in x.items()}, BATCH
).shape)
