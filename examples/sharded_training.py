"""Multi-device training on a (data, embed) mesh.

Batches shard over the ``data`` axis (XLA inserts the psum gradient
reduction); stacked embedding tables row-shard over ``embed``.  The public
``fit``/``predict`` surface is unchanged — sharding the model state is one
call, and GSPMD propagates the layouts through the jitted train step.

With real multi-chip hardware this runs as-is.  Without it, use the virtual
CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/sharded_training.py
"""

import jax
import numpy as np

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.models import xDeepFM
from xdeepfm_tpu.parallel import make_mesh, shard_model_state
from xdeepfm_tpu.parallel.mesh import set_active_mesh

VOCAB = 10000


def main():
    n_dev = len(jax.devices())
    print(f"{n_dev} device(s):", jax.devices()[0].platform)

    rng = np.random.default_rng(0)
    n = 32768
    x = {f"C{i}": rng.integers(0, VOCAB, n) for i in range(26)}
    x.update(
        {f"I{i}": rng.uniform(0, 1, n).astype(np.float32) for i in range(13)}
    )
    logit = (x["C1"] % 7 < 3) * 1.5 + x["I1"] * 2 - 2
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logit))).astype(np.float32)

    cols = [
        SparseFeat(f"C{i}", VOCAB, embedding_dim=10) for i in range(26)
    ] + [DenseFeat(f"I{i}", 1) for i in range(13)]
    model = xDeepFM(
        cols, cols, cin_layer_size=(256, 128), dnn_hidden_units=(256, 256)
    )
    # row-sharded tables want the sharded-friendly optimizer defaults; for
    # >=30M-row tables add embedding_optimizer='lazy' (the moment state
    # shards with the rows — see parallel/sharded_embedding.py)
    model.compile("adam", "binary_crossentropy", metrics=["auc"])

    mesh = make_mesh(n_dev)  # (data, embed) axes over every device
    print("mesh:", dict(mesh.shape))
    try:
        with mesh:
            shard_model_state(model, mesh)  # tables P('embed', None)
            model.fit(
                x, y, batch_size=4096, epochs=2, verbose=2,
                validation_split=0.1,
            )
            pred = model.predict(x, batch_size=4096)
            # sharded-native checkpoint: each table shard writes from the
            # devices that hold it (no host gather); block=False lets
            # further steps overlap the tensorstore write
            model.save_checkpoint_sharded("/tmp/sharded_ckpt", epoch=2)
        print("predictions:", pred[:5].ravel())
    finally:
        set_active_mesh(None)


if __name__ == "__main__":
    main()
