"""FULL-MODEL forward parity: copy every weight of the torch reference
xDeepFM into our model and require identical predictions."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")


def test_xdeepfm_forward_parity(rng):
    from deepctr.inputs import DenseFeat as TDense, SparseFeat as TSparse
    from deepctr.models.xdeepfm import xDeepFM as TorchXDeepFM

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import xDeepFM

    n_sparse, n_dense, vocab, emb = 5, 3, 12, 4
    B = 16
    cin_size = (8, 6)
    dnn_units = (10, 8)

    t_cols = [
        TSparse(f"C{i}", vocabulary_size=vocab, embedding_dim=emb)
        for i in range(n_sparse)
    ] + [TDense(f"I{i}", 1) for i in range(n_dense)]
    t_model = TorchXDeepFM(
        t_cols, t_cols, dnn_hidden_units=dnn_units, cin_layer_size=cin_size,
        dnn_dropout=0, device="cpu",
    )
    t_model.eval()

    j_cols = [
        SparseFeat(f"C{i}", vocab, embedding_dim=emb) for i in range(n_sparse)
    ] + [DenseFeat(f"I{i}", 1) for i in range(n_dense)]
    j_model = xDeepFM(
        j_cols, j_cols, dnn_hidden_units=dnn_units, cin_layer_size=cin_size
    )
    j_model.compile("adam", "binary_crossentropy", metrics=[])

    # ---- copy weights torch -> jax ----------------------------------------
    def tnp(t):
        return t.detach().numpy()

    import flax

    p = flax.core.unfreeze(j_model.params)

    # dnn embedding tables: stacked [n_sparse*vocab, emb] in feature order
    stacked = np.concatenate(
        [tnp(t_model.embedding_dict[f"C{i}"].weight) for i in range(n_sparse)]
    )
    p["embedding_dict"]["table_d4"] = jnp.asarray(stacked)
    # linear 1-dim tables + dense weight
    lin_stacked = np.concatenate(
        [
            tnp(t_model.linear_model.embedding_dict[f"C{i}"].weight)
            for i in range(n_sparse)
        ]
    )
    p["linear_model"]["embedding_dict"]["table_d1"] = jnp.asarray(lin_stacked)
    p["linear_model"]["weight"] = jnp.asarray(tnp(t_model.linear_model.weight))
    # CIN conv kernels
    for i in range(len(cin_size)):
        p["cin"][f"conv_w_{i}"] = jnp.asarray(
            tnp(t_model.cin.conv1ds[i].weight)[:, :, 0]
        )
        p["cin"][f"conv_b_{i}"] = jnp.asarray(tnp(t_model.cin.conv1ds[i].bias))
    p["cin_linear"]["kernel"] = jnp.asarray(tnp(t_model.cin_linear.weight).T)
    # DNN
    for i in range(len(dnn_units)):
        p["dnn"][f"linear_{i}"]["kernel"] = jnp.asarray(
            tnp(t_model.dnn.linears[i].weight).T
        )
        p["dnn"][f"linear_{i}"]["bias"] = jnp.asarray(
            tnp(t_model.dnn.linears[i].bias)
        )
    p["dnn_linear"]["kernel"] = jnp.asarray(tnp(t_model.dnn_linear.weight).T)
    p["out"]["global_bias"] = jnp.asarray(tnp(t_model.out.bias))
    j_model.params = p

    # ---- identical inputs --------------------------------------------------
    ids = rng.integers(0, vocab, size=(B, n_sparse)).astype(np.float32)
    dense = rng.uniform(0, 1, size=(B, n_dense)).astype(np.float32)
    X = np.concatenate([ids, dense], axis=1)  # reference layout: C then I
    with torch.no_grad():
        t_pred = t_model(torch.from_numpy(X)).numpy()

    x = {f"C{i}": ids[:, i].astype(np.int64) for i in range(n_sparse)}
    x.update({f"I{i}": dense[:, i] for i in range(n_dense)})
    j_pred = j_model.predict(x, batch_size=B)

    np.testing.assert_allclose(j_pred, t_pred, rtol=1e-4, atol=1e-5)
