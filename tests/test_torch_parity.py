"""Golden parity vs the ACTUAL torch reference layers: identical weights in,
outputs must match to float tolerance.  (The reference is imported read-only
from /root/reference to generate oracles — none of its code ships here.)"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    import deepctr.layers.interaction as ref_inter

    return ref_inter


def _np(t):
    return t.detach().numpy()


def test_cin_parity(ref, rng):
    B, m, D = 6, 7, 5
    layer_size = (8, 6)
    x = rng.normal(size=(B, m, D)).astype(np.float32)

    t_cin = ref.CIN(field_size=m, layer_size=layer_size, split_half=True)
    t_out = t_cin(torch.from_numpy(x))

    from xdeepfm_tpu.nn.interaction import CIN

    j_cin = CIN(field_size=m, layer_size=layer_size, split_half=True)
    params = j_cin.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = dict(params)
    for i in range(len(layer_size)):
        params[f"conv_w_{i}"] = jnp.asarray(
            _np(t_cin.conv1ds[i].weight)[:, :, 0]
        )
        params[f"conv_b_{i}"] = jnp.asarray(_np(t_cin.conv1ds[i].bias))
    j_out = j_cin.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-4, atol=1e-5)


def test_interacting_layer_parity(ref, rng):
    B, F, E = 4, 5, 8
    x = rng.normal(size=(B, F, E)).astype(np.float32)
    t_layer = ref.InteractingLayer(embedding_size=E, head_num=2, use_res=True)
    t_out = t_layer(torch.from_numpy(x))

    from xdeepfm_tpu.nn.interaction import InteractingLayer

    j_layer = InteractingLayer(embedding_size=E, head_num=2, use_res=True)
    params = {
        "W_Query": jnp.asarray(_np(t_layer.W_Query)),
        "W_Key": jnp.asarray(_np(t_layer.W_key)),
        "W_Value": jnp.asarray(_np(t_layer.W_Value)),
        "W_Res": jnp.asarray(_np(t_layer.W_Res)),
    }
    j_out = j_layer.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("param", ["vector", "matrix"])
def test_crossnet_parity(ref, rng, param):
    B, d = 4, 6
    x = rng.normal(size=(B, d)).astype(np.float32)
    t_layer = ref.CrossNet(in_features=d, layer_num=2, parameterization=param)
    t_out = t_layer(torch.from_numpy(x))

    from xdeepfm_tpu.nn.interaction import CrossNet

    j_layer = CrossNet(in_features=d, layer_num=2, parameterization=param)
    params = {
        "kernels": jnp.asarray(_np(t_layer.kernels)),
        "bias": jnp.asarray(_np(t_layer.bias)),
    }
    j_out = j_layer.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-4, atol=1e-5)


def test_afm_layer_parity(ref, rng):
    B, F, E = 4, 5, 6
    x = rng.normal(size=(B, F, E)).astype(np.float32)
    t_layer = ref.AFMLayer(in_features=E, attention_factor=4, dropout_rate=0)
    t_layer.eval()
    # reference takes a list of [B, 1, E]
    t_out = t_layer([torch.from_numpy(x[:, i : i + 1]) for i in range(F)])

    from xdeepfm_tpu.nn.interaction import AFMLayer

    j_layer = AFMLayer(in_features=E, attention_factor=4)
    params = {
        "attention_W": jnp.asarray(_np(t_layer.attention_W)),
        "attention_b": jnp.asarray(_np(t_layer.attention_b)),
        "projection_h": jnp.asarray(_np(t_layer.projection_h)),
        "projection_p": jnp.asarray(_np(t_layer.projection_p)),
    }
    j_out = j_layer.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-4, atol=1e-5)


def test_senet_bilinear_parity(ref, rng):
    B, F, E = 4, 6, 5
    x = rng.normal(size=(B, F, E)).astype(np.float32)
    t_se = ref.SENETLayer(filed_size=F, reduction_ratio=3)
    t_bl = ref.BilinearInteraction(
        filed_size=F, embedding_size=E, bilinear_type="interaction"
    )
    t_out = t_bl(t_se(torch.from_numpy(x)))

    from xdeepfm_tpu.nn.interaction import BilinearInteraction, SENETLayer

    j_se = SENETLayer(filed_size=F, reduction_ratio=3)
    se_params = {
        "fc1": {"kernel": jnp.asarray(_np(t_se.excitation[0].weight).T)},
        "fc2": {"kernel": jnp.asarray(_np(t_se.excitation[2].weight).T)},
    }
    j_mid = j_se.apply({"params": se_params}, jnp.asarray(x))

    j_bl = BilinearInteraction(
        filed_size=F, embedding_size=E, bilinear_type="interaction"
    )
    W = jnp.stack([jnp.asarray(_np(m.weight).T) for m in t_bl.bilinear])
    j_out = j_bl.apply({"params": {"bilinear_inter": W}}, j_mid)
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-4, atol=1e-5)


def test_outter_product_parity(ref, rng):
    B, F, E = 4, 5, 6
    x = rng.normal(size=(B, F, E)).astype(np.float32)
    t_layer = ref.OutterProductLayer(field_size=F, embedding_size=E, kernel_type="mat")
    t_out = t_layer([torch.from_numpy(x[:, i : i + 1]) for i in range(F)])

    from xdeepfm_tpu.nn.interaction import OutterProductLayer

    j_layer = OutterProductLayer(field_size=F, embedding_size=E, kernel_type="mat")
    j_out = j_layer.apply(
        {"params": {"kernel": jnp.asarray(_np(t_layer.kernel))}}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-4, atol=1e-5)


def test_log_transform_parity(ref, rng):
    B, F, E = 4, 5, 6
    x = rng.normal(size=(B, F, E)).astype(np.float32)
    t_layer = ref.LogTransformLayer(field_size=F, embedding_size=E, ltl_hidden_size=7)
    t_layer.eval()  # running stats (identity-init) BN
    t_out = t_layer(torch.from_numpy(x))

    from xdeepfm_tpu.nn.interaction import LogTransformLayer

    j_layer = LogTransformLayer(field_size=F, embedding_size=E, ltl_hidden_size=7)
    variables = j_layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    params["ltl_weights"] = jnp.asarray(_np(t_layer.ltl_weights))
    params["ltl_biases"] = jnp.asarray(_np(t_layer.ltl_biases).reshape(-1))
    # torch BN affine params default to weight=1, bias=0 == flax init
    j_out = j_layer.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
        training=False,
    )
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-4, atol=1e-4)


def test_dice_parity(rng):
    from deepctr.layers.activation import Dice as TorchDice

    from xdeepfm_tpu.nn.activations import Dice

    B, C = 6, 5
    x = rng.normal(size=(B, C)).astype(np.float32)
    t_layer = TorchDice(emb_size=C, dim=2)
    t_layer.eval()
    with torch.no_grad():
        t_layer.alpha.copy_(torch.from_numpy(rng.normal(size=(C,)).astype(np.float32)))
    t_out = t_layer(torch.from_numpy(x))

    j_layer = Dice(emb_size=C, dim=2)
    variables = j_layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    params["alpha"] = jnp.asarray(_np(t_layer.alpha))
    j_out = j_layer.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
        training=False,
    )
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-4, atol=1e-5)


def test_cin_attention_parity(rng):
    from deepctr.layers.cin_attention import CINAttention as TorchCINAttn

    from xdeepfm_tpu.nn.cin_attention import CINAttention

    B, m, E = 4, 6, 8
    layer_size = (8, 6)
    x = rng.normal(size=(B, m, E)).astype(np.float32)
    t_layer = TorchCINAttn(
        field_size=m, embedding_size=E, layer_size=layer_size,
        split_half=True, num_heads=2, attn_dropout=0.0,
        use_layer_norm=True, use_residual=True,
    )
    t_layer.eval()
    t_out = t_layer(torch.from_numpy(x))

    j_layer = CINAttention(
        field_size=m, embedding_size=E, layer_size=layer_size,
        split_half=True, num_heads=2, attn_dropout=0.0,
        use_layer_norm=True, use_residual=True,
    )
    variables = j_layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = dict(variables["params"])
    for i in range(len(layer_size)):
        p[f"conv_w_{i}"] = jnp.asarray(_np(t_layer.conv1ds[i].weight)[:, :, 0])
        p[f"conv_b_{i}"] = jnp.asarray(_np(t_layer.conv1ds[i].bias))
    p["mhsa"] = {
        "W_q": {"kernel": jnp.asarray(_np(t_layer.mhsa.W_q.weight).T)},
        "W_k": {"kernel": jnp.asarray(_np(t_layer.mhsa.W_k.weight).T)},
        "W_v": {"kernel": jnp.asarray(_np(t_layer.mhsa.W_v.weight).T)},
        "W_o": {"kernel": jnp.asarray(_np(t_layer.mhsa.W_o.weight).T)},
    }
    p["layer_norm"] = {
        "scale": jnp.asarray(_np(t_layer.layer_norm.weight)),
        "bias": jnp.asarray(_np(t_layer.layer_norm.bias)),
    }
    p["attn_pooling"] = {
        "fc1": {
            "kernel": jnp.asarray(_np(t_layer.attn_pooling.attention[0].weight).T),
            "bias": jnp.asarray(_np(t_layer.attn_pooling.attention[0].bias)),
        },
        "fc2": {"kernel": jnp.asarray(_np(t_layer.attn_pooling.attention[2].weight).T)},
    }
    p["output_proj"] = {"kernel": jnp.asarray(_np(t_layer.output_proj.weight).T)}
    j_out = j_layer.apply({"params": p}, jnp.asarray(x))
    # looser tolerance: 8 matmuls deep and torch's oneDNN CPU matmuls jitter
    # run-to-run at ~1e-4 through this composite
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), rtol=1e-3, atol=1e-3)


def test_autodis_parity(rng):
    from deepctr.xdeepfm_pro.autodis import AutoDisLayer as TorchAutoDis

    from xdeepfm_tpu.pro.autodis import AutoDisLayer

    F, K, E, B = 3, 4, 5, 6
    x = rng.uniform(0, 1, size=(B, F)).astype(np.float32)
    t_layer = TorchAutoDis(num_features=F, num_buckets=K, embedding_dim=E)
    t_layer.eval()
    t_flat, _ = t_layer([torch.from_numpy(x[:, i : i + 1]) for i in range(F)])

    j_layer = AutoDisLayer(num_features=F, num_buckets=K, embedding_dim=E)
    variables = j_layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = dict(variables["params"])
    p["meta_embeddings"] = jnp.asarray(_np(t_layer.meta_embeddings))
    p["feature_temperatures"] = jnp.asarray(_np(t_layer.feature_temperatures))
    p["proj_w1"] = jnp.stack(
        [jnp.asarray(_np(t_layer.bucket_projectors[i][0].weight).T) for i in range(F)]
    )
    p["proj_b1"] = jnp.stack(
        [jnp.asarray(_np(t_layer.bucket_projectors[i][0].bias)) for i in range(F)]
    )
    p["proj_w2"] = jnp.stack(
        [jnp.asarray(_np(t_layer.bucket_projectors[i][2].weight).T) for i in range(F)]
    )
    p["proj_b2"] = jnp.stack(
        [jnp.asarray(_np(t_layer.bucket_projectors[i][2].bias)) for i in range(F)]
    )
    j_flat, _ = j_layer.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_flat), _np(t_flat), rtol=1e-4, atol=1e-5)
