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
