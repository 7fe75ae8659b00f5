"""DroidNet flax module tests: shapes, norm behavior, weight import round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glorie_slam_tpu.nets import droid_net, import_torch


@pytest.fixture(scope="module")
def model_and_params():
    model = droid_net.DroidNet()
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = model.init(rng, imgs)
    return model, variables


def test_encoder_shapes(model_and_params):
    model, variables = model_and_params
    imgs = jnp.ones((2, 64, 96, 3))
    fmap = model.apply(variables, imgs, method=model.features)
    assert fmap.shape == (2, 8, 12, 128)
    net, inp = model.apply(variables, imgs, method=model.context)
    assert net.shape == (2, 8, 12, 128) and inp.shape == (2, 8, 12, 128)
    assert float(jnp.max(net)) <= 1.0 and float(jnp.min(net)) >= -1.0
    assert float(jnp.min(inp)) >= 0.0


def test_instance_norm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(2, 8, 8, 4)), jnp.float32)
    y = droid_net.instance_norm(x)
    m = np.asarray(jnp.mean(y, axis=(1, 2)))
    v = np.asarray(jnp.var(y, axis=(1, 2)))
    np.testing.assert_allclose(m, 0.0, atol=1e-5)
    np.testing.assert_allclose(v, 1.0, atol=1e-3)


def test_update_step_shapes(model_and_params):
    model, variables = model_and_params
    E, h, w = 3, 8, 8
    rng = np.random.default_rng(1)
    net = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.float32)
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.float32)
    corr = jnp.asarray(rng.normal(size=(E, h, w, droid_net.CORR_PLANES)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(E, h, w, 4)), jnp.float32)
    kk = jnp.array([0, 0, 1])
    out = model.apply(
        variables, net, inp, corr, flow, kk, 2, None, method=model.update_step
    )
    net2, delta, weight, eta, upmask = out
    assert net2.shape == (E, h, w, 128)
    assert delta.shape == (E, h, w, 2)
    assert weight.shape == (E, h, w, 2)
    assert eta.shape == (2, h, w)
    assert upmask.shape == (2, h, w, 8 * 8 * 9)
    assert float(jnp.min(weight)) >= 0.0 and float(jnp.max(weight)) <= 1.0
    assert float(jnp.min(eta)) >= 0.0  # softplus * 0.01

    # without aggregation (motion filter path)
    net3, delta3, weight3 = model.apply(
        variables, net, inp, corr, None, None, 0, None, method=model.update_step
    )
    assert delta3.shape == (E, h, w, 2)


def test_graph_agg_edge_mask(model_and_params):
    """Padded edges must not affect the aggregated eta/upmask."""
    model, variables = model_and_params
    E, h, w = 4, 8, 8
    rng = np.random.default_rng(2)
    net = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.float32)
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.float32)
    corr = jnp.asarray(rng.normal(size=(E, h, w, droid_net.CORR_PLANES)), jnp.float32)
    kk = jnp.array([0, 1, 1, 1])
    mask = jnp.array([1.0, 1.0, 1.0, 0.0])
    _, _, _, eta_a, _ = model.apply(
        variables, net, inp, corr, None, kk, 2, mask, method=model.update_step
    )
    _, _, _, eta_b, _ = model.apply(
        variables, net[:3], inp[:3], corr[:3], None, kk[:3], 2, None,
        method=model.update_step,
    )
    np.testing.assert_allclose(np.asarray(eta_a), np.asarray(eta_b), atol=1e-5)


def test_torch_import_roundtrip(model_and_params):
    model, variables = model_and_params
    state = import_torch.params_to_torch_state(variables)
    # every torch key should exist (downsample only on strided layers)
    assert "fnet.conv1.weight" in state
    assert "update.gru.convz.weight" in state
    assert "fnet.layer2.0.downsample.0.weight" in state
    assert "fnet.layer1.0.downsample.0.weight" not in state

    re_vars = import_torch.torch_state_to_params(state)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(re_vars["params"])
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)


def test_torch_import_head_slice(model_and_params):
    """Checkpoint with 3-channel heads gets sliced to 2 (slam.py:75-78)."""
    model, variables = model_and_params
    state = import_torch.params_to_torch_state(variables)
    for head in ("update.weight.2", "update.delta.2"):
        w = state[f"{head}.weight"]
        state[f"{head}.weight"] = np.concatenate([w, w[:1]], 0)  # 3 out ch
        b = state[f"{head}.bias"]
        state[f"{head}.bias"] = np.concatenate([b, b[:1]], 0)
    re_vars = import_torch.torch_state_to_params(state)
    w2 = re_vars["params"]["update"]["weight_2"]["kernel"]
    assert w2.shape[-1] == 2


def test_torch_import_rejects_unknown_keys(model_and_params):
    model, variables = model_and_params
    state = import_torch.params_to_torch_state(variables)
    state["bogus.weight"] = np.zeros((1, 1, 3, 3))
    with pytest.raises(ValueError, match="unmapped"):
        import_torch.torch_state_to_params(state)
