"""Activation-level parity of the flax tracker nets vs the reference torch
implementation (reference src/modules/droid_net/{extractor,gru,droid_net}.py).

The reference sources are importable from /root/reference once the CUDA-only
extensions (droid_backends, lietorch, torch_scatter) are stubbed. We build
the torch modules with RANDOM weights, convert the state dict through the
real checkpoint importer (nets/import_torch.py), and assert the flax outputs
match layer-by-layer in fp32 — this makes the importer falsifiable without
the droid.pth checkpoint on disk: any divergence in layer mapping, padding,
norm, or activation fails here.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from glorie_slam_tpu.nets import import_torch
from glorie_slam_tpu.nets.droid_net import DroidNet
from glorie_slam_tpu.ops.upsample import cvx_upsample

REF = "/root/reference"


def _scatter_mean(src, index, dim=0):
    """Minimal torch_scatter.scatter_mean stand-in (dense, CPU)."""
    index = index.long()
    n = int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = n
    out = torch.zeros(shape, dtype=src.dtype)
    cnt = torch.zeros(shape, dtype=src.dtype)
    view = [1] * src.dim()
    view[dim] = src.shape[dim]
    idx = index.view(view).expand_as(src)
    out.scatter_add_(dim, idx, src)
    cnt.scatter_add_(dim, idx, torch.ones_like(src))
    return out / cnt.clamp(min=1)


@pytest.fixture(scope="module")
def ref_droid_net():
    """Import the reference torch modules with CUDA extensions stubbed."""
    for name in ("droid_backends", "lietorch"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.scatter_mean = _scatter_mean
        sys.modules["torch_scatter"] = ts
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import src.modules.droid_net.droid_net as ref_mod

    torch.manual_seed(0)
    net = ref_mod.DroidNet()
    net.eval()
    return ref_mod, net


@pytest.fixture(scope="module")
def flax_params(ref_droid_net):
    _, net = ref_droid_net
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    return import_torch.torch_state_to_params(state)


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _assert_close(torch_out, jax_out, atol=1e-4, msg=""):
    a = torch_out.detach().numpy()
    b = np.asarray(jax_out, np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-4, err_msg=msg)


def test_fnet_activation_parity(ref_droid_net, flax_params):
    """Feature encoder (instance norm, reference extractor.py:61-127)."""
    _, net = ref_droid_net
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 48, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = net.fnet(_nchw(img)[None])[0]          # (2, 128, 6, 8)

    with jax.default_matmul_precision("float32"):
        out = DroidNet().apply(flax_params, jnp.asarray(img),
                               method="features")     # (2, 6, 8, 128)
    _assert_close(ref.permute(0, 2, 3, 1), out, msg="fnet")


def test_cnet_activation_parity(ref_droid_net, flax_params):
    """Context encoder + tanh/relu split (reference motion_filter.py:35-38)."""
    _, net = ref_droid_net
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 48, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ctx = net.cnet(_nchw(img)[None])[0]
        ref_net, ref_inp = ctx.split([128, 128], dim=1)
        ref_net, ref_inp = torch.tanh(ref_net), torch.relu(ref_inp)

    with jax.default_matmul_precision("float32"):
        out_net, out_inp = DroidNet().apply(
            flax_params, jnp.asarray(img), method="context")
    _assert_close(ref_net.permute(0, 2, 3, 1), out_net, msg="cnet/net")
    _assert_close(ref_inp.permute(0, 2, 3, 1), out_inp, msg="cnet/inp")


def test_update_module_activation_parity(ref_droid_net, flax_params):
    """ConvGRU + delta/weight heads + GraphAgg (droid_net.py:69-139)."""
    _, net = ref_droid_net
    rng = np.random.default_rng(3)
    E, h, w = 6, 8, 12
    ii = np.array([0, 0, 1, 1, 2, 2], np.int32)       # 3 unique frames
    hid = rng.normal(size=(E, h, w, 128)).astype(np.float32) * 0.5
    inp = rng.normal(size=(E, h, w, 128)).astype(np.float32) * 0.5
    corr = rng.normal(size=(E, h, w, 196)).astype(np.float32) * 0.5
    flow = rng.normal(size=(E, h, w, 4)).astype(np.float32) * 0.5

    with torch.no_grad():
        t_net, t_delta, t_weight, t_eta, t_upmask = net.update(
            _nchw(hid)[None], _nchw(inp)[None], _nchw(corr)[None],
            _nchw(flow)[None], torch.from_numpy(ii))

    _, kk = np.unique(ii, return_inverse=True)
    with jax.default_matmul_precision("float32"):
        j_net, j_delta, j_weight, j_eta, j_upmask = DroidNet().apply(
            flax_params, jnp.asarray(hid), jnp.asarray(inp),
            jnp.asarray(corr), jnp.asarray(flow),
            jnp.asarray(kk.astype(np.int32)), 3, None,
            method="update_step")

    _assert_close(t_net[0].permute(0, 2, 3, 1), j_net, msg="gru hidden")
    _assert_close(t_delta[0], j_delta, msg="delta head")
    _assert_close(t_weight[0], j_weight, msg="weight head")
    _assert_close(t_eta[0], j_eta, msg="agg eta")
    # torch upmask: (num, 8*8*9, ht, wd); flax: (num, ht, wd, 8*8*9)
    _assert_close(t_upmask[0].permute(0, 2, 3, 1), j_upmask, msg="agg upmask")


def test_cvx_upsample_parity(ref_droid_net):
    """Convex 8x upsampling (reference droid_net.py:9-23)."""
    ref_mod, _ = ref_droid_net
    rng = np.random.default_rng(4)
    data = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    mask = rng.normal(size=(2, 8 * 8 * 9, 5, 7)).astype(np.float32)

    with torch.no_grad():
        ref = ref_mod.cvx_upsample(torch.from_numpy(data),
                                   torch.from_numpy(mask))
    out = cvx_upsample(jnp.asarray(data), jnp.asarray(mask))
    _assert_close(ref, out, msg="cvx_upsample")


def test_head_slice_surgery(ref_droid_net, flax_params):
    """Checkpoint head slicing (reference slam.py:75-78): a 3-channel
    delta/weight head state dict must load as its first 2 channels."""
    _, net = ref_droid_net
    state = {k: v.numpy().copy() for k, v in net.state_dict().items()}
    rng = np.random.default_rng(5)
    for head in ("update.weight.2", "update.delta.2"):
        w2 = state[f"{head}.weight"]
        b2 = state[f"{head}.bias"]
        extra_w = rng.normal(size=(1,) + w2.shape[1:]).astype(np.float32)
        extra_b = rng.normal(size=(1,)).astype(np.float32)
        state[f"{head}.weight"] = np.concatenate([w2, extra_w], 0)
        state[f"{head}.bias"] = np.concatenate([b2, extra_b], 0)

    sliced = import_torch.torch_state_to_params(state)
    ref = flax_params["params"]["update"]
    got = sliced["params"]["update"]
    for leaf in ("kernel", "bias"):
        np.testing.assert_array_equal(ref["delta_2"][leaf],
                                      got["delta_2"][leaf])
        np.testing.assert_array_equal(ref["weight_2"][leaf],
                                      got["weight_2"][leaf])
