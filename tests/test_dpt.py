"""DPT mono-prior architecture shape tests (checkpoint not available in CI)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_dpt_forward_shapes():
    from glorie_slam_tpu.mapping.dpt import DPTDepthModel

    model = DPTDepthModel(n_blocks=2, hooks=(0, 1))  # tiny depth for CI
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 64, 64)
    assert np.all(np.asarray(out) >= 0)  # non-negative depth head


def test_dpt_resnet_stem_hooks():
    from glorie_slam_tpu.mapping.dpt import ResNetStem

    stem = ResNetStem()
    x = jnp.zeros((1, 64, 64, 3))
    params = stem.init(jax.random.PRNGKey(0), x)
    h0, h1, f = stem.apply(params, x)
    assert h0.shape == (1, 16, 16, 256)   # 1/4
    assert h1.shape == (1, 8, 8, 512)     # 1/8
    assert f.shape == (1, 4, 4, 1024)     # 1/16
