"""LPIPS(alex) metric tests.

Two layers: metric sanity on the default (untrained-feature) variant, and a
numerics check of the WHOLE pipeline (scaling layer, conv/pad/stride/maxpool
placement, unit-normalize eps, linear heads, averaging) against an
independent torch re-implementation fed the same synthetic checkpoints
through the on-disk weight-loading path — so a layout or semantics bug in
either the loader or the JAX forward fails the test.
"""

import numpy as np
import pytest

from glorie_slam_tpu.utils import image_metrics as im


def test_lpips_sanity():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    c = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)

    d_aa = im.lpips(a, a)
    d_ab = im.lpips(a, b)
    d_ac = im.lpips(a, c)
    assert d_aa == pytest.approx(0.0, abs=1e-6)
    assert 0 < d_ab < d_ac  # small perturbation < unrelated image
    assert im.lpips(b, a) == pytest.approx(d_ab, rel=1e-5)


def test_lpips_variant_provenance():
    """Without checkpoints, lpips_variant() must say 'untrained' so eval
    outputs record non-reference-comparable provenance (VERDICT r2 #5)."""
    im._LPIPS_STATE.clear()
    try:
        assert im.lpips_variant() == "untrained"
    finally:
        im._LPIPS_STATE.clear()


def test_lpips_variant_written_to_metrics(tmp_path):
    """eval_kf_imgs writes a lpips_variant line into the metrics file."""
    from glorie_slam_tpu.utils import eval_render

    class _P:
        def print(self, *a, **k):
            pass

    class _Mapper:
        printer = _P()
        output = str(tmp_path)
        keyframe_dict = [{"idx": 0, "video_idx": 0}]
        frame_reader = [
            (0, np.zeros((16, 16, 3), np.float32),
             np.ones((16, 16), np.float32), None)
        ]

        def render_keyframe_img(self, video_idx, idx, mono_depth=None):
            img = np.zeros((16, 16, 3), np.float32)
            return np.ones((16, 16), np.float32), img, \
                np.ones((16, 16), np.float32)

    (tmp_path / "logs").mkdir()
    eval_render.eval_kf_imgs(_Mapper())
    text = (tmp_path / "logs" / "metrics_render_kf.txt").read_text()
    assert "lpips_variant: untrained" in text


def test_lpips_pretrained_path_matches_torch(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    # synthetic checkpoints in the torchvision / lpips on-disk layouts
    conv_idx = [0, 3, 6, 8, 10]
    astate, lstate = {}, {}
    cin = 3
    for li, (ci, (cout, k, _s, _p, _mp)) in enumerate(
            zip(conv_idx, im._ALEX_CFG)):
        astate[f"features.{ci}.weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, k, k)).astype(np.float32))
        astate[f"features.{ci}.bias"] = torch.tensor(
            rng.normal(0, 0.1, cout).astype(np.float32))
        lstate[f"lin{li}.model.1.weight"] = torch.tensor(
            rng.uniform(0, 0.2, (1, cout, 1, 1)).astype(np.float32))
        cin = cout
    torch.save(astate, tmp_path / "alexnet.pth")
    torch.save(lstate, tmp_path / "alex.pth")

    monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path))
    im._LPIPS_STATE.clear()
    try:
        a = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
        got = im.lpips(a, b)
        assert im._LPIPS_STATE["pretrained"]

        # independent torch reference of the torchmetrics alex pipeline
        def feats(x):
            x = (x - torch.tensor(im._SHIFT).view(1, 3, 1, 1)) / \
                torch.tensor(im._SCALE).view(1, 3, 1, 1)
            out = []
            for ci, (cout, k, s, p, mp) in zip(conv_idx, im._ALEX_CFG):
                if mp:
                    x = F.max_pool2d(x, 3, 2)
                x = F.relu(F.conv2d(x, astate[f"features.{ci}.weight"],
                                    astate[f"features.{ci}.bias"],
                                    stride=s, padding=p))
                out.append(x)
            return out

        ta = torch.tensor(np.transpose(a, (2, 0, 1))[None]) * 2 - 1
        tb = torch.tensor(np.transpose(b, (2, 0, 1))[None]) * 2 - 1
        total = 0.0
        with torch.no_grad():
            for xa, xb, li in zip(feats(ta), feats(tb), range(5)):
                na = xa / torch.sqrt((xa**2).sum(1, keepdim=True) + 1e-10)
                nb = xb / torch.sqrt((xb**2).sum(1, keepdim=True) + 1e-10)
                lw = lstate[f"lin{li}.model.1.weight"].clamp(min=0)
                total += float(
                    ((na - nb) ** 2 * lw).sum(1).mean())
        assert got == pytest.approx(total, rel=1e-4, abs=1e-6)
    finally:
        im._LPIPS_STATE.clear()  # do not leak synthetic weights
