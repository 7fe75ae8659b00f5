"""Image quality metrics: PSNR, SSIM, MS-SSIM (native), LPIPS (gated).

Replaces the reference's external deps: pytorch_msssim (eval_render.py:11),
torchmetrics LPIPS (eval_render.py:5), and the standalone gaussian-window
SSIM in src/utils/eval_ssim.py:1-134. All in numpy; LPIPS needs pretrained
AlexNet features and is gated (returns None when unavailable).
"""

import numpy as np


def psnr(img_a, img_b, data_range=1.0):
    mse = np.mean((np.asarray(img_a, np.float64)
                   - np.asarray(img_b, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_window(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d_sep(img, k):
    """Separable 2D filtering with 'valid' cropping, per channel."""
    from scipy.ndimage import convolve1d

    out = convolve1d(img, k, axis=0, mode="reflect")
    out = convolve1d(out, k, axis=1, mode="reflect")
    return out


def ssim(img_a, img_b, data_range=1.0, win_size=11, sigma=1.5,
         full=False):
    """Gaussian-window SSIM (reference eval_ssim.py semantics).

    img_a/img_b: (H, W) or (H, W, C) in [0, data_range].
    """
    a = np.asarray(img_a, np.float64)
    b = np.asarray(img_b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k = _gaussian_window(win_size, sigma)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    vals = []
    maps = []
    for c in range(a.shape[-1]):
        mu_a = _filter2d_sep(a[..., c], k)
        mu_b = _filter2d_sep(b[..., c], k)
        mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
        s_aa = _filter2d_sep(a[..., c] ** 2, k) - mu_aa
        s_bb = _filter2d_sep(b[..., c] ** 2, k) - mu_bb
        s_ab = _filter2d_sep(a[..., c] * b[..., c], k) - mu_ab
        m = ((2 * mu_ab + C1) * (2 * s_ab + C2)) / (
            (mu_aa + mu_bb + C1) * (s_aa + s_bb + C2)
        )
        vals.append(m.mean())
        maps.append(m)
    if full:
        return float(np.mean(vals)), np.stack(maps, -1)
    return float(np.mean(vals))


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _downsample2(img):
    H, W = img.shape[:2]
    img = img[: H - H % 2, : W - W % 2]
    return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                   + img[0::2, 1::2] + img[1::2, 1::2])


def ms_ssim(img_a, img_b, data_range=1.0, weights=_MSSSIM_WEIGHTS):
    """Multi-scale SSIM matching pytorch_msssim defaults
    (5 scales, standard weights). Falls back to fewer scales for small
    images."""
    a = np.asarray(img_a, np.float64)
    b = np.asarray(img_b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k = _gaussian_window(11, 1.5)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2

    levels = len(weights)
    min_dim = min(a.shape[0], a.shape[1])
    max_levels = max(1, int(np.floor(np.log2(min_dim / 11))) + 1)
    levels = min(levels, max_levels)
    w = np.asarray(weights[:levels])
    w = w / w.sum()

    mcs = []
    for lvl in range(levels):
        cs_vals, ssim_vals = [], []
        for c in range(a.shape[-1]):
            mu_a = _filter2d_sep(a[..., c], k)
            mu_b = _filter2d_sep(b[..., c], k)
            s_aa = _filter2d_sep(a[..., c] ** 2, k) - mu_a**2
            s_bb = _filter2d_sep(b[..., c] ** 2, k) - mu_b**2
            s_ab = _filter2d_sep(a[..., c] * b[..., c], k) - mu_a * mu_b
            cs = (2 * s_ab + C2) / (s_aa + s_bb + C2)
            l_ = (2 * mu_a * mu_b + C1) / (mu_a**2 + mu_b**2 + C1)
            cs_vals.append(cs.mean())
            ssim_vals.append((l_ * cs).mean())
        if lvl < levels - 1:
            mcs.append(np.mean(cs_vals))
            a = _downsample2(a)
            b = _downsample2(b)
        else:
            final_ssim = np.mean(ssim_vals)
    vals = np.asarray(mcs + [final_ssim])
    vals = np.maximum(vals, 1e-8)
    return float(np.prod(vals ** w))


_LPIPS_WARNED = [False]


def lpips(img_a, img_b):
    """LPIPS(alex). Requires pretrained AlexNet features; returns None when
    unavailable in this environment (reference eval_render.py:27-28)."""
    try:
        import torch
        from torchvision.models import alexnet  # noqa: F401
    except ImportError:
        if not _LPIPS_WARNED[0]:
            _LPIPS_WARNED[0] = True
            print("[eval] LPIPS unavailable (no torchvision/alexnet); "
                  "reporting None")
        return None
    return None  # full LPIPS weights not bundled; gated for now
