"""Image quality metrics vs ground truth.

Port of the reference harness's metric definitions
(reference: scripts/test_suite_utils.py:129-161 — MrSE, MAPE, SMAPE, L1,
L2, SSIM; scripts/combine_renders.py:259-271 — mean pixel variance and
ttuv = variance × seconds). Host-side numpy.
"""

from __future__ import annotations

import numpy as np


def _prep(img, ref, clip_percentile=99.9):
    img = np.asarray(img, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    return img, ref


def l1(img, ref):
    img, ref = _prep(img, ref)
    return float(np.mean(np.abs(img - ref)))


def l2(img, ref):
    img, ref = _prep(img, ref)
    return float(np.mean((img - ref) ** 2))


def mrse(img, ref, eps=1e-2):
    """Mean relative squared error."""
    img, ref = _prep(img, ref)
    return float(np.mean((img - ref) ** 2 / (ref * ref + eps)))


def mrse01(img, ref, eps=1e-2):
    """MrSE on [0,1]-clipped images — the reference protocol's MrSE:
    combine_renders.py:251 evaluates MrSE(clip(est,0,1), clip(gt,0,1))
    (MAPE/SMAPE stay unclipped there). The clip bounds the influence of
    rare firefly outliers, so this is the comparable number for the
    reference's own MrSE tables."""
    img, ref = _prep(img, ref)
    img = np.clip(img, 0.0, 1.0)
    ref = np.clip(ref, 0.0, 1.0)
    return float(np.mean((img - ref) ** 2 / (ref * ref + eps)))


def mape(img, ref, eps=1e-2):
    img, ref = _prep(img, ref)
    return float(np.mean(np.abs(img - ref) / (ref + eps)))


def smape(img, ref, eps=1e-2):
    img, ref = _prep(img, ref)
    return float(np.mean(2.0 * np.abs(img - ref) / (img + ref + eps)))


def ssim(img, ref, c1=0.01**2, c2=0.03**2):
    """Structural similarity on the luminance channel, 8x8 windows."""
    img, ref = _prep(img, ref)

    def lum(x):
        return 0.212671 * x[..., 0] + 0.715160 * x[..., 1] + 0.072169 * x[..., 2]

    a = lum(img)
    b = lum(ref)
    scale = max(b.max(), 1e-9)
    a = a / scale
    b = b / scale
    h, w = a.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        return 1.0
    a = a[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8)
    b = b[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8)
    mu_a = a.mean(axis=(1, 3))
    mu_b = b.mean(axis=(1, 3))
    var_a = a.var(axis=(1, 3))
    var_b = b.var(axis=(1, 3))
    cov = (a * b).mean(axis=(1, 3)) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(s.mean())


def all_metrics(img, ref) -> dict:
    return {
        "l1": l1(img, ref),
        "l2": l2(img, ref),
        "mrse": mrse(img, ref),
        "mrse01": mrse01(img, ref),
        "mape": mape(img, ref),
        "smape": smape(img, ref),
        "ssim": ssim(img, ref),
    }


def mean_pixel_variance(image_sum, sqr_sum, weight):
    """Reference: combine_renders.py:259-271."""
    n = np.maximum(weight, 1.0)[..., None]
    mean = image_sum / n
    var = np.maximum(sqr_sum / n - mean * mean, 0.0) / np.maximum(n - 1.0, 1.0)
    return float(var.mean())
