"""NIQE — Natural Image Quality Evaluator (no-reference IQA), host-side.

The reference computes NIQE through pyiqa (eval.py:61-125), which is not
installable here; this is a from-scratch numpy/scipy implementation of
Mittal et al., "Making a 'Completely Blind' Image Quality Analyzer",
IEEE SPL 2013 — the algorithm pyiqa's NIQE wraps:

  1. MSCN coefficients at two scales (7x7 Gaussian, sigma 7/6)
  2. per-96px-patch AGGD fits of MSCN + 4 pairwise products
     (18 features/scale, 36 total), sharp patches only at scale 1
  3. Mahalanobis-style distance to a pristine multivariate Gaussian

The pristine model (mu, cov over 36 features) is a data artifact fit on a
pristine-image corpus. This environment has no network egress, so the
official ``niqe_image_params.mat`` cannot be fetched; instead the model is
(a) loadable from .mat/.npz via ``load_niqe_params`` when the user supplies
the file, or (b) fittable on any pristine folder via ``fit_niqe_params``.
Scores are only comparable under a fixed pristine model, as with the
official parameters.

Host-side by design: this is an offline eval metric (once per image), not
a training hot path — numpy keeps it dependency-free and exact.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma as gamma_fn

__all__ = ["niqe", "fit_niqe_params", "load_niqe_params",
           "save_niqe_params", "compute_niqe_features"]


def _gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    half = size // 2
    xs = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-(xs[:, None] ** 2 + xs[None, :] ** 2) / (2 * sigma ** 2))
    return g / g.sum()


_AGGD_GAM = np.arange(0.2, 10.001, 0.001)
_AGGD_R = (gamma_fn(2.0 / _AGGD_GAM) ** 2
           / (gamma_fn(1.0 / _AGGD_GAM) * gamma_fn(3.0 / _AGGD_GAM)))


def _aggd_fit(x: np.ndarray) -> Tuple[float, float, float]:
    """Asymmetric generalized Gaussian fit -> (alpha, sigma_l, sigma_r)
    by the moment-matching lookup of Lasmar et al. (the BRISQUE/NIQE
    estimator)."""
    x = x.ravel()
    left = x[x < 0]
    right = x[x > 0]
    sigma_l = math.sqrt(float(np.mean(left ** 2))) if left.size else 0.0
    sigma_r = math.sqrt(float(np.mean(right ** 2))) if right.size else 0.0
    if sigma_l == 0.0 or sigma_r == 0.0:
        return 1.0, sigma_l, sigma_r
    gamma_hat = sigma_l / sigma_r
    mean_abs = float(np.mean(np.abs(x)))
    r_hat = mean_abs ** 2 / float(np.mean(x ** 2))
    rhat_norm = (r_hat * (gamma_hat ** 3 + 1) * (gamma_hat + 1)
                 / (gamma_hat ** 2 + 1) ** 2)
    idx = int(np.argmin((_AGGD_R - rhat_norm) ** 2))
    return float(_AGGD_GAM[idx]), sigma_l, sigma_r


def _mscn(img: np.ndarray, window: np.ndarray,
          eps: float = 1.0) -> np.ndarray:
    mu = convolve(img, window, mode="nearest")
    sigma = np.sqrt(np.abs(
        convolve(img * img, window, mode="nearest") - mu * mu))
    return (img - mu) / (sigma + eps), sigma


def _patch_features(patch: np.ndarray) -> np.ndarray:
    """18 NSS features of one MSCN patch (alpha/overall-sigma of the MSCN
    AGGD + alpha/mean/sigma_l^2/sigma_r^2 for 4 orientation products)."""
    feats = []
    alpha, sl, sr = _aggd_fit(patch)
    feats += [alpha, (sl ** 2 + sr ** 2) / 2.0]
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]  # H, V, D1, D2
    for dy, dx in shifts:
        # Non-wrapping adjacent-pixel products on trimmed overlapping
        # slices (the official NIQE's circshift is applied to padded
        # fields; np.roll here would inject spurious cross-edge products
        # at patch borders).
        ys = slice(0, -dy) if dy > 0 else slice(None)
        ys2 = slice(dy, None) if dy > 0 else slice(None)
        if dx > 0:
            xs, xs2 = slice(0, -dx), slice(dx, None)
        elif dx < 0:
            xs, xs2 = slice(-dx, None), slice(0, dx)
        else:
            xs = xs2 = slice(None)
        prod = (patch[ys, xs] * patch[ys2, xs2]).ravel()
        alpha, sl, sr = _aggd_fit(prod)
        const = math.sqrt(gamma_fn(1.0 / alpha) / gamma_fn(3.0 / alpha))
        mean = (sr - sl) * (gamma_fn(2.0 / alpha)
                            / gamma_fn(1.0 / alpha)) * const
        feats += [alpha, mean, sl ** 2, sr ** 2]
    return np.asarray(feats, np.float64)


def compute_niqe_features(img_gray: np.ndarray,
                          patch_size: int = 96,
                          sharpness_threshold: float = 0.75
                          ) -> Optional[np.ndarray]:
    """Per-patch 36-dim NSS features of a [H, W] grayscale image in
    [0, 255]. Returns [num_sharp_patches, 36] or None if the image is too
    small for a single patch."""
    img = img_gray.astype(np.float64)
    h, w = img.shape
    nph, npw = h // patch_size, w // patch_size
    if nph == 0 or npw == 0:
        return None
    img = img[: nph * patch_size, : npw * patch_size]
    window = _gaussian_window()

    all_feats = []
    sharp_mask = None
    for scale in (1, 2):
        if scale == 2:
            # low-pass then 2x decimation (official implementation uses
            # imresize; a simple average-pool keeps it dependency-free and
            # consistent between fit and eval)
            im = img.reshape(img.shape[0] // 2, 2,
                            img.shape[1] // 2, 2).mean(axis=(1, 3))
        else:
            im = img
        mscn, sigma_field = _mscn(im, window)
        psz = patch_size // scale
        feats_scale = []
        sharpness = []
        for i in range(nph):
            for j in range(npw):
                p = mscn[i * psz: (i + 1) * psz, j * psz: (j + 1) * psz]
                feats_scale.append(_patch_features(p))
                sp = sigma_field[i * psz: (i + 1) * psz,
                                 j * psz: (j + 1) * psz]
                sharpness.append(float(sp.mean()))
        feats_scale = np.stack(feats_scale)
        if scale == 1:
            sharpness = np.asarray(sharpness)
            peak = sharpness.max()
            sharp_mask = sharpness > sharpness_threshold * peak
            if not sharp_mask.any():
                sharp_mask = np.ones_like(sharp_mask)
        all_feats.append(feats_scale[sharp_mask])
    return np.concatenate(all_feats, axis=1)  # [P, 36]


def _to_gray255(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] float [0,1] or uint8 -> BT.601 luma in [0, 255]."""
    x = img.astype(np.float64)
    if x.max() <= 1.5:
        x = x * 255.0
    if x.ndim == 3:
        x = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    return x


def fit_niqe_params(images) -> dict:
    """Fit the pristine MVG model over an iterable of [H, W(, 3)] images
    (float [0,1] or uint8). Returns {'mu': [36], 'cov': [36, 36]}."""
    feats = []
    for img in images:
        f = compute_niqe_features(_to_gray255(np.asarray(img)))
        if f is not None:
            feats.append(f)
    if not feats:
        raise ValueError("no image large enough for a 96x96 patch")
    feats = np.concatenate(feats, axis=0)
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return {"mu": mu, "cov": cov}


def save_niqe_params(params: dict, path: str) -> None:
    np.savez(path, mu=params["mu"], cov=params["cov"])


def load_niqe_params(path: str) -> dict:
    """Load a pristine model from .npz (ours) or .mat (the official
    niqe_image_params.mat / modelparameters.mat layouts)."""
    if path.endswith(".mat"):
        from scipy.io import loadmat
        m = loadmat(path)
        for mu_k, cov_k in (("mu_prisparam", "cov_prisparam"),
                            ("pop_mu", "pop_cov")):
            if mu_k in m:
                return {"mu": np.asarray(m[mu_k]).ravel(),
                        "cov": np.asarray(m[cov_k])}
        raise KeyError(f"no pristine-model keys in {path}: {list(m)}")
    z = np.load(path)
    return {"mu": np.asarray(z["mu"]), "cov": np.asarray(z["cov"])}


def niqe(img: np.ndarray, params: dict) -> float:
    """NIQE score of an image (lower = more natural) against a pristine
    model from load_niqe_params/fit_niqe_params."""
    feats = compute_niqe_features(_to_gray255(np.asarray(img)))
    if feats is None:
        raise ValueError("image smaller than one 96x96 NIQE patch")
    mu_d = feats.mean(axis=0)
    cov_d = (np.cov(feats, rowvar=False) if feats.shape[0] > 1
             else np.zeros((36, 36)))
    mu_p, cov_p = params["mu"], params["cov"]
    diff = mu_p - mu_d
    pooled = (cov_p + cov_d) / 2.0
    sol = np.linalg.lstsq(pooled, diff, rcond=None)[0]
    return float(np.sqrt(max(0.0, diff @ sol)))
