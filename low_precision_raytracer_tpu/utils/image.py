"""Image IO.  Internal convention: (H, W, 3) float arrays with row 0 at the
image BOTTOM (normalized_y = -1, see ops/camera.py); files are flipped on
write/read so PNGs look upright."""

from __future__ import annotations

import numpy as np


def to_uint8(img) -> np.ndarray:
    img = np.asarray(img, np.float32)
    return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_png(path: str, img) -> None:
    from PIL import Image

    arr = to_uint8(img)[::-1]  # flip: row 0 is bottom internally
    Image.fromarray(arr).save(path)


def load_image_rgba_u8(path: str, flip: bool = False) -> np.ndarray:
    from PIL import Image

    im = Image.open(path).convert("RGBA")
    arr = np.asarray(im, np.uint8)
    return arr[::-1] if flip else arr


def load_hdr_equirect(path: str) -> np.ndarray:
    """Load an HDR panorama (Radiance .hdr via imageio, or LDR fallback)."""
    try:
        import imageio.v3 as iio

        arr = np.asarray(iio.imread(path), np.float32)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return arr[..., :3]
    except Exception:
        arr = load_image_rgba_u8(path).astype(np.float32) / 255.0
        return arr[..., :3] ** 2.2


def psnr(a, b, peak=1.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def ssim(a, b) -> float:
    """Global (single-window) SSIM over the luma channel — a coarse but
    dependency-free structural similarity for parity tests."""
    a = np.asarray(a, np.float64).mean(axis=-1)
    b = np.asarray(b, np.float64).mean(axis=-1)
    c1, c2 = 0.01**2, 0.03**2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    )
