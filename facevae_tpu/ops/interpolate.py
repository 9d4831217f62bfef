"""Resize / pooling primitives matching torch semantics, built MXU-first.

The reference leans on F.interpolate (bilinear, align_corners=False, NO
antialiasing — models.py:978, trainer.py:280, losses.py:146) and on
AvgPool/MaxPool/nearest-Upsample inside blocks (modules.py:59-94).
`jax.image.resize` antialiases on downsample, which torch does not, so
bilinear resize is built here as two small dense matmuls (one per axis) with
precomputed interpolation matrices — exact, and it rides the MXU instead of
scattered gathers.

All layouts channel-last: [N,H,W,C] / [N,D,H,W,C].
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
import jax.lax as lax


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out_size, in_size] row-stochastic interpolation matrix (torch formula)."""
    if align_corners and out_size > 1:
        coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        coords = np.clip(coords, 0.0, in_size - 1)  # torch clamps source idx to >=0
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    t = coords - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    mat[rows, lo] += (1.0 - t).astype(np.float32)
    mat[rows, hi] += t.astype(np.float32)
    return mat


def interpolate_bilinear_2d(x: jnp.ndarray, out_hw, *, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize [N,H,W,C] -> [N,Ho,Wo,C], torch F.interpolate parity
    (no antialias).  Two dense matmuls -> MXU."""
    N, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    dtype = x.dtype
    ah = jnp.asarray(_bilinear_matrix(H, Ho, align_corners), dtype=jnp.float32)
    aw = jnp.asarray(_bilinear_matrix(W, Wo, align_corners), dtype=jnp.float32)
    y = jnp.einsum("oh,nhwc->nowc", ah, x.astype(jnp.float32))
    y = jnp.einsum("pw,nhwc->nhpc", aw, y).transpose(0, 1, 2, 3)
    # einsum above produced [N,Ho,Wo,C] already (h->o then w->p)
    return y.astype(dtype)


def interpolate_nearest_2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest-neighbor resize, torch F.interpolate(mode='nearest') parity:
    src index = floor(dst * in/out).  Used for the Hopenet 256->224 input
    (reference trainer.py:280 calls F.interpolate with the default mode)."""
    N, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    idx_h = jnp.floor(jnp.arange(Ho) * (H / Ho)).astype(jnp.int32)
    idx_w = jnp.floor(jnp.arange(Wo) * (W / Wo)).astype(jnp.int32)
    return x[:, idx_h][:, :, idx_w]


def resize_bilinear_half(x: jnp.ndarray) -> jnp.ndarray:
    """scale_factor=0.5 bilinear downsample, torch parity (= 2x2 average)."""
    N, H, W, C = x.shape
    return interpolate_bilinear_2d(x, (H // 2, W // 2), align_corners=False)


def upsample_nearest_2d(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """[N,H,W,C] nearest upsample (torch nn.Upsample default): pixel duplication."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def upsample_nearest_3d(x: jnp.ndarray, scale=(1, 2, 2)) -> jnp.ndarray:
    """[N,D,H,W,C] nearest upsample; reference upsamples only H,W (modules.py:94)."""
    sd, sh, sw = scale
    if sd != 1:
        x = jnp.repeat(x, sd, axis=1)
    if sh != 1:
        x = jnp.repeat(x, sh, axis=2)
    if sw != 1:
        x = jnp.repeat(x, sw, axis=3)
    return x


def avg_pool_2d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """[N,H,W,C] non-overlapping average pool (torch nn.AvgPool2d(k) with s=k)."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // window, window, W // window, window, C)
    return x.mean(axis=(2, 4))


def avg_pool_3d(x: jnp.ndarray, window=(1, 2, 2)) -> jnp.ndarray:
    """[N,D,H,W,C]; reference pools only H,W with kernel (1,2,2) (modules.py:75)."""
    wd, wh, ww = window
    N, D, H, W, C = x.shape
    x = x.reshape(N, D // wd, wd, H // wh, wh, W // ww, ww, C)
    return x.mean(axis=(2, 4, 6))


def max_pool_2d(x: jnp.ndarray, window: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """[N,H,W,C] max pool, torch nn.MaxPool2d(window, stride, padding) parity."""
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
