"""Hand-derived oracles for the CPU augmentation parity path
(facevae_tpu/data/augmentation.py vs reference augmentation.py:161-353).

The reference's skimage/torchvision originals are not importable here
(libraries absent), so each transform is checked against INDEPENDENT math at
pinned RNG: exact permutations for 90° rotation, a hand-rolled bilinear
sampler for generic rotation, a from-scratch 8x8 DLT homography solve +
replicate-border sampler for the perspective warp, and closed-form PIL
enhancement formulas for the color jitter factors.
"""
import random

import numpy as np
import pytest

from facevae_tpu.data.augmentation import (RandomRotation, RandomPerspective,
                                           ColorJitter)


def _bilinear_constant(img, ys, xs):
    """Bilinear sample with constant-0 border (cv2 BORDER_CONSTANT parity)."""
    h, w = img.shape[:2]
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    ty = (ys - y0)[..., None]
    tx = (xs - x0)[..., None]

    def at(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
        return v * valid[..., None]

    return ((1 - ty) * (1 - tx) * at(y0, x0) + (1 - ty) * tx * at(y0, x0 + 1)
            + ty * (1 - tx) * at(y0 + 1, x0) + ty * tx * at(y0 + 1, x0 + 1))


def test_rotation_90_exact_permutation(rng):
    img = rng.rand(32, 32, 3).astype(np.float32)
    random.seed(0)
    out = RandomRotation((90.0, 90.0))([img])[0]
    # 90° about the pixel-center of the grid is an exact permutation
    # (cv2's positive angle = CCW in array coords = np.rot90 k=+1)
    np.testing.assert_allclose(out, np.rot90(img, k=1).copy(), atol=2e-3)
    random.seed(0)
    out0 = RandomRotation((0.0, 0.0))([img])[0]
    np.testing.assert_allclose(out0, img, atol=1e-6)


def test_rotation_generic_angle_vs_bilinear_oracle(rng):
    img = rng.rand(40, 40, 3).astype(np.float32)
    random.seed(3)
    out = RandomRotation((17.0, 17.0))([img])[0]
    angle = np.deg2rad(17.0)
    h, w = img.shape[:2]
    cy, cx = h / 2 - 0.5, w / 2 - 0.5
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    # inverse map: rotate output coords by -angle about the center
    ca, sa = np.cos(angle), np.sin(angle)
    xs = (xx - cx) * ca - (yy - cy) * sa + cx
    ys = (xx - cx) * sa + (yy - cy) * ca + cy
    want = _bilinear_constant(img.astype(np.float64), ys, xs)
    # cv2 INTER_LINEAR uses 5-bit fixed-point weights -> ~1/32-scale rounding
    assert np.abs(out - want).max() < 0.04
    assert np.abs(out - want).mean() < 0.005


def _solve_homography(src, dst):
    """DLT: 8x8 linear solve for H with H[2,2]=1 (independent of cv2)."""
    A, b = [], []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y]); b.append(u)
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y]); b.append(v)
    h = np.linalg.solve(np.asarray(A, np.float64), np.asarray(b, np.float64))
    return np.append(h, 1.0).reshape(3, 3)


def test_perspective_vs_hand_homography(rng):
    img = rng.rand(64, 64, 3).astype(np.float32)
    np.random.seed(11)
    out = RandomPerspective(30, 40)([img])[0]
    # replay the pinned draws to recover the corner offsets
    np.random.seed(11)
    h, w = img.shape[:2]
    rel = h / 256.0
    pers = np.random.randint(20, 30) * (-1) ** np.random.randint(2) * rel
    enlarge = np.random.randint(20, 40) * (-1) ** np.random.randint(2) * rel
    dst = np.array([[-enlarge, -enlarge], [-enlarge + pers, w + enlarge],
                    [h + enlarge, -enlarge], [h + enlarge - pers, w + enlarge]],
                   np.float64)
    src = np.array([[-enlarge, -enlarge], [-enlarge, w + enlarge],
                    [h + enlarge, -enlarge], [h + enlarge, w + enlarge]],
                   np.float64)
    H = _solve_homography(src, dst)
    Hinv = np.linalg.inv(H)
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    ones = np.ones_like(xx)
    pts = np.stack([xx, yy, ones], -1) @ Hinv.T
    xs, ys = pts[..., 0] / pts[..., 2], pts[..., 1] / pts[..., 2]
    # replicate border: clamp source coords into the image
    xs = np.clip(xs, 0, w - 1)
    ys = np.clip(ys, 0, h - 1)
    want = _bilinear_constant(img.astype(np.float64), ys, xs)
    assert np.abs(out - want).max() < 0.05
    assert np.abs(out - want).mean() < 0.005


def _pil_round(x):
    return np.clip(np.round(x), 0, 255)


@pytest.mark.parametrize("which", ["brightness", "saturation", "contrast"])
def test_colorjitter_single_factor_oracles(rng, which):
    """Each PIL enhancement alone vs its closed form on uint8:
      brightness: round(img * f)
      saturation: round(gray_L + f * (img - gray_L)),  L = ITU-R 601-2 luma
      contrast:   round(mean(L) + f * (img - mean(L))), mean rounded as PIL
    (ImageEnhance interpolates between a 'degenerate' image and the input.)
    """
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8).astype(np.float32) / 255.0
    random.seed(7)
    kw = {which: 0.4}
    out = ColorJitter(**kw)([img])[0]
    random.seed(7)
    f = random.uniform(max(0, 1 - 0.4), 1 + 0.4)

    u8 = np.round(img * 255.0).astype(np.float64)
    if which == "brightness":
        want = _pil_round(u8 * f)
    else:
        luma = (u8[..., 0] * 299 + u8[..., 1] * 587 + u8[..., 2] * 114) / 1000
        if which == "saturation":
            gray = np.floor(luma + 0.5)[..., None]           # PIL L rounding
            want = _pil_round(gray + f * (u8 - gray))
        else:
            mean = int(np.floor(luma).mean() + 0.5)          # PIL Contrast mean
            want = _pil_round(mean + f * (u8 - mean))
    got = np.round(out * 255.0)
    # tolerate one uint8 step for PIL's internal rounding mode
    assert np.abs(got - want).max() <= 1.0, which


def test_colorjitter_hue_properties(rng):
    """Hue shift: V (max channel) must be preserved exactly on uint8; a pure
    red hue-rotated by ~1/3 lands on green; factor 0 is identity."""
    img = (rng.rand(16, 16, 3)).astype(np.float32)
    random.seed(5)
    out0 = ColorJitter(hue=0)([img])[0]
    np.testing.assert_allclose(np.round(out0 * 255),
                               np.round(np.clip(img, 0, 1) * 255), atol=0)

    red = np.zeros((8, 8, 3), np.float32)
    red[..., 0] = 200 / 255.0
    # pin the draw to the max factor by replaying the uniform
    random.seed(1)
    jit = ColorJitter(hue=0.34)
    out = jit([red])[0]
    random.seed(1)
    f = random.uniform(-0.34, 0.34)
    # V preserved
    assert np.allclose(out.max(-1), red.max(-1), atol=1 / 255)
    # hue angle moved by ~f turns (PIL HSV: 255 units per turn)
    import colorsys
    got_h = colorsys.rgb_to_hsv(*out[0, 0])[0]
    want_h = (0.0 + int(f * 255) / 255.0) % 1.0
    assert abs(got_h - want_h) < 0.02
