"""Core layers: Conv (2D/3D, optional spectral norm), Dense, BatchNorm
(optionally cross-device synced), InstanceNorm.

BatchNorm is the SyncBatchNorm replacement: the reference converts every BN
to nn.SyncBatchNorm (logger.py:55-58; default norm in conv blocks,
modules.py:19), an all-reduce of batch statistics across ranks.  Here batch
mean / mean-of-squares are `lax.pmean`'d over the mesh axis named by
``axis_name`` — exactness matters for loss-curve parity (SURVEY.md §2.5).

Spectral norm (used when use_weight_norm=True: Generator/Discriminator,
reference models.py:1093,1117 via modules.py:14) runs one power iteration per
training call, u persisted in the 'spectral' collection.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from facevae_tpu.nn.init import torch_kernel_init, torch_bias_init


def _l2norm(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def _mxu_dw_enabled() -> bool:
    """MXU-layout weight gradients for channel-last convs — PROBED, default
    OFF (FACEVAE_MXU_DW=1 to enable; the grad-equality tests force it on).

    Hypothesis: XLA's StableHLO lowers a conv's dW as another convolution
    whose CONTRACTED feature dimension is the batch (8/128 lanes = 6% lane
    efficiency by the naive census metric, tools/conv_inventory.py — ~1/3
    of all train-step conv FLOPs in that form).  The custom VJP below keeps
    XLA's forward and dx and computes dW as shift-and-dot: one matmul per
    kernel offset contracting over N x out-spatial.  MEASURED DEAD
    (tools/microbench_dw.py, PERF.md round-4): across seven shape families
    covering every census bucket the two paths are within run-to-run
    variance except strided/small-channel convs where the strided slice
    reads make shift-and-dot 2x WORSE — i.e. the TPU backend does NOT
    execute dW at the StableHLO-visible layout; it retiles internally and
    already sits near its floor.  Kept as an A/B knob + negative evidence."""
    import os
    return os.environ.get("FACEVAE_MXU_DW", "0") not in ("0", "false", "")


def _conv_cl_raw(x, w, strides, padding):
    d = len(strides)
    sp = "DHW"[3 - d:]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("N" + sp + "C", sp + "IO", "N" + sp + "C"))
    return jax.lax.conv_general_dilated(x, w, strides, list(padding),
                                        dimension_numbers=dn)


def _dw_shift_dot(x, g, ks, strides, padding):
    """dW[off, ci, co] = sum_{n, p} x_pad[n, p*stride + off, ci] * g[n, p, co]
    as prod(ks) matmuls with contraction over (n, out_spatial)."""
    import itertools
    d = len(ks)
    xp = jnp.pad(x, [(0, 0)] + [tuple(p) for p in padding] + [(0, 0)])
    out_sp = g.shape[1:-1]
    N, Cin, Cout = x.shape[0], x.shape[-1], g.shape[-1]
    letters = "abc"[:d]
    subs = f"n{letters}i,n{letters}o->io"
    dws = []
    for off in itertools.product(*[range(k) for k in ks]):
        start = (0,) + off + (0,)
        limit = (N,) + tuple(o + (s - 1) * st + 1
                             for o, s, st in zip(off, out_sp, strides)) + (Cin,)
        xs = jax.lax.slice(xp, start, limit, (1,) + tuple(strides) + (1,))
        dws.append(jnp.einsum(subs, xs, g,
                              preferred_element_type=jnp.float32))
    return jnp.stack(dws).reshape(tuple(ks) + (Cin, Cout)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_cl_mxu(x, w, strides, padding):
    return _conv_cl_raw(x, w, strides, padding)


def _conv_cl_mxu_fwd(x, w, strides, padding):
    return _conv_cl_raw(x, w, strides, padding), (x, w)


def _conv_cl_mxu_bwd(strides, padding, res, g):
    x, w = res
    _, dx_vjp = jax.vjp(lambda xx: _conv_cl_raw(xx, w, strides, padding), x)
    dx, = dx_vjp(g)
    dw = _dw_shift_dot(x, g, w.shape[:-2], strides, padding)
    return dx, dw


_conv_cl_mxu.defvjp(_conv_cl_mxu_fwd, _conv_cl_mxu_bwd)


def conv_cl(x, w, strides, padding):
    """Channel-last conv ([N, *S, Ci] x [*k, Ci, Co]); on TPU the weight
    gradient runs in MXU layout (see _mxu_dw_enabled)."""
    strides = tuple(int(s) for s in strides)
    padding = tuple((int(p[0]), int(p[1])) for p in padding)
    if _mxu_dw_enabled():
        return _conv_cl_mxu(x, w, strides, padding)
    return _conv_cl_raw(x, w, strides, padding)


class Conv(nn.Module):
    """Channel-last convolution (dim=2 -> NHWC, dim=3 -> NDHWC).

    torch-default init; optional spectral normalization of the kernel
    (torch.nn.utils.spectral_norm semantics: one power iteration per training
    forward, weight divided by sigma).
    """

    features: int
    kernel_size: Union[int, Tuple[int, ...]]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    dim: int = 2
    use_bias: bool = True
    use_spectral_norm: bool = False
    dtype: Optional[jnp.dtype] = None
    # Execute a 3D conv as a 2D conv over depth-folded channels with a BANDED
    # [D*Cin, D*Cout] kernel (exact same math/params).  For small-Cin/Cout 3D
    # convs with a wide z-window (MFE's 7^3 mask conv: Cin=32, Cout=16) the
    # direct lowering runs at ~3% MXU (lane padding on BOTH operands); the
    # banded kernel contracts full 512->256 lanes.  FLOPs grow by D/kz but
    # utilization grows far more (measured ~5x on the mask conv).  Requires
    # stride 1 and z-padding kz//2; falls back to the direct path otherwise.
    z_banded: bool = False
    # Input/output are SPACE-TO-DEPTH PACKED ([N,D,M,Mx,4C], s2d_pack lane
    # order); the conv runs on packed tensors with the phase-embedded kernel.
    # Param shapes/names unchanged (the logical 3x3x3 kernel).  Set by the
    # block-level packing in nn/blocks.py; requires dim=3, k=3, stride 1,
    # padding 1, no spectral norm.
    s2d_io: bool = False
    # Input arrives DEPTH-FOLDED d-major ([N,H,W,D*Cin], fold_depth lane
    # order, D = this value).  Lets several depth-folding consumers share ONE
    # physical transpose of the volume (MFE's mask conv + occlusion conv both
    # fold the same 112-channel tensor).  z_banded convs skip their internal
    # input fold; dim=2 convs keep the checkpoint's c-major (c*D+d) kernel
    # layout and permute the kernel (tiny) to d-major at apply time instead
    # of transposing the activation.  0 = input is the normal layout.
    depth_folded: int = 0
    # dim=2 conv over torch's view(N, C*D, H, W) channels executed as a
    # FULL-DEPTH 3D conv on the volume itself: input [N,D,H,W,C], kernel
    # z-extent = D, z-padding VALID -> output [N,H,W,features] with NO
    # physical depth fold at all.  Param stays the checkpoint's 2D c-major
    # (ky,kx,C*D,F) layout; the (tiny) kernel is permuted to (D,ky,kx,C,F)
    # at apply time.  Exact same contraction (kz*ky*kx*C = ky*kx*C*D).
    full_depth_3d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dim
        ks = (self.kernel_size,) * d if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.strides,) * d if isinstance(self.strides, int) else tuple(self.strides)
        pd = (self.padding,) * d if isinstance(self.padding, int) else tuple(self.padding)
        if self.s2d_io:
            in_features = x.shape[-1] // 4
        elif self.depth_folded and d == 3:
            in_features = x.shape[-1] // self.depth_folded
        elif self.full_depth_3d and d == 2:
            in_features = x.shape[1] * x.shape[-1]   # D * C (volume input)
        else:
            in_features = x.shape[-1]
        fan_in = in_features
        for k in ks:
            fan_in *= int(k)

        kernel = self.param("kernel", torch_kernel_init(fan_in), ks + (in_features, self.features))

        if self.use_spectral_norm:
            # u in out-channel space, v in flattened-input space (torch layout).
            fan_total = fan_in

            def u_init():
                return _l2norm(jax.random.normal(self.make_rng("params"), (self.features,)))

            def v_init():
                return _l2norm(jax.random.normal(self.make_rng("params"), (fan_total,)))

            u_var = self.variable("spectral", "u", u_init)
            v_var = self.variable("spectral", "v", v_init)
            w_mat = kernel.reshape(-1, self.features).T          # (out, fan_in_total)
            u, v = u_var.value, v_var.value
            if train and not self.is_initializing():
                # one power iteration per training forward (torch semantics)
                sg = jax.lax.stop_gradient(w_mat)
                v = _l2norm(sg.T @ u)
                u = _l2norm(sg @ v)
                u_var.value, v_var.value = u, v
            sigma = jnp.einsum("i,ij,j->", jax.lax.stop_gradient(u), w_mat,
                               jax.lax.stop_gradient(v))
            kernel = kernel / sigma

        dtype = self.dtype or x.dtype
        if self.s2d_io:
            ok2d = d == 2 and ks[0] == ks[1] and ks[0] % 2 == 1 \
                and pd == (ks[0] // 2,) * 2
            ok3d = d == 3 and ks == (3, 3, 3) and pd == (1, 1, 1)
            assert ((ok2d or ok3d) and st == (1,) * d
                    and not self.use_spectral_norm), \
                "s2d_io requires an odd-k stride-1 SAME conv (3^3 for 3D)"
            packed_conv = _s2d_conv3d_packed if d == 3 else _s2d_conv2d_packed
            y = packed_conv(x.astype(dtype), kernel.astype(dtype))
            if self.use_bias:
                bias = self.param("bias", torch_bias_init(fan_in),
                                  (self.features,))
                y = y + jnp.tile(bias, 4).astype(dtype)
            return y
        if (self.z_banded and d == 3 and st == (1, 1, 1)
                and pd[0] == ks[0] // 2 and not self.use_spectral_norm):
            if self.depth_folded:
                y = _z_banded_conv3d_folded(x.astype(dtype),
                                            kernel.astype(dtype),
                                            (pd[1], pd[2]), self.depth_folded)
            else:
                y = _z_banded_conv3d(x.astype(dtype), kernel.astype(dtype),
                                     (pd[1], pd[2]))
        elif self.full_depth_3d and d == 2:
            D, C = x.shape[1], x.shape[-1]
            # checkpoint (ky,kx,c*D+d,f) -> volume kernel (d,ky,kx,c,f)
            w = kernel.reshape(ks + (C, D, self.features))
            w = w.transpose(3, 0, 1, 2, 4)
            y = conv_cl(x.astype(dtype), w.astype(dtype), (1,) + st,
                        [(0, 0)] + [(p, p) for p in pd])
            y = jnp.squeeze(y, axis=1)
        else:
            w = kernel
            if self.depth_folded and d == 2:
                # checkpoint layout is c-major (channel = c*D + d, torch
                # view(N, C*D, H, W)); the folded activation is d-major.
                # Permuting the (tiny) kernel instead of the activation is
                # the whole point of depth_folded.
                D = self.depth_folded
                C = in_features // D
                w = kernel.reshape(ks + (C, D, self.features))
                w = w.transpose(tuple(range(d)) + (d + 1, d, d + 2))
                w = w.reshape(ks + (in_features, self.features))
            y = conv_cl(x.astype(dtype), w.astype(dtype), st,
                        [(p, p) for p in pd])
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y


def _s2d_enabled() -> bool:
    """Space-to-depth packed execution for small-channel 3x3x3 convs.

    FACEVAE_S2D: "auto" (default — on for TPU backends only; the packed path
    is a TPU lane-utilization optimization), "1" (always — CPU tests), "0"
    (never)."""
    import os
    v = os.environ.get("FACEVAE_S2D", "auto")
    if v == "auto":
        return jax.default_backend() == "tpu"
    return v not in ("0", "false", "")


def _s2d_phase_indicator(k: int = 3):
    """E[t, p, q, d] = 1 iff the original tap offset (d - k//2) equals
    2*(t - rt) + p - q: output phase q at packed tap t reads input phase p.
    For odd k the packed kernel has kp = 2*((k//2 + 1)//2) + 1 taps."""
    import numpy as np
    r = k // 2
    rt = (r + 1) // 2
    kp = 2 * rt + 1
    E = np.zeros((kp, 2, 2, k), np.float32)
    for t in range(kp):
        for p in range(2):
            for q in range(2):
                dy = 2 * (t - rt) + p - q
                if -r <= dy <= r:
                    E[t, p, q, dy + r] = 1.0
    return E


def s2d_pack(x):
    """[..., H, W, C] -> [..., H/2, W/2, 4C], lane index = (py*2+px)*C + c.
    Works for 2D ([N,H,W,C]) and 3D ([N,D,H,W,C]) tensors."""
    *lead, H, W, C = x.shape
    nd = len(lead)
    x = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return x.transpose(perm).reshape(*lead, H // 2, W // 2, 4 * C)


def s2d_unpack(xp):
    """Inverse of s2d_pack."""
    *lead, M, Mx, C4 = xp.shape
    nd = len(lead)
    C = C4 // 4
    xp = xp.reshape(*lead, M, Mx, 2, 2, C)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return xp.transpose(perm).reshape(*lead, 2 * M, 2 * Mx, C)


def _s2d_conv3d_packed(xp, kernel):
    """3x3x3 stride-1 SAME conv on a PACKED tensor [N,D,M,Mx,4Ci] -> packed
    [N,D,M,Mx,4Co].  The packed 3-tap kernel carries structured zeros (each
    output phase reads 2 of the 3 packed taps per axis); the phase embedding
    is one einsum, linear in the kernel — autodiff free."""
    Ci, Co = kernel.shape[3], kernel.shape[4]
    E = jnp.asarray(_s2d_phase_indicator(), kernel.dtype)
    wp = jnp.einsum("tpqd,TPQD,zdDio->ztTpPiqQo", E, E, kernel)
    wp = wp.reshape(3, 3, 3, 4 * Ci, 4 * Co)
    return conv_cl(xp, wp, (1, 1, 1), [(1, 1)] * 3)


def _s2d_conv2d_packed(xp, kernel):
    """Odd-k stride-1 SAME 2D conv on a PACKED tensor [N,M,Mx,4Ci] -> packed
    [N,M,Mx,4Co] (2D sibling of _s2d_conv3d_packed; k=7 serves the
    generator's out_conv)."""
    k, _, Ci, Co = kernel.shape
    E = jnp.asarray(_s2d_phase_indicator(k), kernel.dtype)
    kp = E.shape[0]
    wp = jnp.einsum("tpqd,TPQD,dDio->tTpPiqQo", E, E, kernel)
    wp = wp.reshape(kp, kp, 4 * Ci, 4 * Co)
    return conv_cl(xp, wp, (1, 1), [(kp // 2, kp // 2)] * 2)


def _s2d_conv3d(x, kernel):
    """3x3x3 stride-1 SAME conv via 2x2 spatial phase packing (C -> 4C).

    XLA's direct NDHWC lowering pads both conv operands to 128 lanes, so a
    C=32 conv runs at ~6% MXU.  Packing 2x2 (H,W) phases into channels makes
    the contraction 4C wide at 4x the dense FLOPs; measured ~1.5-1.75x net
    per conv (tools/microbench_s2d.py).  NOTE: per-conv pack/unpack with
    norm/act in between measured a net LOSS full-step — use the block-level
    packing (nn/blocks.py, Conv(s2d_io=True)) which keeps whole NAC chains
    packed.  Exact same math/params as the direct conv."""
    return s2d_unpack(_s2d_conv3d_packed(s2d_pack(x), kernel))


def fold_depth(x):
    """[N,D,H,W,C] -> [N,H,W,D*C] (d-major: channel = d*C + c) — the ONE
    physical transpose shared by every depth-folding consumer of a volume
    (Conv(depth_folded=D): MFE's z-banded mask conv + occlusion conv read
    the same folded tensor, so the 112-channel volume is transposed once
    per step instead of once per consumer, forward and backward)."""
    N, D, H, W, C = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(N, H, W, D * C)


def _z_banded_conv3d_folded(x2, kernel, pad_yx, D):
    """z-banded conv on an ALREADY depth-folded input [N,H,W,D*Ci]
    (fold_depth order); returns the volume layout [N,D,H,W,Co]."""
    import numpy as np
    N, H, W, DCi = x2.shape
    Ci = DCi // D
    kz, ky, kx, _, Co = kernel.shape
    rz = kz // 2
    # constant band indicator E[dz, di, do] = 1 iff di - do == dz - rz; the
    # whole band embedding is ONE einsum (linear in kernel — autodiff free)
    E = np.zeros((kz, D, D), np.float32)
    for dz in range(kz):
        for do in range(D):
            di = do + dz - rz
            if 0 <= di < D:
                E[dz, di, do] = 1.0
    W2 = jnp.einsum("zpq,zyxio->yxpiqo", jnp.asarray(E, kernel.dtype), kernel)
    W2 = W2.reshape(ky, kx, D * Ci, D * Co)
    y = conv_cl(x2, W2, (1, 1), [(p, p) for p in pad_yx])
    return y.reshape(N, H, W, D, Co).transpose(0, 3, 1, 2, 4)


def _z_banded_conv3d(x, kernel, pad_yx):
    """3D conv (stride 1, z-padding kz//2) as a 2D conv over depth-folded
    channels with a banded [D*Ci, D*Co] kernel.

    The band structure encodes both the z-window and the zero z-padding:
    W2[:, :, di*Ci+ci, do*Co+co] = kernel[di-do+rz, :, :, ci, co] when
    |di-do| <= rz, else 0 — out-of-range taps simply have no di row.  Exact
    same math as the direct conv; the build is linear in `kernel`, so the
    backward differentiates through the slice-assembly for free."""
    return _z_banded_conv3d_folded(fold_depth(x), kernel, pad_yx, x.shape[1])


class Dense(nn.Module):
    """torch nn.Linear parity (kernel stored (in,out))."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init(in_features), (in_features, self.features))
        dtype = self.dtype or x.dtype
        y = jnp.matmul(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features), (self.features,))
            y = y + bias.astype(dtype)
        return y


class BatchNorm(nn.Module):
    """torch (Sync)BatchNorm parity, channel-last.

    train: normalize by biased batch variance; update running stats with
    unbiased variance and momentum 0.1 (torch convention:
    new = (1-m)*old + m*batch).  With axis_name set, batch statistics are
    pmean'd over that mesh axis (SyncBatchNorm).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    use_scale_bias: bool = True   # torch affine=True
    # lane_groups=G: input lanes carry G packed copies of the channel axis
    # ([..., G*features], s2d phase packing) — statistics reduce over the
    # group axis too, so they equal the unpacked BN's exactly; params and
    # running stats stay [features] (checkpoint-identical), tiled for the
    # affine.
    lane_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        G = self.lane_groups
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones((self.features,), jnp.float32))
        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            if G > 1:
                xg = xf.reshape(xf.shape[:-1] + (G, self.features))
                gaxes = reduce_axes + (x.ndim - 1,)
                mean = xg.mean(gaxes)
                mean2 = (xg * xg).mean(gaxes)
            else:
                mean = xf.mean(reduce_axes)
                mean2 = (xf * xf).mean(reduce_axes)
            # axis is only bound inside shard_map/pmap; init traces run outside
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - mean * mean
            if not self.is_initializing():
                n = G
                for a in reduce_axes:
                    n *= x.shape[a]
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                n = jnp.asarray(n, jnp.float32)
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        # Fold the normalize+affine into ONE per-channel multiply-add applied
        # in x's own dtype: y = x*a + b with a = scale*rsqrt(var+eps),
        # b = bias - mean*a (both computed fp32, cast once).  Statistics stay
        # fp32.  Full-step bench A/B measured this NEUTRAL (15.9 vs 16.0 f/s,
        # PERF.md round 5): XLA was already fusing the fp32 normalize chain,
        # so no HBM round trip existed to save.  Kept because it is fewer ops
        # and makes the one-touch property explicit rather than relying on
        # the fuser.
        inv = jax.lax.rsqrt(var + self.eps)
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            a = scale * inv
            b = bias - mean * a
        else:
            a = inv
            b = -mean * inv
        tile = (lambda v: jnp.tile(v, G)) if G > 1 else (lambda v: v)
        return x * tile(a).astype(x.dtype) + tile(b).astype(x.dtype)


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d/3d(affine=True) parity: per-sample per-channel
    normalization over spatial dims, no running stats."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        spatial_axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = xf.mean(spatial_axes, keepdims=True)
        var = xf.var(spatial_axes, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # same folded one-touch apply as BatchNorm: stats fp32, the big
        # tensor read/written once in its own dtype (bench-neutral, see above)
        a = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * a
        return x * a.astype(x.dtype) + b.astype(x.dtype)
