"""Pallas TPU kernel: one ENTIRE flow pyramid step in VMEM.

The XLA scan-branch form of a pyramid step (ops/flow._make_step_branch)
is a dozen separate HBM-resident ops: the phase-decomposed candidate
sampling writes a (layers, lh, lw) delta tensor to HBM, then the bias
terms, window block sums, argmin and commit each stream it (plus
friends) back through HBM.  At the ~270x480 low-res cap those tensors
are small (4-8 MB) but the step runs 16x per pair, and the honest
measurement says the per-step FIXED machinery -- not the candidate
slicing -- is half the flow budget (tools/flow_breakdown.py).

This kernel executes the whole step with everything resident in VMEM:

  * candidate fetch: per (distinct offset j, layer l), three async DMAs
    (y/u/v planes) from the mirror-pre-padded phase stack in HBM (the
    same stack the XLA shift sampler slices, flattened to 2D -- see
    below) -- double-buffered so the VPU work hides the copies;
  * DMA windows are aligned down to the (32, 128) memref tiling and the
    sub-tile residual is brought to the origin with two in-VMEM rotates
    (same trick as ops/pallas/warp_sample.py);
  * SAD deltas |y1-y2|+|u1-u2|+|v1-v2| accumulate into a (layers, lh,
    lw) VMEM scratch, selected per distinct offset by a resident uint8
    index field;
  * the commit phase runs per ACTIVE layer (a dynamic fori_loop over
    the traced radius; masked layers are never touched, matching the
    XLA form's 0xFFFFFFFF masking): offset bias, neighbor bias (static
    clamped shifts of the committed field), window block sums, and a
    running first-minimum argmin -- all without touching HBM;
  * the winner's signed-square adjustment is nearest-upsampled
    (pltpu.repeat) and committed to the offset field.

Mosaic lowering constraints discovered on this toolchain (probe-tested;
violating any of them crashes the remote compiler with an INTERNAL
error, not a clean NotImplementedError):
  * dynamic-offset DMA requires the start to be `pl.multiple_of`-hinted
    tile-aligned AND the window size to be a tile multiple ((32, 128)
    for uint8) -- either violation crashes the lowering; rank-3 refs
    are fine once both hold, so one DMA fetches a candidate's three
    planes (pad_stacks_for_pallas flattens (s*s, 3, ...) to
    (s*s*3, ...));
  * reductions over unsigned integers are unimplemented -- all sums run
    in int32, bit-identical to the reference's uint32 atomic adds mod
    2**32 (addition is the same bits);
  * the argmin needs UNSIGNED order, so compares are sign-biased
    (x ^ 0x80000000) before the signed <;
  * multi-axis reshape block sums ((nwy, w, nwx, w).sum((1, 3))) crash;
    the two-stage transpose form (row reshape-sum, transpose, column
    reshape-sum, transpose) lowers fine.

First-minimum semantics (determineLowestLayerKernel.cl's ascending
scan) fall out of the strict `<` update with ascending l.

Reference: calcDeltaSumsKernel.cl + determineLowestLayerKernel.cl +
adjustOffsetArrayKernel.cl (one host iteration of opticalFlowCalc.c:
126-203); the phase decomposition itself is ARCHITECTURE.md section 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA source offsets must be divisible by the memref tiling (sublane x
# lane); arbitrary starts DMA an aligned-down window and rotate the
# residual in VMEM (see ops/pallas/warp_sample.py).
_AY = 32
_AX = 128

_SIGN = -0x80000000   # sign-bias for unsigned-order compares


def _ult(a, b):
    """Unsigned a < b on int32 operands (sign-bias + signed compare).
    The bias is built inside the call: a module-level jnp scalar would
    be a captured constant, which pallas_call rejects."""
    s = jnp.int32(_SIGN)
    return (a ^ s) < (b ^ s)


def _signed_square(rel):
    return jnp.where(rel > 0, rel * rel, -(rel * rel))


def _win_dims(lh: int, lw: int):
    """DMA window (rows, cols): covers the (lh, lw) payload plus the
    sub-tile residual, rounded up to the (32, 128) tiling -- DMA window
    SIZES must be tile multiples too (unaligned sizes crash the Mosaic
    lowering on this toolchain, like unaligned starts)."""
    wr = -(-(lh + _AY) // _AY) * _AY
    wc = -(-(lw + _AX) // _AX) * _AX
    return wr, wc


def stack_pad_dims(lh: int, lw: int, Bl: int):
    """(padded plane height, padded plane width) of the 2-D stack layout.

    Every aligned-down window must fit inside its plane: the row start
    reaches ((2Bl-1)//32)*32 and spans the tile-rounded window; same for
    columns with the (128) lane tiling."""
    wr, wc = _win_dims(lh, lw)
    php = -(-max(lh + 2 * Bl,
                 ((2 * Bl - 1) // _AY) * _AY + wr) // _AY) * _AY
    pwp = -(-max(lw + 2 * Bl,
                 ((2 * Bl - 1) // _AX) * _AX + wc) // _AX) * _AX
    return php, pwp


def pad_stacks_for_pallas(stacks, lh: int, lw: int, Bl: int):
    """(s*s, 3, H, W) phase stack -> (s*s*3, PHp, PWp): phase p's y/u/v
    planes sit at leading indices 3p..3p+2 so ONE rank-3 DMA fetches a
    candidate's three planes (rank-3 dynamic-offset DMA lowers fine once
    starts AND sizes are tile-aligned).  The zero padding is never
    selected (the ok gate bounds every shift inside the mirror
    padding)."""
    ss, c, H, W = stacks.shape
    php, pwp = stack_pad_dims(lh, lw, Bl)
    out = stacks.reshape(ss * c, H, W)
    return jnp.pad(out, ((0, 0), (0, php - H), (0, pwp - W)))


def _make_kernel(lh: int, lw: int, s: int, rs: int, Bl: int,
                 window: int, nb_enabled: bool, layers: int,
                 luma_shift: int, acc_dtype):
    """Kernel body for one static (window, nb) pyramid-step branch."""
    m = s - 1
    w2 = 2 * window
    nwy, nwx = -(-lh // window), -(-lw // window)
    wr, wc = _win_dims(lh, lw)     # tile-aligned DMA window

    def kernel(meta_ref, vyx_ref, probe_ref, offx_ref, offy_ref, idx_ref,
               stacks_ref, adj_ref, cand, acc, bsum, sem):
        D = meta_ref[0]
        is_y = meta_ref[1]
        radius = meta_ref[2]
        ds = meta_ref[3]
        nbs = meta_ref[4]
        n_dma = D * radius

        def dma_parts(t):
            j = t // radius
            l = t % radius
            rel = l - radius // 2          # l < radius always
            adj = _signed_square(rel)
            oy = vyx_ref[0, j] + adj * is_y
            ox = vyx_ref[1, j] + adj * (1 - is_y)
            p = (oy & m) * s + (ox & m)
            sy = Bl + (oy >> rs)
            sx = Bl + (ox >> rs)
            sy_a = (sy // _AY) * _AY
            sx_a = (sx // _AX) * _AX
            return p, sy_a, sx_a, sy - sy_a, sx - sx_a, j, l

        def get_dma(t, slot):
            p, sy_a, sx_a, _, _, _, _ = dma_parts(t)
            return pltpu.make_async_copy(
                stacks_ref.at[pl.ds(3 * p, 3),
                              pl.ds(pl.multiple_of(sy_a, _AY), wr),
                              pl.ds(pl.multiple_of(sx_a, _AX), wc)],
                cand.at[slot], sem.at[slot])

        def start(t, slot):
            get_dma(t, slot).start()

        acc[:] = jnp.zeros_like(acc)
        idx32 = idx_ref[:].astype(jnp.int32)
        y2 = probe_ref[0].astype(jnp.int32)
        u2 = probe_ref[1].astype(jnp.int32)
        v2 = probe_ref[2].astype(jnp.int32)

        start(0, 0)

        def body(t, carry):
            slot = t % 2

            @pl.when(t + 1 < n_dma)
            def _():
                start(t + 1, (t + 1) % 2)

            get_dma(t, slot).wait()
            _, _, _, ry, rx, j, l = dma_parts(t)
            # rotate the sub-tile residual to the origin (32-bit lanes)
            v = cand[slot].astype(jnp.int32)
            v = pltpu.roll(v, wr - ry, 1)
            v = pltpu.roll(v, wc - rx, 2)
            d = (jnp.abs(v[0, :lh, :lw] - y2)
                 + jnp.abs(v[1, :lh, :lw] - u2)
                 + jnp.abs(v[2, :lh, :lw] - v2)).astype(acc_dtype)
            prev = acc[pl.ds(l, 1)][0]
            acc[pl.ds(l, 1)] = jnp.where(idx32 == j, d, prev)[None]
            return carry

        jax.lax.fori_loop(0, n_dma, body, 0)

        # ---- commit phase: bias + window sums + first-min argmin ----
        offx = offx_ref[:]
        offy = offy_ref[:]
        prev_plane = jnp.where(is_y == 1, offy, offx)

        if nb_enabled:
            # clamped +-2*window shifts (calcDeltaSumsKernel.cl:137-151)
            def shifted(sign, axis):
                n = (lh, lw)[axis]
                k = min(w2, n)
                if sign > 0:
                    edge = jax.lax.slice_in_dim(prev_plane, n - 1, n,
                                                axis=axis)
                    parts = ([jax.lax.slice_in_dim(prev_plane, k, n,
                                                   axis=axis)]
                             if k < n else [])
                    parts.append(pltpu.repeat(edge, k, axis))
                else:
                    edge = jax.lax.slice_in_dim(prev_plane, 0, 1,
                                                axis=axis)
                    parts = [pltpu.repeat(edge, k, axis)]
                    if k < n:
                        parts.append(jax.lax.slice_in_dim(
                            prev_plane, 0, n - k, axis=axis))
                return (jnp.concatenate(parts, axis=axis)
                        if len(parts) > 1 else parts[0])

            nbs_planes = (shifted(1, 1), shifted(-1, 1),
                          shifted(1, 0), shifted(-1, 0))

        mul_ds = jnp.int32(1) << ds            # x << ds == x * (1 << ds)
        mul_nbs = jnp.int32(1) << nbs
        big = jnp.full((nwy, nwx), -1, jnp.int32)   # 0xFFFFFFFF unsigned

        def commit_body(l, carry):
            best, bidx = carry
            rel = l - radius // 2
            adjl = _signed_square(rel)
            d32 = acc[pl.ds(l, 1)][0].astype(jnp.int32)
            if luma_shift:
                d32 = jax.lax.shift_right_logical(
                    d32, jnp.int32(luma_shift))
            probe_l = prev_plane + adjl
            part = d32 * mul_ds + jnp.abs(probe_l)
            if nb_enabled:
                nb = (jnp.abs(nbs_planes[0] - probe_l)
                      + jnp.abs(nbs_planes[1] - probe_l)
                      + jnp.abs(nbs_planes[2] - probe_l)
                      + jnp.abs(nbs_planes[3] - probe_l))
                part = part + nb * mul_nbs
            if window > 1:
                bsum[:] = jnp.zeros_like(bsum)
                bsum[0:lh, 0:lw] = part
                r = bsum[:].reshape(nwy, window, nwx * window).sum(axis=1)
                sums = r.T.reshape(nwx, window, nwy).sum(axis=1).T
            else:
                sums = part
            better = _ult(sums, best)
            return (jnp.where(better, sums, best),
                    jnp.where(better, l, bidx))

        best0 = (big, jnp.zeros((nwy, nwx), jnp.int32))
        _, bidx = jax.lax.fori_loop(0, radius, commit_body, best0)

        # BLOCK-resolution adjustment; the nearest upsample + commit add
        # happen on the XLA side (pltpu.repeat TILES rather than
        # element-repeats, so the upsample cannot run in-kernel; the
        # (nwy, nwx) output keeps the extra HBM round trip tiny)
        adj_ref[:] = _signed_square(bidx - radius // 2)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("lh", "lw", "s", "rs", "Bl", "window",
                              "nb_enabled", "layers", "luma_shift",
                              "interpret"))
def flow_step_pallas(stacks2, probe, off_x, off_y, idx_full, vyx, meta,
                     lh: int, lw: int, s: int, rs: int, Bl: int,
                     window: int, nb_enabled: bool, layers: int,
                     luma_shift: int, interpret: bool = None):
    """One whole pyramid step; bit-exact with the XLA branch.

    stacks2   (s*s*3, PHp, PWp) flattened phase stack
              (pad_stacks_for_pallas)
    probe     (3, lh, lw) int16 (int32 when luma_shift) f2 probe samples
    off_x/y   (lh, lw) int32 committed field entering the step
    idx_full  (lh, lw) uint8 distinct-table index per pixel
    vyx       (2, K) int32 unpacked distinct (vy; vx) tables
    meta      (5,) int32 [D, is_y, radius, delta_scalar, nb_scalar]

    Returns the (nwy, nwx) BLOCK-level signed-square adjustment; the
    caller nearest-upsamples it and commits to the stepped axis
    (flow_step_commit).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    acc_dtype = jnp.int32 if luma_shift else jnp.int16
    wr, wc = _win_dims(lh, lw)
    kernel = _make_kernel(lh, lw, s, rs, Bl, window, nb_enabled, layers,
                          luma_shift, acc_dtype)
    nwy, nwx = -(-lh // window), -(-lw // window)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),     # vyx
            pl.BlockSpec(memory_space=pltpu.VMEM),     # probe
            pl.BlockSpec(memory_space=pltpu.VMEM),     # off_x
            pl.BlockSpec(memory_space=pltpu.VMEM),     # off_y
            pl.BlockSpec(memory_space=pltpu.VMEM),     # idx_full
            pl.BlockSpec(memory_space=pltpu.HBM),      # stacks2
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwy, nwx), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, wr, wc), stacks2.dtype),
            pltpu.VMEM((layers, lh, lw), acc_dtype),
            pltpu.VMEM((nwy * window, nwx * window), jnp.int32)
            if window > 1 else pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(meta, vyx, probe, off_x, off_y, idx_full, stacks2)


def flow_step_commit(adj2, off_x, off_y, is_y, window: int,
                     lh: int, lw: int):
    """XLA-side tail of the pallas step: nearest-upsample the block
    adjustment and commit it to the stepped axis (the kernel cannot
    element-repeat in VMEM; this is one cheap elementwise op)."""
    if window > 1:
        adj2 = jnp.repeat(jnp.repeat(adj2, window, 0),
                          window, 1)[:lh, :lw]
    return off_x + adj2 * (1 - is_y), off_y + adj2 * is_y


def index_field(key_b, vals, D):
    """uint8 table-index field: idx[p] = j where key_b[p] == vals[j]
    (XLA side; mirrors ops/warp._index_field without importing warp --
    flow must not depend on warp)."""
    def cond(c):
        return c[1] < D

    def body(c):
        idx, j = c
        return jnp.where(key_b == vals[j], j.astype(jnp.uint8), idx), j + 1

    idx0 = jnp.full(key_b.shape, 255, jnp.uint8)
    idx, _ = jax.lax.while_loop(cond, body, (idx0, jnp.int32(0)))
    return idx
