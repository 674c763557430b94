"""Pallas TPU kernel: one ENTIRE flow pyramid step in VMEM.

The XLA scan-branch form of a pyramid step (ops/flow._make_step_branch)
is a dozen separate HBM-resident ops: the phase-decomposed candidate
sampling writes a (layers, lh, lw) delta tensor to HBM, then the bias
terms, window block sums, argmin and commit each stream it (plus
friends) back through HBM.  At the ~270x480 low-res cap those tensors
are small (4-8 MB) but the step runs 16x per pair, and the honest
measurement says the per-step FIXED machinery -- not the candidate
slicing -- is half the flow budget (tools/flow_breakdown.py).

This kernel executes the whole step SELF-CONTAINED with everything
resident in VMEM:

  * distinct-pair extraction + the shift-path eligibility gates run
    in-kernel over the resident committed field (the XLA form's
    stride-window subsample existed to cut HBM traffic, which a
    VMEM-resident field does not pay; same value set by
    block-constancy, so vals/D/exceeded are bit-identical) -- the
    kernel outputs a `valid` flag and the XLA cond takes the compiled
    gather fallback when it is 0, exactly like the XLA shift path;
  * candidate fetch: ONE rank-3 async DMA per (distinct offset j,
    layer l) brings that candidate's y/u/v planes from the
    mirror-pre-padded phase stack in HBM -- double-buffered so the VPU
    work hides the copies;
  * DMA windows are aligned down to the (32, 128) memref tiling and the
    sub-tile residual is brought to the origin with two in-VMEM rotates
    (same trick as ops/pallas/warp_sample.py);
  * SAD deltas |y1-y2|+|u1-u2|+|v1-v2| accumulate into a (layers, lh,
    lw) VMEM scratch, selected per distinct offset by comparing the
    resident key field against the offset's packed key;
  * the commit phase runs per ACTIVE layer (a dynamic fori_loop over
    the traced radius; masked layers are never touched, matching the
    XLA form's 0xFFFFFFFF masking): offset bias, neighbor bias (static
    clamped shifts of the committed field), window block sums, and a
    running first-minimum argmin -- all without touching HBM;
  * the winner's signed-square adjustment returns at BLOCK resolution
    and the XLA side upsamples + commits it (flow_step_commit).

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
                 luma_shift: int, acc_dtype, K: int,
                 packed: bool = False):
    """Kernel body for one static (window, nb) pyramid-step branch.

    packed=True (uint8 stacks only) rotates each DMA'd candidate's
    sub-tile residual in the PACKED byte domain (ops/pallas/warp_pair's
    trick: uint8 VMEM tiles store 4 consecutive rows per 32-bit word,
    so a row shift is a word roll + an intra-word byte rotate and a
    column shift is a lane roll of the int32 view) instead of widening
    the whole (3, wr, wc) buffer to int32 first -- ~4x less vector work
    on the rotation, and the int32 widen then touches only the (lh, lw)
    payload.  Bit-exact: the payload rows/cols never wrap (ry < 32,
    rx < 128, and the buffer is tile-rounded past the payload)."""
    m = s - 1
    w2 = 2 * window
    nwy, nwx = -(-lh // window), -(-lw // window)
    wr, wc = _win_dims(lh, lw)     # tile-aligned DMA window
    R = 1 << 11                    # distinct-key pack radius
    max_adj = (layers // 2) ** 2

    def kernel(meta_ref, probe_ref, offx_ref, offy_ref,
               stacks_ref, adj_ref, valid_ref, cand, acc, bsum, vals_s,
               sem):
        is_y = meta_ref[0]
        radius = meta_ref[1]
        ds = meta_ref[2]
        nbs = meta_ref[3]
        BIG = jnp.int32(0x7FFFFFFF)

        offx = offx_ref[:]
        offy = offy_ref[:]

        # ---- distinct-pair extraction, gates (all VMEM-resident; the
        # XLA form subsampled to cut HBM cost, which a resident field
        # does not pay -- the value SET is identical by the committed
        # field's block-constancy, so vals/D/exceeded are bit-identical
        # to ops/flow._distinct_base_offsets) ----
        key = ((jnp.clip(offy, -R, R - 1) + R) * (2 * R)
               + (jnp.clip(offx, -R, R - 1) + R))
        max_key = jnp.max(key)
        last = jnp.int32(-1)
        D = jnp.int32(0)
        for j_static in range(K):
            nxt = jnp.min(jnp.where(key > last, key, BIG))
            vals_s[j_static] = nxt
            D = D + (nxt < BIG).astype(jnp.int32)
            last = nxt
        exceeded = max_key > last
        mag = jnp.maximum(jnp.max(jnp.abs(offx)), jnp.max(jnp.abs(offy)))
        valid = ((~exceeded) & (mag + max_adj <= (Bl << rs) - 1)
                 & (mag < R))
        valid_ref[0] = valid.astype(jnp.int32)
        n_dma = jnp.where(valid, D * radius, 0)

        def dma_parts(t):
            j = t // radius
            l = t % radius
            rel = l - radius // 2          # l < radius always
            adj = _signed_square(rel)
            v = vals_s[j]
            oy = (v // (2 * R) - R) + adj * is_y
            ox = (v % (2 * R) - R) + adj * (1 - is_y)
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
        y2 = probe_ref[0].astype(jnp.int32)
        u2 = probe_ref[1].astype(jnp.int32)
        v2 = probe_ref[2].astype(jnp.int32)

        @pl.when(n_dma > 0)
        def _():
            start(0, 0)

        def body(t, carry):
            slot = t % 2

            @pl.when(t + 1 < n_dma)
            def _():
                start(t + 1, (t + 1) % 2)

            get_dma(t, slot).wait()
            _, _, _, ry, rx, j, l = dma_parts(t)
            if packed:
                # byte-domain residual rotation: word roll + intra-word
                # byte rotate on the (3, wr//4, wc) int32 view, then
                # widen ONLY the payload for the SAD (same merge as
                # ops/pallas/warp_pair._packed_window, hardware-proven
                # bit-exact there)
                pk = pltpu.bitcast(cand[slot], jnp.int32)
                nw = pk.shape[1]
                w = ry // 4
                b = ry % 4
                r1 = pltpu.roll(pk, nw - w, 1)
                r2 = pltpu.roll(pk, nw - w - 1, 1)
                sh = (8 * b).astype(jnp.uint32)
                u1 = pltpu.bitcast(r1, jnp.uint32)
                u2c = pltpu.bitcast(r2, jnp.uint32)
                merged = jnp.where(
                    b == 0, u1,
                    jax.lax.shift_right_logical(u1, sh)
                    | jax.lax.shift_left(u2c, jnp.uint32(32) - sh))
                merged = pltpu.roll(pltpu.bitcast(merged, jnp.int32),
                                    wc - rx, 2)
                v8 = pltpu.bitcast(merged, jnp.uint8)
                d = (jnp.abs(v8[0, :lh, :lw].astype(jnp.int32) - y2)
                     + jnp.abs(v8[1, :lh, :lw].astype(jnp.int32) - u2)
                     + jnp.abs(v8[2, :lh, :lw].astype(jnp.int32) - v2)
                     ).astype(acc_dtype)
            else:
                # rotate the sub-tile residual to the origin (32-bit
                # lanes; P010's uint16 stacks don't pack 4-per-word)
                v = cand[slot].astype(jnp.int32)
                v = pltpu.roll(v, wr - ry, 1)
                v = pltpu.roll(v, wc - rx, 2)
                d = (jnp.abs(v[0, :lh, :lw] - y2)
                     + jnp.abs(v[1, :lh, :lw] - u2)
                     + jnp.abs(v[2, :lh, :lw] - v2)).astype(acc_dtype)
            prev = acc[pl.ds(l, 1)][0]
            acc[pl.ds(l, 1)] = jnp.where(key == vals_s[j], d, prev)[None]
            return carry

        jax.lax.fori_loop(0, n_dma, body, 0)

        # ---- commit phase: bias + window sums + first-min argmin ----
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
        _, bidx = jax.lax.fori_loop(0, jnp.where(valid, radius, 0),
                                    commit_body, best0)

        # BLOCK-resolution adjustment; the nearest upsample + commit add
        # happen on the XLA side (pltpu.repeat TILES rather than
        # element-repeats, so the upsample cannot run in-kernel; the
        # (nwy, nwx) output keeps the extra HBM round trip tiny)
        adj_ref[:] = _signed_square(bidx - radius // 2)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("lh", "lw", "s", "rs", "Bl", "window",
                              "nb_enabled", "layers", "luma_shift", "K",
                              "interpret"))
def flow_step_pallas(stacks2, probe, off_x, off_y, meta,
                     lh: int, lw: int, s: int, rs: int, Bl: int,
                     window: int, nb_enabled: bool, layers: int,
                     luma_shift: int, K: int = 12,
                     interpret: bool = None):
    """One whole pyramid step, SELF-CONTAINED: the kernel extracts the
    distinct-pair table, evaluates the shift-path eligibility gates,
    samples, and commits -- the XLA side contributes only the fallback
    cond and the block-adjustment upsample.

    stacks2   (s*s*3, PHp, PWp) flattened phase stack
              (pad_stacks_for_pallas)
    probe     (3, lh, lw) int16 (int32 when luma_shift) f2 probe samples
    off_x/y   (lh, lw) int32 committed field entering the step
    meta      (4,) int32 [is_y, radius, delta_scalar, nb_scalar]
    K         distinct-pair budget (ops/flow._FLOW_K)

    Returns (adj2 (nwy, nwx) int32, valid (1,) int32).  When valid == 0
    the field failed the shift-path gates (distinct count > K or
    magnitude beyond the padding/pack bounds) and adj2 is meaningless --
    the caller must take its gather fallback, exactly like the XLA
    shift path's `ok` cond.  Otherwise commit via flow_step_commit.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    acc_dtype = jnp.int32 if luma_shift else jnp.int16
    wr, wc = _win_dims(lh, lw)
    import os as _os
    packed = (stacks2.dtype == jnp.uint8
              and _os.environ.get("MFI_FLOW_PACKED_ROLL", "1") != "0")
    kernel = _make_kernel(lh, lw, s, rs, Bl, window, nb_enabled, layers,
                          luma_shift, acc_dtype, K, packed=packed)
    nwy, nwx = -(-lh // window), -(-lw // window)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # meta
            pl.BlockSpec(memory_space=pltpu.VMEM),     # probe
            pl.BlockSpec(memory_space=pltpu.VMEM),     # off_x
            pl.BlockSpec(memory_space=pltpu.VMEM),     # off_y
            pl.BlockSpec(memory_space=pltpu.HBM),      # stacks2
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((nwy, nwx), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, wr, wc), stacks2.dtype),
            pltpu.VMEM((layers, lh, lw), acc_dtype),
            pltpu.VMEM((nwy * window, nwx * window), jnp.int32)
            if window > 1 else pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the default 16MB scoped-vmem budget is within 0.5% of this
        # kernel's stack use at the 270x480 geometry (measured: a
        # standalone jit of one step OOM'd by 76KB when XLA picked a
        # different layout); raise it well clear -- scratch+stack is
        # ~12MB against v5e's 128MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(meta, probe, off_x, off_y, stacks2)


def flow_step_commit(adj2, off_x, off_y, is_y, window: int,
                     lh: int, lw: int):
    """XLA-side tail of the pallas step: nearest-upsample the block
    adjustment and commit it to the stepped axis (the kernel cannot
    element-repeat in VMEM; this is one cheap elementwise op)."""
    if window > 1:
        adj2 = jnp.repeat(jnp.repeat(adj2, window, 0),
                          window, 1)[:lh, :lw]
    return off_x + adj2 * (1 - is_y), off_y + adj2 * is_y


