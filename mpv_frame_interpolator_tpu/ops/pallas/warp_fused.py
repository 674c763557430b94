"""Pallas TPU kernel: one FUSED blended warp output per launch.

The XLA composition of a blended output runs ~15 full-frame HBM passes
per blend position t even after round 3's shift decomposition and the
round-4 index-field hoist: two per-direction sample loops (dynamic
slice + masked select each), two chroma loops, the fixed-point blend,
the levels clip, and the NV12 re-interleave each stream the frame
through HBM because the while_loop boundaries block XLA fusion
(measured: 1.5 ms marginal per 4K output, ~25x the ~0.06 ms
speed-of-light for its ~37 MB of traffic; tools/warp_breakdown.py).

These kernels produce a finished output PLANE per launch -- sample both
directions, blend, clip, and (for chroma) interleave, all on the
VMEM-resident tile:

  * the grid tiles the output; per tile, per direction, a presence
    bitmask (prefetched to SMEM, computed once per PAIR from the
    t-independent low-res flow-index field) skips every distinct value
    that does not occur in the tile;
  * each PRESENT value costs one aligned async DMA of the displaced
    source window + two in-VMEM rotates (the warp_sample.py machinery)
    + one select against the resident uint8 index tile;
  * blend: acc = s12*w1 + s21*tw in int32 (wraparound == the uint32
    reference arithmetic, ops/warp._blend_fix), brought down with a
    LOGICAL right shift, then clipped to the default-levels cap --
    bit-exact with _blend_fix + _levels_y_rt's default branch.  The
    kernels are only selected under the runtime cond
    `ok & black==0 & white==255`; non-default levels take the XLA
    composition (same values, just slower);
  * chroma: u and v ride the stacked padded planes; the NV12
    interleave out[r, c] = sl[c & 1, r, c] is a lane-parity select, so
    the kernel emits the INTERLEAVED uv plane directly (u at even
    output columns reads even source columns, v odd -- the
    (newCx & ~1) + (cx & 1) addressing of warpFrameKernel.cl:171-176).

Reference: warpFrameKernel.cl:138-204 (sample) + the blending path of
vf_HopperRender.c; the shift decomposition is ARCHITECTURE.md section 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpv_frame_interpolator_tpu.ops.pallas.warp_sample import (
    _AX, _AY, _NW, _presence_masks)

_K = 96             # ops/warp._ROLL_K
_B = 255            # ops/warp._ROLL_B
_SPAN = 2 * _B + 2

TILE_Y = 512        # luma tile edge (multiple of 2**rs, rs <= 5)
TILE_CR = 256       # chroma tile rows
TILE_CC = 512       # chroma tile cols (interleaved uv domain)


def luma_grid(H: int, Wa: int):
    return -(-H // TILE_Y), -(-Wa // TILE_Y)


def chroma_grid(hc: int, Wa: int):
    return -(-hc // TILE_CR), -(-Wa // TILE_CC)


def pad_source_luma(padded, H: int, Wa: int):
    """Over-pad a (H+2B, Wa+2B) mirror-padded plane to the tile grid so
    every (tile + displacement) DMA window is in bounds."""
    nty, ntx = luma_grid(H, Wa)
    ph = nty * TILE_Y + 2 * _B + _AY
    pw = ntx * TILE_Y + 2 * _B + _AX
    return jnp.pad(padded, ((0, ph - padded.shape[0]),
                            (0, pw - padded.shape[1])))


def pad_source_chroma(padded2, hc: int, Wa: int):
    nty, ntx = chroma_grid(hc, Wa)
    ph = nty * TILE_CR + 2 * _B + _AY
    pw = ntx * TILE_CC + 2 * _B + _AX
    return jnp.pad(padded2, ((0, 0), (0, ph - padded2.shape[1]),
                             (0, pw - padded2.shape[2])))


def pad_index(idx, rows: int, cols: int):
    """Pad a uint8 index field to the tile grid with 255 (matches no
    table entry, so the overhang never selects; it is cropped away)."""
    return jnp.pad(idx, ((0, rows - idx.shape[0]),
                         (0, cols - idx.shape[1])),
                   constant_values=255)


def luma_masks(if_lo, H: int, Wa: int, rs: int):
    """Per-luma-tile presence bitmasks from the low-res flow-index
    field (t-independent: the index of a pixel's distinct flow value
    does not change with the blend position)."""
    nty, ntx = luma_grid(H, Wa)
    return _presence_masks(if_lo, nty, ntx, TILE_Y >> rs, TILE_Y >> rs)


def chroma_masks(if_lo, hc: int, Wa: int, rs: int):
    """Chroma-grid presence: interleaved chroma (r, c) reads
    if_lo[(r >> rs) << 1, ((c >> (rs+1)) << 1)] (ops/warp._upsample_uv),
    i.e. the [::2, ::2] subsample of the low-res field at
    (TILE_CR >> rs, TILE_CC >> (rs+1)) blocks."""
    nty, ntx = chroma_grid(hc, Wa)
    return _presence_masks(if_lo[::2, ::2], nty, ntx,
                           TILE_CR >> rs, TILE_CC >> (rs + 1))


def _sample_dir(t, ti, tj, T_r, T_c, vals_ref, masks_ref, dcount, idx32,
                acc, buf, sem, src_ref, chroma: bool):
    """Accumulate one direction's nearest samples into `acc` (select per
    present distinct value; absent values cost one scalar test)."""
    def body(k, carry):
        word = masks_ref[t * _NW + (k >> 5)]
        present = (word >> (k & 31)) & 1

        @pl.when((k < dcount) & (present == 1))
        def _():
            v = vals_ref[k]
            dy = v // _SPAN - _B
            dx = v % _SPAN - _B
            row = ti * T_r + dy + _B
            col = tj * T_c + dx + _B
            row_a = pl.multiple_of((row // _AY) * _AY, _AY)
            col_a = pl.multiple_of((col // _AX) * _AX, _AX)
            if chroma:
                cp = pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(row_a, T_r + _AY),
                               pl.ds(col_a, T_c + _AX)], buf, sem)
            else:
                cp = pltpu.make_async_copy(
                    src_ref.at[pl.ds(row_a, T_r + _AY),
                               pl.ds(col_a, T_c + _AX)], buf, sem)
            cp.start()
            cp.wait()
            val = buf[:].astype(jnp.int32)
            val = pltpu.roll(val, (T_r + _AY) - (row - row_a),
                             1 if chroma else 0)
            val = pltpu.roll(val, (T_c + _AX) - (col - col_a),
                             2 if chroma else 1)
            if chroma:
                # NV12 interleave: out column c takes plane c&1 at
                # column c (u even / v odd -- see module docstring)
                par = jax.lax.broadcasted_iota(jnp.int32, (T_r, T_c),
                                               1) & 1
                sel = jnp.where(par == 0, val[0, :T_r, :T_c],
                                val[1, :T_r, :T_c])
            else:
                sel = val[:T_r, :T_c]
            acc[:] = jnp.where(idx32 == k, sel, acc[:])
        return carry

    jax.lax.fori_loop(0, _K, body, 0)


def _make_kernel(ntx: int, T_r: int, T_c: int, frac: int, cap: int,
                 chroma: bool):
    def kernel(vals12_ref, vals21_ref, dw_ref, m12_ref, m21_ref,
               idx12_ref, idx21_ref, p1_ref, p2_ref, out_ref,
               s12, s21, buf, sem):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        t = ti * ntx + tj
        i12 = idx12_ref[:].astype(jnp.int32)
        i21 = idx21_ref[:].astype(jnp.int32)
        s12[:] = jnp.zeros_like(s12)
        s21[:] = jnp.zeros_like(s21)
        _sample_dir(t, ti, tj, T_r, T_c, vals12_ref, m12_ref, dw_ref[0],
                    i12, s12, buf, sem, p1_ref, chroma)
        _sample_dir(t, ti, tj, T_r, T_c, vals21_ref, m21_ref, dw_ref[1],
                    i21, s21, buf, sem, p2_ref, chroma)
        # fixed-point blend in int32: wraparound == the uint32 reference
        # arithmetic (_blend_fix), logical shift restores the quotient
        acc = s12[:] * dw_ref[2] + s21[:] * dw_ref[3]
        acc = jax.lax.shift_right_logical(acc, jnp.int32(frac))
        out_ref[:] = jnp.clip(acc, 0, cap).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("H", "Wa", "rs", "scale_shift", "chroma",
                              "interpret"))
def fused_blend_plane(p1t, p2t, idx12t, idx21t, vals12, vals21, dw,
                      m12, m21, H: int, Wa: int, rs: int,
                      scale_shift: int, chroma: bool,
                      interpret: bool = None):
    """One finished blended output plane (luma, or interleaved uv).

    p1t/p2t     tile-grid over-padded mirror-padded sources
                (pad_source_luma / pad_source_chroma)
    idx12t/21t  tile-grid padded uint8 flow-index fields (pad_index;
                the t-INDEPENDENT fields of ops/warp._sampler_prep)
    vals12/21   (K,) per-t packed displacement tables (int32)
    dw          (4,) int32 [D12, D21, w1, tw] -- live counts + the
                _blend_fix fixed-point weights for this t
    m12/m21     per-tile presence bitmasks (luma_masks / chroma_masks)

    Only valid under `ok & default levels` (the caller's cond; see
    module docstring).  H/Wa are the OUTPUT plane dims (hc, Wa for
    chroma).  Bit-exact with the XLA composition.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T_r, T_c = (TILE_CR, TILE_CC) if chroma else (TILE_Y, TILE_Y)
    nty, ntx = -(-H // T_r), -(-Wa // T_c)
    frac = 24 - (8 if scale_shift else 0)
    cap = 255 << scale_shift
    kernel = _make_kernel(ntx, T_r, T_c, frac, cap, chroma)
    buf_shape = ((2, T_r + _AY, T_c + _AX) if chroma
                 else (T_r + _AY, T_c + _AX))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec((T_r, T_c), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T_r, T_c), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((T_r, T_c), lambda i, j, *_: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((T_r, T_c), jnp.int32),
                pltpu.VMEM((T_r, T_c), jnp.int32),
                pltpu.VMEM(buf_shape, p1t.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nty * T_r, ntx * T_c), p1t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(vals12.astype(jnp.int32), vals21.astype(jnp.int32),
      dw.astype(jnp.int32), m12, m21, idx12t, idx21t, p1t, p2t)
    return out[:H, :Wa]


def blend_weights(t, scale_shift: int):
    """The _blend_fix fixed-point weights for one blend position."""
    frac = 24 - (8 if scale_shift else 0)
    tw = jnp.clip(jnp.round(t * (1 << frac)), 0,
                  1 << frac).astype(jnp.int32)
    return (1 << frac) - tw, tw


def blended_from_prep(geom, prep, t, scale_shift: int):
    """(out_y, interleaved out_uv) for one blend position, from the
    per-pair fused prep (ops/warp._sampler_prep(..., fused=True)).
    Caller guards with `prep["ok"] & default levels`."""
    from mpv_frame_interpolator_tpu.ops import warp as W
    H, Wa = geom.height, geom.actual_width
    hc, rs = H >> 1, geom.res_scalar
    fs12 = t.astype(jnp.float32)
    fs21 = (1.0 - t).astype(jnp.float32)

    def disp_table(table, y_scale, x_scale):
        vy, vx, good = table
        dy = jnp.clip(W._iround(vy * y_scale), -_B, _B)
        dx = jnp.clip(W._iround(vx * x_scale), -_B, _B)
        return jnp.where(good, (dy + _B) * _SPAN + (dx + _B),
                         jnp.int32(0x7FFFFFFF))

    v12 = disp_table(prep["t12"], fs12, fs12)
    v21 = disp_table(prep["t21"], -fs21, -fs21)
    v12c = disp_table(prep["t12"], fs12 * 0.5, fs12)
    v21c = disp_table(prep["t21"], -fs21 * 0.5, -fs21)
    w1, tw = blend_weights(t, scale_shift)
    dw = jnp.stack([prep["D12"], prep["D21"], w1, tw])
    y = fused_blend_plane(prep["P1T"], prep["P2T"], prep["IT12"],
                          prep["IT21"], v12, v21, dw, prep["M12"],
                          prep["M21"], H, Wa, rs, scale_shift,
                          chroma=False)
    uv = fused_blend_plane(prep["C1T"], prep["C2T"], prep["ITC12"],
                           prep["ITC21"], v12c, v21c, dw, prep["MC12"],
                           prep["MC21"], hc, Wa, rs, scale_shift,
                           chroma=True)
    return y, uv
