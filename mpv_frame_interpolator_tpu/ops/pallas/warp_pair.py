"""Pallas TPU kernel: the WHOLE pair's blended warp in two launches.

ops/pallas/warp_fused.py (round 3) fused one OUTPUT per launch and
measured even with the pair-level hoist: its per-(t, direction, present
value) cost is dominated by widening the DMA'd uint8 window to int32
and rotating that widened buffer twice (pltpu.roll only rotates 32-bit
lanes), ~4x the byte volume, repeated N times per pair with N separate
launch/stitch boundaries around it.

This kernel keeps the blend-position loop INSIDE (static N) and does
every shift/select in the PACKED domain: uint8 VMEM tiles are stored
(8,128)(4,1) -- four consecutive ROWS per 32-bit word -- so

  * a column shift is a plain lane roll of the int32 view (bit-exact,
    verified: tools/pallas_pack_probe.py),
  * a row shift is a word roll plus an intra-word byte rotate (two
    rolls + shift/or on one QUARTER the int32 volume),
  * the per-distinct-value select is a byte-wise equality mask from the
    carry-free zero detector ~(((x & 0x7f..) + 0x7f..) | x | 0x7f..)
    with x = idx ^ (j * 0x01010101), applied with and/or -- no widening
    of the index field or the samples anywhere in the sampling loop.

Samples stay packed bytes until the blend, which unpacks once per
(t, direction) instead of once per (t, direction, value).  The uint8
index tiles are loaded and packed ONCE per tile and reused by all N
blend positions; with the t loop inside there is exactly one luma and
one chroma launch per pair.

Semantics are BIT-IDENTICAL to the XLA shift path (same padded sources,
same displacement tables, same one-hot index select, `_blend_fix` +
default-levels clip + NV12 interleave); tests/test_warp_pair.py pins
equality, and the TPU parity suite re-proves it on hardware.  Only the
8-bit (NV12) blended path routes here; P010 keeps the shift path.

Reference: warpFrameKernel.cl:138-204 + the blending path of
vf_HopperRender.c (one kernel per output there; the reference GPU warp
is a per-pixel scattered write).  The shift decomposition is
ARCHITECTURE.md section 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpv_frame_interpolator_tpu.ops.pallas.warp_fused import (
    TILE_CC, TILE_CR, TILE_Y, blend_weights, chroma_grid, luma_grid)
from mpv_frame_interpolator_tpu.ops.pallas.warp_sample import (
    _AX, _AY, _NW)

_K = 96             # ops/warp._ROLL_K
_B = 255            # ops/warp._ROLL_B
_SPAN = 2 * _B + 2

def _byte_eq_mask(packed_idx_u32, j):
    """Full-byte mask (0xFF per matching byte) for idx == j, on the
    packed uint32 view of a uint8 index tile.  The zero detector is the
    carry-free form -- the masked add can never cross a byte -- so the
    mask is EXACT per byte (the classic (x-LO) & ~x & HI Mycroft form
    has false positives when a lower byte borrows)."""
    lo = jnp.uint32(0x01010101)
    seven = jnp.uint32(0x7F7F7F7F)
    x = packed_idx_u32 ^ (j.astype(jnp.uint32) * lo)
    m = ~(((x & seven) + seven) | x | seven)
    return jax.lax.shift_right_logical(m, jnp.uint32(7)) * jnp.uint32(0xFF)


def _packed_window(buf_ref, ry, rx, rows4: int, cols: int, chroma: bool):
    """The (rows4, cols) leading packed corner of the DMA buffer shifted
    up by ry rows and left by rx columns, entirely in the packed domain.
    buf_ref holds the ALIGNED (rows + _AY, cols + _AX) uint8 window
    ((2, ...) when chroma); ry in [0, _AY), rx in [0, _AX)."""
    ax_r = 1 if chroma else 0
    ax_c = 2 if chroma else 1
    pk = pltpu.bitcast(buf_ref[:], jnp.int32)
    nw = pk.shape[ax_r]                  # buffer rows / 4
    w = ry // 4
    b = ry % 4
    r1 = pltpu.roll(pk, nw - w, ax_r)
    r2 = pltpu.roll(pk, nw - w - 1, ax_r)
    sh = (8 * b).astype(jnp.uint32)
    u1 = pltpu.bitcast(r1, jnp.uint32)
    u2 = pltpu.bitcast(r2, jnp.uint32)
    merged = jnp.where(
        b == 0, u1,
        jax.lax.shift_right_logical(u1, sh)
        | jax.lax.shift_left(u2, jnp.uint32(32) - sh))
    nc = pk.shape[ax_c]
    merged = pltpu.roll(pltpu.bitcast(merged, jnp.int32), nc - rx, ax_c)
    if chroma:
        return pltpu.bitcast(merged[:, :rows4, :cols], jnp.uint32)
    return pltpu.bitcast(merged[:rows4, :cols], jnp.uint32)


def _sample_dir_packed(t, ti, tj, T_r, T_c, vals_ref, koff, masks_ref,
                       dcount, ipk, acc_ref, buf, sem, src_ref,
                       chroma: bool):
    """One direction's nearest samples for ONE blend position,
    accumulated as packed bytes into acc_ref ((T_r//4, T_c) int32)."""
    rows4 = T_r // 4

    def body(k, carry):
        word = masks_ref[t * _NW + (k >> 5)]
        present = (word >> (k & 31)) & 1

        @pl.when(present == 1)
        def _():
            v = vals_ref[koff + k]
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
            val = _packed_window(buf, row - row_a, col - col_a,
                                 rows4, T_c, chroma)
            if chroma:
                # NV12 interleave on the packed words: lanes carry
                # columns (the 4-row packing is per column), so output
                # column c takes plane c & 1 in one lane-parity select
                par = jax.lax.broadcasted_iota(
                    jnp.int32, (rows4, T_c), 1) & 1
                val = jnp.where(par == 0, val[0], val[1])
            bm = _byte_eq_mask(ipk, k)
            a = pltpu.bitcast(acc_ref[:], jnp.uint32)
            acc_ref[:] = pltpu.bitcast((a & ~bm) | (val & bm), jnp.int32)
        return carry

    # dynamic trip count: only the D live table entries iterate (a
    # static 0.._K loop costs ~40us of dead scalar iterations per tile
    # at the usual D of 1-3 -- it measured as most of the kernel's
    # fixed cost, tools/warp_pair_breakdown.py)
    jax.lax.fori_loop(0, dcount, body, 0)


def _make_kernel(ntx: int, T_r: int, T_c: int, n_out: int, frac: int,
                 chroma: bool):
    rows4 = T_r // 4

    def kernel(vals12_ref, vals21_ref, dw_ref, m12_ref, m21_ref,
               idx12_ref, idx21_ref, p1_ref, p2_ref, out_ref,
               s12, s21, buf, sem):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        t = ti * ntx + tj
        # index tiles packed ONCE, reused by every blend position
        ipk12 = pltpu.bitcast(pltpu.bitcast(idx12_ref[:], jnp.int32),
                              jnp.uint32)
        ipk21 = pltpu.bitcast(pltpu.bitcast(idx21_ref[:], jnp.int32),
                              jnp.uint32)
        zero = jnp.zeros((rows4, T_c), jnp.int32)
        for n in range(n_out):
            s12[:] = zero
            s21[:] = zero
            _sample_dir_packed(t, ti, tj, T_r, T_c, vals12_ref, n * _K,
                               m12_ref, dw_ref[0], ipk12, s12, buf, sem,
                               p1_ref, chroma)
            _sample_dir_packed(t, ti, tj, T_r, T_c, vals21_ref, n * _K,
                               m21_ref, dw_ref[1], ipk21, s21, buf, sem,
                               p2_ref, chroma)
            # unpack once per (t, direction); fixed-point blend in int32
            # (wraparound == the uint32 reference arithmetic of
            # _blend_fix), logical shift, default-levels clip
            a12 = pltpu.bitcast(s12[:], jnp.uint8).astype(jnp.int32)
            a21 = pltpu.bitcast(s21[:], jnp.uint8).astype(jnp.int32)
            acc = a12 * dw_ref[2 + 2 * n] + a21 * dw_ref[3 + 2 * n]
            acc = jax.lax.shift_right_logical(acc, jnp.int32(frac))
            out_ref[n] = jnp.clip(acc, 0, 255).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("H", "Wa", "rs", "chroma", "interpret"))
def pair_blend_plane(p1t, p2t, idx12t, idx21t, vals12, vals21, dw,
                     m12, m21, H: int, Wa: int, rs: int, chroma: bool,
                     interpret: bool = None):
    """ALL blend positions of one finished plane (luma, or interleaved
    uv) in one launch.

    p1t/p2t     tile-grid over-padded mirror-padded uint8 sources
                (warp_fused.pad_source_luma / pad_source_chroma)
    idx12t/21t  tile-grid padded uint8 flow-index fields
    vals12/21   (N*K,) int32: per-blend-position packed displacement
                tables, position-major
    dw          (2+2N,) int32 [D12, D21, w1_0, tw_0, w1_1, tw_1, ...]
    m12/m21     per-tile presence bitmasks (t-independent)

    Only valid under `ok & default levels & 8-bit` (the caller's cond).
    Returns (N, H, Wa).  Bit-exact with the XLA shift composition.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T_r, T_c = (TILE_CR, TILE_CC) if chroma else (TILE_Y, TILE_Y)
    nty, ntx = -(-H // T_r), -(-Wa // T_c)
    n_out = vals12.shape[0] // _K
    frac = 24
    kernel = _make_kernel(ntx, T_r, T_c, n_out, frac, chroma)
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
            out_specs=pl.BlockSpec((n_out, T_r, T_c),
                                   lambda i, j, *_: (0, i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((T_r // 4, T_c), jnp.int32),
                pltpu.VMEM((T_r // 4, T_c), jnp.int32),
                pltpu.VMEM(buf_shape, p1t.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, nty * T_r, ntx * T_c),
                                       p1t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(vals12.astype(jnp.int32), vals21.astype(jnp.int32),
      dw.astype(jnp.int32), m12, m21, idx12t, idx21t, p1t, p2t)
    return out[:, :H, :Wa]


def blended_pair_from_prep(geom, prep, ts, scale_shift: int):
    """(y batch (N, H, Wa), interleaved uv batch (N, hc, Wa)) for ALL
    blend positions, from the per-pair fused prep
    (ops/warp._sampler_prep(..., fused=True)).  Caller guards with
    `prep["ok"] & default levels`; 8-bit only (scale_shift == 0)."""
    from mpv_frame_interpolator_tpu.ops import warp as W
    assert scale_shift == 0
    H, Wa = geom.height, geom.actual_width
    hc, rs = H >> 1, geom.res_scalar
    fs12 = ts.astype(jnp.float32)            # (N,)
    fs21 = 1.0 - fs12

    def disp_tables(table, y_scale, x_scale):
        # (N, K) packed displacement tables by scalar math on the
        # per-pair distinct FLOW values (ops/warp._sample_all_planes)
        vy, vx, good = table
        dy = jnp.clip(W._iround(vy[None, :] * y_scale[:, None]), -_B, _B)
        dx = jnp.clip(W._iround(vx[None, :] * x_scale[:, None]), -_B, _B)
        packed = (dy + _B) * _SPAN + (dx + _B)
        return jnp.where(good[None, :], packed, jnp.int32(0x7FFFFFFF)
                         ).reshape(-1)

    v12 = disp_tables(prep["t12"], fs12, fs12)
    v21 = disp_tables(prep["t21"], -fs21, -fs21)
    v12c = disp_tables(prep["t12"], fs12 * 0.5, fs12)
    v21c = disp_tables(prep["t21"], -fs21 * 0.5, -fs21)
    w1, tw = blend_weights(fs12, scale_shift)          # (N,), (N,)
    dw = jnp.concatenate([
        jnp.stack([prep["D12"], prep["D21"]]),
        jnp.stack([w1, tw], axis=1).reshape(-1)])
    y = pair_blend_plane(prep["P1T"], prep["P2T"], prep["IT12"],
                         prep["IT21"], v12, v21, dw, prep["M12"],
                         prep["M21"], H, Wa, rs, chroma=False)
    uv = pair_blend_plane(prep["C1T"], prep["C2T"], prep["ITC12"],
                          prep["ITC21"], v12c, v21c, dw, prep["MC12"],
                          prep["MC21"], hc, Wa, rs, chroma=True)
    return y, uv
