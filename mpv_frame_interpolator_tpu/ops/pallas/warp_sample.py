"""Pallas TPU kernel: tiled shift-decomposed warp sampling.

The XLA shift sampler (ops/warp._shift_sample) runs one full-frame
dynamic-slice + masked select per DISTINCT displacement: with D distinct
values it streams ~D x (slice + index-field + accumulator) through HBM,
even though any given PIXEL only ever takes one of them.  Real flow
fields are spatially coherent -- the uint8 index field is block-constant
at 2^rs granularity and a 512x512 output tile typically contains one or
two distinct values -- so almost all of that traffic selects nothing.

This kernel tiles the output grid and skips, per tile, every
displacement that does not occur inside the tile:

  * the (lh, lw) LOW-RES index field is reduced on the XLA side to a
    per-tile presence bitmask (3 uint32 words cover the _ROLL_K = 96
    value budget) and scalar-prefetched into SMEM;
  * the padded source stays in HBM; each PRESENT value costs one async
    DMA of the (T, T) tile at its displacement into VMEM scratch plus
    one VPU select against the tile's resident uint8 index block;
  * absent values cost one scalar bitmask test.

Expected traffic per direction falls from ~D x frame to ~(1 + avg
present-per-tile) x frame.  Semantics are BIT-IDENTICAL to
_shift_sample (same tables, same index field, same padded source; the
per-tile skip changes which selects run, never their values).

The reference computes this warp as a per-pixel scattered write
(video/filter/HopperRender/Kernels/warpFrameKernel.cl:138-204); the
shift decomposition itself is ARCHITECTURE.md section 3's redesign, and
this kernel is its tiled TPU form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512          # output tile edge; must be a multiple of 2**res_scalar
_K = 96             # distinct-displacement budget (ops/warp._ROLL_K)
_B = 255            # padding bound (ops/warp._ROLL_B)
_SPAN = 2 * _B + 2  # displacement pack span (ops/warp._shift_sample)
_NW = (_K + 31) // 32   # bitmask words per tile


def _presence_masks(idx_lo, nty: int, ntx: int, bh: int, bw: int):
    """(nty*ntx*_NW,) int32 presence bitmasks from the LOW-RES index
    field: bit j of word w of tile t is set iff value 32*w+j occurs in
    tile t.  Runs on the XLA side at low res (<= 270x480), so its cost
    is table work, not frame work."""
    # idx_lo derives from the PADDED stride, so it can overhang the tile
    # grid; the overhang is never read by the full-res upsample (which
    # crops to [:H, :W]), so dropping it cannot lose a present value
    idx_lo = idx_lo[:nty * bh, :ntx * bw]
    lo = jnp.full((nty * bh, ntx * bw), 255, jnp.uint8)
    lo = jax.lax.dynamic_update_slice(lo, idx_lo, (0, 0))
    blocks = lo.reshape(nty, bh, ntx, bw)
    pres = (blocks[:, :, :, :, None]
            == jnp.arange(_K, dtype=jnp.uint8)).any(axis=(1, 3))
    w32 = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    words = jnp.stack(
        [(pres[..., 32 * w:32 * (w + 1)].astype(jnp.uint32) * w32).sum(
            axis=-1, dtype=jnp.uint32) for w in range(_NW)], axis=-1)
    # transpose tile-major: masks[(i*ntx + j)*_NW + w]
    return words.reshape(nty * ntx * _NW).astype(jnp.int32)


# DMA source offsets must be divisible by the memref tiling (sublane x
# lane; 32 rows covers every packed dtype, 128 lanes always).  Arbitrary
# displacements therefore DMA an ALIGNED (T+_AY, T+_AX) window and
# rotate the sub-tile residual in VMEM (tpu dynamic_rotate), then take
# the leading (T, T) corner.
_AY = 32
_AX = 128


def _make_kernel(ntx: int, T: int):
    def kernel(vals_ref, masks_ref, d_ref, idx_ref, padded_ref, out_ref,
               scratch, sem):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        t = ti * ntx + tj
        out_ref[:] = jnp.zeros_like(out_ref[:])
        # widen once: 8-bit VPU compares are unsupported on this target
        idx32 = idx_ref[:].astype(jnp.int32)

        def body(k, carry):
            word = masks_ref[t * _NW + (k >> 5)]
            present = (word >> (k & 31)) & 1

            @pl.when((k < d_ref[0]) & (present == 1))
            def _():
                v = vals_ref[k]
                dy = v // _SPAN - _B
                dx = v % _SPAN - _B
                row = ti * T + dy + _B
                col = tj * T + dx + _B
                row_a = pl.multiple_of((row // _AY) * _AY, _AY)
                col_a = pl.multiple_of((col // _AX) * _AX, _AX)
                cp = pltpu.make_async_copy(
                    padded_ref.at[pl.ds(row_a, T + _AY),
                                  pl.ds(col_a, T + _AX)],
                    scratch, sem)
                cp.start()
                cp.wait()
                # bring residual (ry, rx) to the origin: circular shift
                # by size-residual; the wrapped tail lands beyond row T.
                # Mosaic only rotates 32-bit lanes, so widen for the two
                # rolls (pure VPU work on the resident tile)
                val = scratch[:, :].astype(jnp.int32)
                val = pltpu.roll(val, (T + _AY) - (row - row_a), 0)
                val = pltpu.roll(val, (T + _AX) - (col - col_a), 1)
                out_ref[:] = jnp.where(idx32 == k,
                                       val[:T, :T].astype(out_ref.dtype),
                                       out_ref[:])
            return carry

        jax.lax.fori_loop(0, _K, body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("out_h", "out_w", "rs", "interpret"))
def shift_sample_pallas(padded, idx_full, idx_lo, vals, D,
                        out_h: int, out_w: int, rs: int,
                        interpret: bool = None):
    """Tiled-skip equivalent of ops.warp._shift_sample.

    padded    (out_h+2B, out_w+2B) mirror-padded source (uint8/uint16)
    idx_full  (out_h, out_w) uint8 table-index field (_index_field
              nearest-upsampled)
    idx_lo    (lh, lw) uint8 LOW-RES index field (pre-upsample); the
              nearest upsample means full-res pixel (y, x) reads
              idx_lo[y>>rs, x>>rs], so per-tile presence is exact
    vals, D   (_K,) packed displacement table + live count
    rs        geom.res_scalar (TILE must be a multiple of 2**rs)

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = TILE
    assert T % (1 << rs) == 0
    nty = -(-out_h // T)
    ntx = -(-out_w // T)
    # over-pad to the tile grid so every (tile + displacement) DMA
    # window is in bounds: starts range over [0, (n-1)*T + 2B] and the
    # aligned window extends (T + align) past the aligned-down start.
    # The overhang is beyond out_h/out_w and never selected.
    ph = nty * T + 2 * _B + _AY
    pw = ntx * T + 2 * _B + _AX
    padded_p = jnp.pad(padded, ((0, ph - padded.shape[0]),
                                (0, pw - padded.shape[1])))
    masks = _presence_masks(idx_lo, nty, ntx, T >> rs, T >> rs)
    out = pl.pallas_call(
        _make_kernel(ntx, T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec((T, T), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                # the padded source MUST stay in HBM: it is DMA'd at
                # arbitrary (dy, dx) offsets, and a VMEM placement would
                # need sublane-aligned slices (Mosaic rejects the
                # unaligned dynamic memref_slice); HBM is untiled
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((T, T), lambda i, j, *_: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((T + _AY, T + _AX), padded.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nty * T, ntx * T), padded.dtype),
        interpret=interpret,
    )(vals.astype(jnp.int32), masks, jnp.reshape(D, (1,)).astype(jnp.int32),
      idx_full, padded_p)
    return out[:out_h, :out_w]
