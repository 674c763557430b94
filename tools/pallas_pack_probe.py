#!/usr/bin/env python
"""Probe the packed-int32 tile primitives the whole-pair warp kernel
wants (ops/pallas/warp_pair.py): uint8 tiles are stored (8,128)(4,1) --
4 consecutive ROWS packed per 32-bit word -- so shifting/selecting in
the packed domain is ~4x less vector work than widening each byte to
int32 (what warp_sample/warp_fused do today, and their dominant cost).

  b32   pltpu.bitcast uint8 (4r, c) -> int32 (r, c): row-quad packing?
  colroll  packed lane roll == per-column uint8 shift?
  rowroll  packed row shift: word roll + intra-word byte rotate
  bytesel  byte-wise equality select via uint32 bit ops
  rep8  jnp.repeat-style x8 nearest upsample of a low-res tile in VMEM

    PYTHONPATH=.:/root/.axon_site python tools/pallas_pack_probe.py
"""

import sys

import numpy as np


def run_kernel(name, kernel, out_shape, out_dtype, *args):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        )(*args)
        return np.asarray(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    R, C = 128, 256
    rng = np.random.RandomState(0)
    a8 = rng.randint(0, 256, (R, C), dtype=np.uint8)
    aj = jnp.asarray(a8)

    # --- 1. bitcast packing ---------------------------------------------
    def k_b32(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int32)

    out = run_kernel("b32", k_b32, (R // 4, C), np.int32, aj)
    if out is not None:
        # hypothesis: word (r, c) = rows 4r..4r+3 of column c, little end
        want = (a8[0::4].astype(np.uint32)
                | (a8[1::4].astype(np.uint32) << 8)
                | (a8[2::4].astype(np.uint32) << 16)
                | (a8[3::4].astype(np.uint32) << 24)).astype(np.int32)
        print("b32: row-quad little-endian:",
              np.array_equal(out, want), flush=True)
        if not np.array_equal(out, want):
            print("  sample got ", out[:2, :2].tolist())
            print("  sample want", want[:2, :2].tolist())

    # --- 2. packed column roll ------------------------------------------
    def k_colroll(x_ref, o_ref):
        p = pltpu.bitcast(x_ref[:], jnp.int32)
        o_ref[:] = pltpu.roll(p, 5, 1)

    out = run_kernel("colroll", k_colroll, (R // 4, C), np.int32, aj)
    if out is not None:
        shifted = np.roll(a8, 5, axis=1)
        want = (shifted[0::4].astype(np.uint32)
                | (shifted[1::4].astype(np.uint32) << 8)
                | (shifted[2::4].astype(np.uint32) << 16)
                | (shifted[3::4].astype(np.uint32) << 24)).astype(np.int32)
        print("colroll: packed lane roll == column shift:",
              np.array_equal(out, want), flush=True)

    # --- 3. packed row shift (word roll + byte rotate) -------------------
    def k_rowroll(x_ref, s_ref, o_ref):
        p = pltpu.bitcast(x_ref[:], jnp.int32)
        ry = s_ref[0, 0]
        w = ry // 4          # whole-word row shift
        b = ry % 4           # intra-word byte rotate
        r1 = pltpu.roll(p, -w, 0)        # rows move UP by w words
        r2 = pltpu.roll(p, -(w + 1), 0)
        sh = (8 * b).astype(jnp.uint32)
        lo = jax.lax.shift_right_logical(
            pltpu.bitcast(r1, jnp.uint32), sh)
        hi = jnp.where(
            b == 0, jnp.uint32(0),
            jax.lax.shift_left(
                pltpu.bitcast(r2, jnp.uint32),
                jnp.uint32(32) - sh))
        o_ref[:] = pltpu.bitcast(lo | hi, jnp.int32)

    sref = jnp.full((1, 1), 7, jnp.int32)
    out = run_kernel("rowroll", k_rowroll, (R // 4, C), np.int32, aj, sref)
    if out is not None:
        shifted = np.roll(a8, -7, axis=0)
        want = (shifted[0::4].astype(np.uint32)
                | (shifted[1::4].astype(np.uint32) << 8)
                | (shifted[2::4].astype(np.uint32) << 16)
                | (shifted[3::4].astype(np.uint32) << 24)).astype(np.int32)
        print("rowroll: word roll + byte rotate == row shift by 7:",
              np.array_equal(out, want), flush=True)

    # --- 4. byte-wise equality select ------------------------------------
    idx8 = rng.randint(0, 3, (R, C), dtype=np.uint8)
    val8 = rng.randint(0, 256, (R, C), dtype=np.uint8)

    def k_bytesel(i_ref, v_ref, a_ref, o_ref):
        ip = pltpu.bitcast(i_ref[:], jnp.uint32)
        vp = pltpu.bitcast(v_ref[:], jnp.uint32)
        ap = pltpu.bitcast(a_ref[:], jnp.uint32)
        j = jnp.uint32(1)
        x = ip ^ (j * jnp.uint32(0x01010101))
        # EXACT per-byte zero detector (carry-free: the masked add never
        # crosses a byte): 0x80 in each byte of x that is zero
        seven = jnp.uint32(0x7F7F7F7F)
        m = ~(((x & seven) + seven) | x | seven)
        # expand to full-byte mask: (m >> 7) * 0xff
        bm = jax.lax.shift_right_logical(m, jnp.uint32(7)) * jnp.uint32(0xFF)
        o_ref[:] = pltpu.bitcast((ap & ~bm) | (vp & bm), jnp.int32)

    acc8 = rng.randint(0, 256, (R, C), dtype=np.uint8)
    out = run_kernel("bytesel", k_bytesel, (R // 4, C), np.int32,
                     jnp.asarray(idx8), jnp.asarray(val8),
                     jnp.asarray(acc8))
    if out is not None:
        sel = np.where(idx8 == 1, val8, acc8)
        want = (sel[0::4].astype(np.uint32)
                | (sel[1::4].astype(np.uint32) << 8)
                | (sel[2::4].astype(np.uint32) << 16)
                | (sel[3::4].astype(np.uint32) << 24)).astype(np.int32)
        print("bytesel: packed where(idx==1, val, acc):",
              np.array_equal(out, want), flush=True)

    # --- 5. x8 nearest upsample in VMEM ----------------------------------
    lo8 = rng.randint(0, 96, (16, 32), dtype=np.uint8)

    def k_rep8(x_ref, o_ref):
        x = x_ref[:].astype(jnp.int32)
        x = jnp.repeat(x, 8, axis=0)
        x = jnp.repeat(x, 8, axis=1)
        o_ref[:] = x

    out = run_kernel("rep8", k_rep8, (128, 256), np.int32,
                     jnp.asarray(lo8))
    if out is not None:
        want = np.repeat(np.repeat(lo8.astype(np.int32), 8, 0), 8, 1)
        print("rep8: jnp.repeat x8 both axes:",
              np.array_equal(out, want), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
