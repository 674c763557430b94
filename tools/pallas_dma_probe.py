#!/usr/bin/env python
"""Probe: which (start alignment, size alignment, dtype) combinations
does a dynamic-offset HBM->VMEM async DMA accept on this toolchain?

The warp kernels (ops/pallas/warp_sample.py, warp_fused.py) assume DMA
starts must be (32, 128)-aligned and pay two full-buffer int32 rolls per
(t, direction, present value) to fix the residual -- the dominant cost
of the fused warp (ARCHITECTURE section 3).  flow_step.py observed
"unaligned sizes crash the Mosaic lowering... like unaligned starts",
but it never recorded WHICH memory space / dims.  If HBM (untiled)
sources accept arbitrary starts, the rolls are unnecessary and the
whole-pair warp kernel gets ~10x cheaper on the VPU.

    PYTHONPATH=.:/root/.axon_site python tools/pallas_dma_probe.py
"""

import sys

import numpy as np


def probe(dtype, dy, dx, rows, cols):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = 512, 1024

    def kernel(off_ref, src_ref, out_ref, buf, sem):
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(off_ref[0], rows), pl.ds(off_ref[1], cols)],
            buf, sem)
        cp.start()
        cp.wait()
        out_ref[:] = buf[:]

    src = (np.arange(H * W, dtype=np.int64) % 251).astype(dtype)
    src = jnp.asarray(src.reshape(H, W))
    try:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((rows, cols), lambda *_: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, cols), src.dtype),
                                pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((rows, cols), src.dtype),
        )(jnp.array([dy, dx], jnp.int32), src)
        got = np.asarray(out[:2, :8])
        want = np.asarray(src[dy:dy + 2, dx:dx + 8])
        ok = np.array_equal(got, want) and np.array_equal(
            np.asarray(out[-1:, -8:]),
            np.asarray(src[dy + rows - 1:dy + rows, dx + cols - 8:dx + cols]))
        return "OK  " if ok else "WRONG"
    except Exception as e:  # noqa: BLE001
        return f"FAIL {type(e).__name__}: {str(e)[:80]}"


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    cases = [
        # (dtype, dy, dx, rows, cols)  -- starts first
        (np.uint8, 32, 128, 128, 256),    # fully aligned control
        (np.uint8, 37, 128, 128, 256),    # sublane-unaligned start
        (np.uint8, 32, 131, 128, 256),    # lane-unaligned start
        (np.uint8, 37, 131, 128, 256),    # both unaligned
        (np.int32, 37, 131, 128, 256),    # 32-bit, both unaligned
        (np.uint16, 37, 131, 128, 256),   # 16-bit, both unaligned
        (np.uint8, 37, 131, 100, 200),    # unaligned sizes too
    ]
    for dtype, dy, dx, rows, cols in cases:
        r = probe(dtype, dy, dx, rows, cols)
        print(f"{np.dtype(dtype).name:7s} start=({dy:3d},{dx:3d}) "
              f"size=({rows},{cols}): {r}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
