#!/usr/bin/env python
"""On-device parity report: the running backend vs the NumPy oracle.

Runs the full flow+warp matrix on whatever JAX backend is active (TPU by
default in this environment) and prints a table of bit-exactness results --
the runnable counterpart of the golden test suite, for verifying the
*hardware* path rather than the CPU path.

Uses small frames so device->host transfers stay tiny (the CI sandbox's
relay chokes on large downloads; see CLAUDE.md).

    PYTHONPATH=.:$PYTHONPATH python tools/parity_report.py
"""

import sys

import numpy as np
import jax.numpy as jnp

from mpv_frame_interpolator_tpu.io import synthetic
from mpv_frame_interpolator_tpu.frame import split_chroma, interleave_chroma
from mpv_frame_interpolator_tpu.ops import oracle
from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry, make_flow_fn
from mpv_frame_interpolator_tpu.ops.warp import make_warp_fn

MODES = {0: "warp12", 1: "warp21", 2: "blend", 4: "grey",
         5: "sbs1", 6: "sbs2"}


def run():
    import jax
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    rows = []
    for (w, h, src, radius, t) in [
        (96, 64, "moving_box", 5, 0.4),
        (96, 64, "gradient_pan", 16, 0.75),
        (320, 180, "moving_box", 8, 0.5),    # res_scalar >= 1
        (128, 544, "gradient_pan", 11, 0.3),  # res_scalar 2, tall
    ]:
        cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
        gen = getattr(synthetic, src)(cfg, 2)
        f1, f2 = next(gen), next(gen)
        geom = FlowGeometry.create(h, w, w)
        u1, v1 = split_chroma(f1.uv)
        u2, v2 = split_chroma(f2.uv)
        a = [jnp.asarray(x) for x in (f1.y, u1, v1, f2.y, u2, v2)]

        off_ref, blur_ref = oracle.calculate_optical_flow(
            f1.y, f1.uv, f2.y, f2.uv, search_radius=radius,
            res_scalar=geom.res_scalar, lh=geom.low_h, lw=geom.low_w)
        off_dev, blur_dev = make_flow_fn(geom, radius)(
            *a, jnp.int32(8), jnp.int32(6))
        flow_ok = np.array_equal(off_ref.astype(np.int32),
                                 np.asarray(off_dev))
        rows.append((f"flow {w}x{h} {src} r{radius}", flow_ok))

        for mode, name in MODES.items():
            ry, ruv = oracle.warp_frame(
                f1.y, f1.uv, f2.y, f2.uv, blur_ref, t, mode,
                geom.res_scalar, geom.actual_width)
            y, u, v = make_warp_fn(geom, mode)(
                *a, jnp.asarray(blur_ref.astype(np.int32)),
                jnp.float32(t), jnp.float32(0.0), jnp.float32(255.0))
            ok = (np.array_equal(ry, np.asarray(y)) and
                  np.array_equal(ruv, interleave_chroma(np.asarray(u),
                                                        np.asarray(v))))
            rows.append((f"warp {w}x{h} {name} t={t}", ok))

    width = max(len(r[0]) for r in rows) + 2
    fails = 0
    for name, ok in rows:
        print(f"{name:<{width}} {'BIT-EXACT' if ok else 'MISMATCH'}")
        fails += 0 if ok else 1
    print(f"\n{len(rows) - fails}/{len(rows)} bit-exact vs oracle")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(run())
