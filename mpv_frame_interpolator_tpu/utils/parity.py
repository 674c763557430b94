"""On-device oracle-parity checks, runnable on any active JAX backend.

The golden test suite proves bit-exactness on CPU; this module re-proves
it on whatever backend is live (the TPU in production) so hardware or
compiler drift is caught automatically.  bench.py runs a small smoke
subset every round (VERDICT r1 item 9); tools/parity_report.py runs the
full matrix.

Frames are kept small so device->host downloads stay tiny (the CI
sandbox's relay chokes on large transfers; see CLAUDE.md).
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

import numpy as np
import jax.numpy as jnp

# (width, height, synthetic source, search radius, blend t)
FULL_CASES = [
    (96, 64, "moving_box", 5, 0.4),
    (96, 64, "gradient_pan", 16, 0.75),
    (320, 180, "moving_box", 8, 0.5),     # res_scalar >= 1
    (128, 544, "gradient_pan", 11, 0.3),  # res_scalar 2, tall
]
SMOKE_CASES = FULL_CASES[:2]

MODE_NAMES = {0: "warp12", 1: "warp21", 2: "blend", 4: "grey",
              5: "sbs1", 6: "sbs2"}


def run_parity(cases: Iterable[tuple] = SMOKE_CASES,
               modes: Iterable[int] = (0, 2)) -> List[Tuple[str, bool]]:
    """Compare device flow+warp against the NumPy oracle; returns
    [(case name, bit_exact), ...]."""
    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.frame import split_chroma, interleave_chroma
    from mpv_frame_interpolator_tpu.ops import oracle
    from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry, make_flow_fn
    from mpv_frame_interpolator_tpu.ops.warp import make_warp_fn

    rows: List[Tuple[str, bool]] = []
    for (w, h, src, radius, t) in cases:
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
        off_dev, _ = make_flow_fn(geom, radius)(*a, jnp.int32(8),
                                                jnp.int32(6))
        flow_ok = np.array_equal(off_ref.astype(np.int32),
                                 np.asarray(off_dev))
        rows.append((f"flow {w}x{h} {src} r{radius}", flow_ok))

        for mode in modes:
            ry, ruv = oracle.warp_frame(
                f1.y, f1.uv, f2.y, f2.uv, blur_ref, t, mode,
                geom.res_scalar, geom.actual_width)
            y, u, v = make_warp_fn(geom, mode)(
                *a, jnp.asarray(blur_ref.astype(np.int32)),
                jnp.float32(t), jnp.float32(0.0), jnp.float32(255.0))
            ok = (np.array_equal(ry, np.asarray(y)) and
                  np.array_equal(ruv, interleave_chroma(np.asarray(u),
                                                        np.asarray(v))))
            rows.append((f"warp {w}x{h} {MODE_NAMES.get(mode, mode)} t={t}",
                         ok))
    return rows


def parity_ok(cases=SMOKE_CASES, modes=(0, 2)) -> bool:
    return all(ok for _, ok in run_parity(cases, modes))
