#!/usr/bin/env python
"""Honest chip time of the flow and warp STAGES separately
(scan-chained, full-output-sum carries so nothing is DCE'd).

    PYTHONPATH=.:$PYTHONPATH python tools/stage_time.py [WxH] [n_outputs]
"""

import sys

import numpy as np

from tools.flow_breakdown import chained_time


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "3840x2160"
    n_out = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    w, h = map(int, size.split("x"))

    import jax.numpy as jnp
    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.frame import split_chroma
    from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry, _flow_impl
    from mpv_frame_interpolator_tpu.ops import warp as W
    from mpv_frame_interpolator_tpu.ops.oracle import MAX_SEARCH_RADIUS

    geom = FlowGeometry.create(h, w, w)
    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    f1, f2, _ = list(synthetic.gradient_pan(cfg, 3, vx=3, vy=1))
    a = [jnp.asarray(x) for x in (f1.y, *split_chroma(f1.uv),
                                  f2.y, *split_chroma(f2.uv))]
    ts = jnp.linspace(0.1, 0.9, n_out).astype(jnp.float32)

    def mk_flow():
        def body(c, _):
            f1y = a[0].at[0, 0].set((c & 1).astype(a[0].dtype))
            off, blur = _flow_impl(geom, jnp.int32(16), 0, f1y, *a[1:],
                                   jnp.int32(8), jnp.int32(6),
                                   layers=MAX_SEARCH_RADIUS)
            dep = (jnp.sum(off, dtype=jnp.int32)
                   + jnp.sum(blur, dtype=jnp.int32))
            return dep, dep
        return body
    t_flow = chained_time(mk_flow, k1=4, k2=12) * 1e3
    print(f"  flow pair            : {t_flow:8.3f} ms")

    import jax
    _, blurred = jax.jit(
        lambda *p: _flow_impl(geom, jnp.int32(16), 0, *p, jnp.int32(8),
                              jnp.int32(6), layers=MAX_SEARCH_RADIUS))(*a)
    jax.block_until_ready(blurred)

    def mk_warp():
        fields_fn = lambda b: W._warp_fields(geom, b)  # noqa: E731

        def body(c, _):
            b = blurred.at[0, 0, 0].set((c & 1))
            fields = fields_fn(b)

            def one(t):
                return W._warp_sample(geom, W.BLENDED_FRAME, 0, jnp.uint8,
                                      *a, fields, t, jnp.float32(0.0),
                                      jnp.float32(255.0), sampling="shift")
            y, u, v = jax.lax.map(one, ts)
            dep = (jnp.sum(y, dtype=jnp.uint32)
                   + jnp.sum(u, dtype=jnp.uint32)
                   + jnp.sum(v, dtype=jnp.uint32))
            return dep.astype(jnp.int32), dep
        return body
    t_warp = chained_time(mk_warp, k1=4, k2=12) * 1e3
    print(f"  warp {n_out} outputs        : {t_warp:8.3f} ms "
          f"({t_warp/n_out*1000:.0f} us/output)")
    print(f"  flow+warp sum        : {t_flow + t_warp:8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
