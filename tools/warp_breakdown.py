#!/usr/bin/env python
"""Honest chip-time decomposition of the WARP stage (scan-chained,
full-output-sum carries): fields+prep (per pair) vs the per-output
sampling loop, engine-faithful (SPREP hoisted out of the t loop exactly
like pipeline/engine._warp_stage).

    PYTHONPATH=.:$PYTHONPATH python tools/warp_breakdown.py [WxH] [n_out]
"""

import sys

import numpy as np

from tools.flow_breakdown import chained_time


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "3840x2160"
    n_out = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    w, h = map(int, size.split("x"))

    import jax
    import jax.numpy as jnp
    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.frame import split_chroma
    from mpv_frame_interpolator_tpu.ops.flow import (FlowGeometry,
                                                     _flow_impl)
    from mpv_frame_interpolator_tpu.ops import warp as W
    from mpv_frame_interpolator_tpu.ops.oracle import MAX_SEARCH_RADIUS

    geom = FlowGeometry.create(h, w, w)
    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    f1, f2, _ = list(synthetic.gradient_pan(cfg, 3, vx=3, vy=1))
    a = [jnp.asarray(x) for x in (f1.y, *split_chroma(f1.uv),
                                  f2.y, *split_chroma(f2.uv))]

    _, blurred = jax.jit(
        lambda *p: _flow_impl(geom, jnp.int32(16), 0, *p, jnp.int32(8),
                              jnp.int32(6), layers=MAX_SEARCH_RADIUS))(*a)
    jax.block_until_ready(blurred)

    def dep_tree(x):
        leaves = jax.tree_util.tree_leaves(x)
        tot = jnp.uint32(0)
        for l in leaves:
            tot = tot + jnp.sum(l.astype(jnp.uint32), dtype=jnp.uint32)
        return tot.astype(jnp.int32)

    def mk_fields_prep():
        def body(c, _):
            b = blurred.at[0, 0, 0].set((c & 1))
            fields = W._warp_fields(geom, b)
            prep = W._sampler_prep(geom, fields, *a)
            d = dep_tree((fields, prep))
            return d, d
        return body

    t_prep = chained_time(mk_fields_prep, k1=8, k2=32, repeats=3) * 1e3
    print(f"  fields+prep (per pair) : {t_prep:8.3f} ms", flush=True)

    def mk_warp(k_out):
        ts = jnp.linspace(0.1, 0.9, k_out).astype(jnp.float32)

        def make():
            return body

        def body(c, _):
            b = blurred.at[0, 0, 0].set((c & 1))
            fields = W._warp_fields(geom, b)
            fields["SPREP"] = W._sampler_prep(geom, fields, *a)

            def one(t):
                return W._warp_sample(geom, W.BLENDED_FRAME, 0, jnp.uint8,
                                      *a, fields, t, jnp.float32(0.0),
                                      jnp.float32(255.0), sampling="shift")
            y, u, v = jax.lax.map(one, ts)
            d = dep_tree((y, u, v))
            return d, d
        return make

    t5 = chained_time(mk_warp(n_out), k1=8, k2=32, repeats=3) * 1e3
    print(f"  warp {n_out} outputs (hoisted prep): {t5:8.3f} ms "
          f"({t5 / n_out * 1000:.0f} us/output)", flush=True)
    t1 = chained_time(mk_warp(1), k1=8, k2=32, repeats=3) * 1e3
    print(f"  warp 1 output (hoisted prep) : {t1:8.3f} ms", flush=True)
    marg = (t5 - t1) / max(n_out - 1, 1)
    print(f"  marginal per extra output    : {marg:8.3f} ms", flush=True)
    print(f"  fixed (pair) warp cost       : {t1 - marg:8.3f} ms "
          f"(+ prep {t_prep:.3f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
