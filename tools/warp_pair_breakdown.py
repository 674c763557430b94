#!/usr/bin/env python
"""Chip-time decomposition of the whole-pair packed warp
(ops/pallas/warp_pair.py): fused prep cost, N-output kernel time, and
the N=1 marginal -- to attribute kernel time between per-(t,value) work
(DMA stalls + rolls + selects) and per-tile fixed overhead.

    PYTHONPATH=.:/root/.axon_site python tools/warp_pair_breakdown.py [WxH] [n_out]
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
    from mpv_frame_interpolator_tpu.ops.pallas import warp_pair as WP
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

    def mk_prep():
        def body(c, _):
            b = blurred.at[0, 0, 0].set((c & 1))
            fields = W._warp_fields(geom, b, full_res=False)
            prep = W._sampler_prep(geom, fields, *a, fused=True)
            d = dep_tree((prep["P1T"], prep["C1T"], prep["IT12"],
                          prep["M12"], prep["t12"]))
            return d, d
        return body

    t_prep = chained_time(mk_prep, k1=8, k2=32, repeats=3) * 1e3
    print(f"  fused prep (per pair)        : {t_prep:8.3f} ms", flush=True)

    def mk_pair(k_out):
        ts = jnp.linspace(0.1, 0.9, k_out).astype(jnp.float32)

        def make():
            return body

        def body(c, _):
            b = blurred.at[0, 0, 0].set((c & 1))
            fields = W._warp_fields(geom, b, full_res=False)
            prep = W._sampler_prep(geom, fields, *a, fused=True)
            y, uv = WP.blended_pair_from_prep(geom, prep, ts, 0)
            d = dep_tree((y, uv))
            return d, d
        return make

    tn = chained_time(mk_pair(n_out), k1=8, k2=32, repeats=3) * 1e3
    print(f"  prep+pair kernels {n_out} outputs  : {tn:8.3f} ms "
          f"(kernels ~{tn - t_prep:.3f})", flush=True)
    t1 = chained_time(mk_pair(1), k1=8, k2=32, repeats=3) * 1e3
    print(f"  prep+pair kernels 1 output   : {t1:8.3f} ms", flush=True)
    marg = (tn - t1) / max(n_out - 1, 1)
    print(f"  marginal per extra output    : {marg:8.3f} ms", flush=True)
    print(f"  fixed per-tile kernel cost   : {t1 - t_prep - marg:8.3f} ms",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
