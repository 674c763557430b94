#!/usr/bin/env python
"""Attribute the 4K pair's non-flow, non-warp glue cost (round 5).

Measured so far: whole pair 20.5 ms, _flow_impl 9.3, warp prep+kernels
4.8 -- ~6 ms unattributed.  Candidates: scene cut_score (stride-8
slice of full-res luma), NV12 chroma deinterleave (stride-2 lane
slices of two full-res uv planes), the warp-stage cond wrapper, and
output staging.  Chained variants of the REAL engine step isolate
each:

    PYTHONPATH=.:/root/.axon_site python tools/glue_probe.py [WxH]
"""

import sys
import time

import numpy as np


def chained(build_body, k1=6, k2=24, repeats=3):
    import jax
    import jax.numpy as jnp

    def prog(k):
        body = build_body()
        return jax.jit(lambda: jax.lax.scan(body, jnp.int32(0),
                                            None, length=k)[1])

    fns = {k: prog(k) for k in (k1, k2)}
    for k in (k1, k2):
        np.asarray(fns[k]().ravel()[-1:])
    best = []
    for _ in range(repeats):
        ts = {}
        for k in (k1, k2):
            t0 = time.perf_counter()
            np.asarray(fns[k]().ravel()[-1:])
            ts[k] = time.perf_counter() - t0
        best.append((ts[k2] - ts[k1]) / (k2 - k1))
    return min(best)


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "3840x2160"
    w, h = map(int, size.split("x"))

    import os
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/mfi_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
    from mpv_frame_interpolator_tpu.pipeline import engine as E
    from mpv_frame_interpolator_tpu.pipeline import scene as S

    geom = FlowGeometry.create(h, w, w)
    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    f1, f2, _ = list(synthetic.gradient_pan(cfg, 3, vx=3, vy=1))
    a = (jnp.asarray(f1.y), jnp.asarray(f1.uv),
         jnp.asarray(f2.y), jnp.asarray(f2.uv))
    ts = jnp.linspace(0.1, 0.9, 5).astype(jnp.float32)
    knobs = (jnp.int32(16), jnp.int32(8), jnp.int32(6),
             jnp.float32(0.0), jnp.float32(255.0), jnp.float32(28.0))

    def dep(tree):
        tot = jnp.uint32(0)
        for leaf in jax.tree_util.tree_leaves(tree):
            tot = tot + jnp.sum(leaf, dtype=jnp.uint32) \
                if leaf.dtype != jnp.float32 else \
                tot + jnp.sum(leaf).astype(jnp.uint32)
        return tot.astype(jnp.int32)

    def step_variant(tag, **kw):
        base = dict(mode=2, scale_shift=0, cut_policy="nearest",
                    scene_enabled=True, model="hopper",
                    warp_sampling="pair", layers=16)
        base.update(kw)
        fn = E._make_source_step(geom, base["mode"], base["scale_shift"],
                                 base["cut_policy"], base["scene_enabled"],
                                 base["model"],
                                 warp_sampling=base["warp_sampling"],
                                 layers=base["layers"])

        def build():
            def body(c, _):
                y1 = a[0].at[0, 0].set((c & 1).astype(a[0].dtype))
                out = fn(y1, a[1], a[2], a[3], ts, *knobs)
                d = dep(out)
                return d, d
            return body
        t = chained(build) * 1e3
        print(f"  {tag:34s}: {t:8.3f} ms/pair", flush=True)
        return t

    print(f"{w}x{h} glue attribution", flush=True)
    step_variant("full default step")
    step_variant("scene_enabled=False", scene_enabled=False)

    # cut_score alone (stride-8 slice of full-res luma)
    def build_cut():
        def body(c, _):
            y1 = a[0].at[0, 0].set((c & 1).astype(a[0].dtype))
            s = S.cut_score(y1, a[2], geom.res_scalar)
            d = (s * 65536.0).astype(jnp.int32)
            return d, d
        return body
    print(f"  {'cut_score alone':34s}: {chained(build_cut)*1e3:8.3f} "
          "ms/pair", flush=True)

    # chroma deinterleave alone (stride-2 lane slices, both frames)
    def build_deint():
        def body(c, _):
            uv1 = a[1].at[0, 0].set((c & 1).astype(a[1].dtype))
            parts = (uv1[:, 0::2], uv1[:, 1::2],
                     a[3][:, 0::2], a[3][:, 1::2])
            d = dep(parts)
            return d, d
        return body
    print(f"  {'chroma deinterleave alone':34s}: "
          f"{chained(build_deint)*1e3:8.3f} ms/pair", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
