#!/usr/bin/env python
"""A/B the whole-pair packed warp kernel (warp_sampling="pair") against
the hoisted shift sampler at PAIR level on the real chip, plus an
on-device bit-exactness checksum (no big downloads: one scalar).

    PYTHONPATH=.:/root/.axon_site python tools/warp_pair_ab.py [WxH ...]
"""

import sys
import time

import numpy as np


def main():
    sizes = [a for a in sys.argv[1:] if "x" in a] or ["3840x2160"]

    import os
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/mfi_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
    from mpv_frame_interpolator_tpu.pipeline.engine import _make_source_step
    from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds

    for size in sizes:
        w, h = map(int, size.split("x"))
        cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
        f1, f2, _ = list(synthetic.gradient_pan(cfg, 3, vx=3, vy=1))
        geom = FlowGeometry.create(h, w, w)
        ts = jnp.linspace(0.1, 0.9, 5).astype(jnp.float32)
        knobs = (jnp.int32(16), jnp.int32(8), jnp.int32(6),
                 jnp.float32(0.0), jnp.float32(255.0), jnp.float32(28.0))
        args = (jnp.asarray(f1.y), jnp.asarray(f1.uv),
                jnp.asarray(f2.y), jnp.asarray(f2.uv), ts, *knobs)

        # --- on-device equality (scalar readback only) ------------------
        step_s = _make_source_step(geom, 2, 0, "nearest", True, "hopper",
                                   layers=16, flow_kernel="pallas")
        step_p = _make_source_step(geom, 2, 0, "nearest", True, "hopper",
                                   layers=16, flow_kernel="pallas",
                                   warp_sampling="pair")
        ys, uvs = step_s(*args)[:2]
        yp, uvp = step_p(*args)[:2]
        dy = jnp.sum(jnp.abs(ys.astype(jnp.int32) - yp.astype(jnp.int32)))
        duv = jnp.sum(jnp.abs(uvs.astype(jnp.int32)
                              - uvp.astype(jnp.int32)))
        dy_v = int(np.asarray(dy))
        duv_v = int(np.asarray(duv))
        print(f"{size}: on-device |shift - pair|: y={dy_v} uv={duv_v} "
              f"{'BIT-EXACT' if dy_v == 0 and duv_v == 0 else 'MISMATCH'}",
              flush=True)
        del step_s, step_p, ys, uvs, yp, uvp

        # --- chained pair time ------------------------------------------
        for samp in ("shift", "pair"):
            t0 = time.perf_counter()
            sec = chip_pair_seconds(w, h, 5, 16, k1=4, k2=12, repeats=1,
                                    warp_sampling=samp)
            print(f"{size} {samp:6s}: {sec*1e3:8.3f} ms/pair "
                  f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
