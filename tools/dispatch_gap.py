#!/usr/bin/env python
"""Quantify the relay's PER-DISPATCH execution-path overhead.

Two honest measurements of K source pairs (full-output-sum dependency,
one scalar readback at the end, RTT subtracted):

  chained   ONE program runs K pairs under lax.scan  -> pure chip time
  separate  K independent dispatches of the fused step -> chip time +
            whatever the dispatch path serializes per program

The difference per pair is the cost the host/relay adds to EVERY pair of
a real pipeline even with fully async pushes -- the e2e-vs-chip gap of
BENCH_r02 (VERDICT r2 weak #2), isolated.

    PYTHONPATH=.:$PYTHONPATH python tools/dispatch_gap.py [WxH] [K]
"""

import sys
import time

import numpy as np


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    w, h = map(int, size.split("x"))
    n_out = 3

    import jax
    import jax.numpy as jnp
    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
    from mpv_frame_interpolator_tpu.pipeline.engine import _make_source_step
    from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds

    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    f1, f2, _ = list(synthetic.gradient_pan(cfg, 3, vx=3, vy=1))
    geom = FlowGeometry.create(h, w, w)
    step = _make_source_step(geom, 2, 0, "nearest", True, "hopper",
                             layers=16)
    ts = jnp.linspace(0.1, 0.9, n_out).astype(jnp.float32)
    args = [jnp.asarray(f1.y), jnp.asarray(f1.uv),
            jnp.asarray(f2.y), jnp.asarray(f2.uv)]
    knobs = (jnp.int32(16), jnp.int32(8), jnp.int32(6),
             jnp.float32(0.0), jnp.float32(255.0), jnp.float32(28.0))

    # chip-only baseline (scan-chained)
    chip = chip_pair_seconds(w, h, n_out, 16, k1=4, k2=12, repeats=1)
    print(f"  chip (scan-chained)   : {chip*1e3:8.3f} ms/pair")

    # warm the separate-dispatch program + readback channel
    y, uv, blur, cut = step(*args, ts, *knobs)
    np.asarray(uv.ravel()[-1:])
    x = jnp.zeros((8,), jnp.uint8)
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray((x + 1)[-1:])
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    for tag, chain in (("independent", False), ("data-chained", True)):
        t0 = time.perf_counter()
        feed = args[0]
        last = None
        for i in range(K):
            f1y = feed if chain else args[0]
            y, uv, blur, cut = step(f1y, args[1], args[2], args[3],
                                    ts, *knobs)
            if chain:
                feed = args[0].at[0, 0].set(uv[0, 0, 0].astype(args[0].dtype))
            last = uv
        np.asarray(last.ravel()[-1:])
        dt = (time.perf_counter() - t0 - rtt) / K
        print(f"  {tag:21s} : {dt*1e3:8.3f} ms/pair "
              f"(+{(dt-chip)*1e3:.3f} vs chip)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
