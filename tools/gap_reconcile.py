#!/usr/bin/env python
"""Reconcile BENCH's host_gap_ms_per_pair with dispatch_gap's +0.77.

VERDICT r3 weak #1: the headline bench pays ~65 ms/pair at 4K through
engine.push, while tools/dispatch_gap.py measured independent dispatches
at +0.77 ms/pair -- but with the SAME staged pair re-dispatched.  Round-4
first pass found the gap rides DISTINCT input buffers: cycling 12 staged
pairs costs +55.9 ms/pair where re-dispatching one pair costs +0.28
(/tmp/gap4.txt, 2026-08-19).  This tool isolates the mechanism:

  chip        scan-chained baseline (pure chip), n_outputs=5
  chip-b6     same with the bucket-padded batch the engine really runs
  raw-const   K dispatches of one staged pair (relay's hot path)
  raw-cycle   K dispatches cycling 12 distinct staged pairs -- first
              use of each buffer inside the timed window
  raw-cycle2  the SAME loop again, same process: if the cost was a
              one-time lazy upload it vanishes; if it recurs, the relay
              pays per-dispatch for buffers outside its hot set
  raw-keep    raw-cycle2 conditions but ALL outputs retained (no frees
              inside the window): isolates buffer-free cost
  push        the real engine.push stream (bench loop, measure_timing
              off) over the same cycling sources
  group8      engine.push_many with group_size=8 over the same stream
              (one fused program per 8 pairs)

Every row is honest: one data-dependent scalar readback at the end,
measured RTT subtracted, amortized over K pairs.

    PYTHONPATH=.:/root/.axon_site python tools/gap_reconcile.py [K] [WxH]
"""

import sys
import time

import numpy as np


def _rtt():
    import jax.numpy as jnp
    x = jnp.zeros((8,), jnp.uint8)
    np.asarray(x[-1:])                      # channel warm (one-time)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray((x + 1)[-1:])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    w, h = (3840, 2160)
    if len(sys.argv) > 2:
        w, h = map(int, sys.argv[2].split("x"))
    n_out, radius = 5, 16

    import os
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/mfi_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses
    import jax.numpy as jnp
    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
    from mpv_frame_interpolator_tpu.pipeline.engine import (
        EngineConfig, InterpolationEngine, _make_source_step)
    from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds

    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    frames = [dataclasses.replace(f, y=jnp.asarray(f.y),
                                  uv=jnp.asarray(f.uv))
              for f in synthetic.gradient_pan(cfg, 14, vx=3, vy=1)]

    geom = FlowGeometry.create(h, w, w)
    step = _make_source_step(geom, 2, 0, "nearest", True, "hopper",
                             layers=16, flow_kernel="pallas")
    ts_host = np.linspace(0.1, 0.9, n_out).astype(np.float32)
    ts_dev = jnp.asarray(ts_host)
    knobs = (jnp.int32(radius), jnp.int32(8), jnp.int32(6),
             jnp.float32(0.0), jnp.float32(255.0), jnp.float32(28.0))

    chip = chip_pair_seconds(w, h, n_out, radius, k1=4, k2=12, repeats=1)
    print(f"chip       : {chip*1e3:8.3f} ms/pair", flush=True)
    chip6 = chip_pair_seconds(w, h, 6, radius, k1=4, k2=12, repeats=1)
    print(f"chip-b6    : {chip6*1e3:8.3f} ms/pair  (bucket-padded batch "
          f"the engine runs)", flush=True)

    # warm the independent program + readback channel
    args0 = (frames[0].y, frames[0].uv, frames[1].y, frames[1].uv)
    y, uv, blur, cut = step(*args0, ts_dev, *knobs)
    np.asarray(uv.ravel()[-1:])
    rtt = _rtt()

    def run(tag, body, base=chip):
        t0 = time.perf_counter()
        last = body()
        np.asarray(last.ravel()[-1:])
        dt = (time.perf_counter() - t0 - rtt) / K
        print(f"{tag:11s}: {dt*1e3:8.3f} ms/pair "
              f"(+{(dt-base)*1e3:.3f} vs chip)", flush=True)
        return dt

    def raw_const():
        last = None
        for _ in range(K):
            y, uv, blur, cut = step(*args0, ts_dev, *knobs)
            last = uv
        return last

    def raw_cycle(keep=None):
        last = None
        for i in range(K):
            f1 = frames[i % 12]
            f2 = frames[i % 12 + 1]
            y, uv, blur, cut = step(f1.y, f1.uv, f2.y, f2.uv,
                                    ts_dev, *knobs)
            if keep is not None:
                keep.append((y, uv))
            last = uv
        return last

    run("raw-const", raw_const)
    run("raw-cycle", raw_cycle)
    run("raw-cycle2", raw_cycle)
    kept = []
    run("raw-keep", lambda: raw_cycle(keep=kept))
    del kept

    # the real engine stream, bench conditions
    eng = InterpolationEngine(EngineConfig(
        display_fps=120.0, auto_quality=False, initial_search_radius=radius,
        scene_detection=True, measure_timing=False, frame_output_mode=2,
        model="hopper", background_precompile=False))
    outs = []
    for f in frames[:2]:
        outs.extend(eng.push(f))
    np.asarray(outs[-1].device_planes()[1].ravel()[-1:])

    state = [frames[1].pts]

    def stream(n):
        for i in range(n):
            state[0] += 1 / 24.0
            yield dataclasses.replace(frames[2 + i % 12], pts=state[0])

    def engine_push():
        last = None
        for f in stream(K):
            got = eng.push(f)
            if got:
                last = got[-1]
        return last.device_planes()[1]

    run("push", engine_push, base=chip6)

    # grouped: same engine semantics, one program per 8 pairs
    eng2 = InterpolationEngine(EngineConfig(
        display_fps=120.0, auto_quality=False, initial_search_radius=radius,
        scene_detection=True, measure_timing=False, frame_output_mode=2,
        model="hopper", background_precompile=False))
    state[0] = 0.0
    warm = list(stream(9))          # 1 passthrough + 8 pairs: compiles k=8
    outs = eng2.push_many(warm, group_size=8)
    np.asarray(outs[-1].device_planes()[1].ravel()[-1:])

    def engine_group():
        got = eng2.push_many(list(stream(K)), group_size=8)
        return got[-1].device_planes()[1]

    run("group8", engine_group, base=chip6)
    return 0


if __name__ == "__main__":
    sys.exit(main())
