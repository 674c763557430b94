#!/usr/bin/env python
"""Relay argument-cost probes, round 3: does DONATION lineage make big
device state free to reference?

tools/relay_probe.py established (/tmp/probe.txt, 2026-08-19):
  - donation-chained small buffer as step arg:        +0   ms/pair (!)
  - same staged buffers cycled (any reuse distance):  +27..54
  - constant 313MB stacked args, every dispatch:      +54
  - fresh (newly allocated) op outputs as args:       +528 (disaster)
So: just-produced + SAME allocation (donation) = free; everything else
pays ~bytes/450MB/s.  These probes decide the engine redesign:

  slots      13 pre-copied slot buffers (allocated BEFORE the loop),
             step cycles over them: is it alloc churn or reference
             recency that costs?
  rotate     the 3-op rotating pair pipeline: prev<-cur (donated),
             cur<-staged[j] (donated fill), step(prev, cur).  Working
             set = 2 stable allocations; pays each staged frame's bytes
             once per pair in the fill.
  ring       THE candidate architecture: one (13,H,W) resident ring
             threaded THROUGH the step with donation (step returns the
             ring aliased); the step slices its pair from the ring by
             traced index.  New frames enter via donated
             dynamic_update_slice.  If this runs at chip speed the
             engine gets a donated source ring.

    PYTHONPATH=.:/root/.axon_site python tools/relay_probe2.py [K]
"""

import functools
import sys
import time

import numpy as np


def _rtt():
    import jax.numpy as jnp
    x = jnp.zeros((8,), jnp.uint8)
    np.asarray(x[-1:])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray((x + 1)[-1:])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    w, h = 3840, 2160
    n_out, radius = 5, 16

    import os
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/mfi_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
    from mpv_frame_interpolator_tpu.pipeline.engine import (
        _make_source_step, _flow_stage, _warp_stage)
    from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds

    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    host = list(synthetic.gradient_pan(cfg, 14, vx=3, vy=1))
    ys = [jnp.asarray(f.y) for f in host]
    uvs = [jnp.asarray(f.uv) for f in host]

    geom = FlowGeometry.create(h, w, w)
    step = _make_source_step(geom, 2, 0, "nearest", True, "hopper",
                             layers=16, flow_kernel="pallas")
    ts_dev = jnp.asarray(np.linspace(0.1, 0.9, n_out).astype(np.float32))
    knobs = (jnp.int32(radius), jnp.int32(8), jnp.int32(6),
             jnp.float32(0.0), jnp.float32(255.0), jnp.float32(28.0))

    chip = chip_pair_seconds(w, h, n_out, radius, k1=4, k2=12, repeats=1)
    print(f"chip   : {chip*1e3:8.3f} ms/pair", flush=True)

    out = step(ys[0], uvs[0], ys[1], uvs[1], ts_dev, *knobs)
    np.asarray(out[1].ravel()[-1:])
    rtt = _rtt()

    def run(tag, body, pairs=K):
        t0 = time.perf_counter()
        last = body()
        np.asarray(last.ravel()[-1:])
        dt = (time.perf_counter() - t0 - rtt) / pairs
        print(f"{tag:7s}: {dt*1e3:8.3f} ms/pair "
              f"(+{(dt-chip)*1e3:.3f} vs chip)", flush=True)

    # --- slots: stable allocations made BEFORE the loop ---------------
    copy = jax.jit(lambda x: x + jnp.uint8(0))
    sy = [copy(y) for y in ys[:13]]
    suv = [copy(u) for u in uvs[:13]]
    jax.block_until_ready(sy[-1])

    def slots():
        last = None
        for i in range(K):
            j = i % 12
            _, uv, _, _ = step(sy[j], suv[j], sy[j + 1], suv[j + 1],
                               ts_dev, *knobs)
            last = uv
        return last
    run("slots", slots)

    # --- rotate: 2-buffer donated pair pipeline ------------------------
    rot = jax.jit(lambda dst, src: src + jnp.uint8(0), donate_argnums=0)
    py, puv = copy(ys[0]), copy(uvs[0])
    cy, cuv = copy(ys[1]), copy(uvs[1])
    jax.block_until_ready(cuv)
    # warm the rot/fill programs
    py = rot(py, cy); puv = rot(puv, cuv)
    cy = rot(cy, ys[2]); cuv = rot(cuv, uvs[2])
    jax.block_until_ready(cuv)

    def rotate():
        nonlocal py, puv, cy, cuv
        last = None
        for i in range(K):
            j = 3 + i % 11
            py = rot(py, cy)
            puv = rot(puv, cuv)
            cy = rot(cy, ys[j])      # fill: staged frame pays once
            cuv = rot(cuv, uvs[j])
            _, uv, _, _ = step(py, puv, cy, cuv, ts_dev, *knobs)
            last = uv
        return last
    run("rotate", rotate)

    # --- ring: resident source ring threaded through the step ----------
    R = 13
    ring_y = jnp.stack(ys[:R])       # one (R,h,w) allocation
    ring_uv = jnp.stack(uvs[:R])

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=())
    def ring_step(ry, ruv, i, ts, radius, ds, nbs, black, white, thr):
        f1y = jax.lax.dynamic_index_in_dim(ry, i, 0, keepdims=False)
        f1uv = jax.lax.dynamic_index_in_dim(ruv, i, 0, keepdims=False)
        f2y = jax.lax.dynamic_index_in_dim(ry, i + 1, 0, keepdims=False)
        f2uv = jax.lax.dynamic_index_in_dim(ruv, i + 1, 0, keepdims=False)
        f1u, f1v = f1uv[:, 0::2], f1uv[:, 1::2]
        f2u, f2v = f2uv[:, 0::2], f2uv[:, 1::2]
        blurred, frac, cut = _flow_stage(
            geom, 0, True, "hopper", False, f1y, f1u, f1v, f2y, f2u, f2v,
            radius, ds, nbs, thr, False, 16, "pallas")
        y, uv = _warp_stage(
            geom, 2, 0, "nearest", True, "hopper", f1y, f1u, f1v,
            f2y, f2u, f2v, blurred, cut, ts, black, white, thr,
            "vmap", frac, "shift")
        return ry, ruv, y, uv

    ring_y, ring_uv, y, uv = ring_step(ring_y, ring_uv, jnp.int32(0),
                                       ts_dev, *knobs)
    np.asarray(uv.ravel()[-1:])

    def ring():
        nonlocal ring_y, ring_uv
        last = None
        for i in range(K):
            ring_y, ring_uv, y, uv = ring_step(
                ring_y, ring_uv, jnp.int32(i % 12), ts_dev, *knobs)
            last = uv
        return last
    run("ring", ring)

    # ring ingest: donated in-place slot update from a staged frame
    upd = jax.jit(
        lambda ry, ruv, fy, fuv, i: (
            jax.lax.dynamic_update_index_in_dim(ry, fy, i, 0),
            jax.lax.dynamic_update_index_in_dim(ruv, fuv, i, 0)),
        donate_argnums=(0, 1))
    ring_y, ring_uv = upd(ring_y, ring_uv, ys[13], uvs[13], jnp.int32(0))
    jax.block_until_ready(ring_uv)

    def ring_stream():
        """Steady streaming: each pair ingests ONE new staged frame into
        the ring (donated update), then interpolates from the ring."""
        nonlocal ring_y, ring_uv
        last = None
        for i in range(K):
            j = i % 12
            ring_y, ring_uv = upd(ring_y, ring_uv, ys[j + 1], uvs[j + 1],
                                  jnp.int32((i + 1) % R))
            ring_y, ring_uv, y, uv = ring_step(
                ring_y, ring_uv, jnp.int32(i % R), ts_dev, *knobs)
            last = uv
        return last
    run("stream", ring_stream)
    return 0


if __name__ == "__main__":
    sys.exit(main())
