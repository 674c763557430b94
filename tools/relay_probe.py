#!/usr/bin/env python
"""Map the relay's per-dispatch argument cost (round-4 gap floor work).

tools/gap_reconcile.py established (2026-08-19, /tmp/gap5.txt):
  - re-dispatching the SAME staged pair:            +0.5 ms/pair
  - cycling 12 distinct staged pairs:              +56   ms/pair
  - the cost RECURS (identical second cycle) and is not output frees
  - grouping 8 pairs behind a host-side jnp.stack:  +96   ms/pair
    (the stack dispatch re-pays the frame bytes AND the stacked
    100MB intermediate acts cold for the group step)

Hypothesis: the relay ships/validates argument buffer BYTES per
dispatch unless the exact buffer was an argument of a very recent
dispatch (tiny hot set) -- i.e. device-staged arrays are not really
resident for dispatch purposes.  These probes map the mechanism:

  dist2/3/6    cycle 2/3/6 distinct pairs: hot-set reuse distance
  swap         alternate (A,B)/(B,A): is hotness positional?
  fresh        f1y routed through an on-device copy made JUST before
               each dispatch: are fresh op outputs hot?
  chain        f1y = donated (x+1) chain (stable device address):
               is hotness keyed on buffer address?
  one-arg      group step consuming ONE pre-stacked resident array
               (stacked once, reused across dispatches): per-pair cost
               of a big CONSTANT arg vs per-pair fresh args
  host-group   the honest transcode path: np.stack on HOST + one
               jnp.asarray + one grouped dispatch per 8 pairs --
               upload bytes ride ONE transfer per group

    PYTHONPATH=.:/root/.axon_site python tools/relay_probe.py [K] [WxH]
"""

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
    w, h = (3840, 2160)
    if len(sys.argv) > 2:
        w, h = map(int, sys.argv[2].split("x"))
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
        _make_source_step, _make_group_step)
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
    print(f"chip      : {chip*1e3:8.3f} ms/pair", flush=True)

    out = step(ys[0], uvs[0], ys[1], uvs[1], ts_dev, *knobs)
    np.asarray(out[1].ravel()[-1:])
    rtt = _rtt()

    def run(tag, body, pairs=K):
        t0 = time.perf_counter()
        last = body()
        np.asarray(last.ravel()[-1:])
        dt = (time.perf_counter() - t0 - rtt) / pairs
        print(f"{tag:10s}: {dt*1e3:8.3f} ms/pair "
              f"(+{(dt-chip)*1e3:.3f} vs chip)", flush=True)

    def cycle(n_pairs):
        def body():
            last = None
            for i in range(K):
                j = i % n_pairs
                _, uv, _, _ = step(ys[j], uvs[j], ys[j + 1], uvs[j + 1],
                                   ts_dev, *knobs)
                last = uv
            return last
        return body

    run("dist2", cycle(2))
    run("dist3", cycle(3))
    run("dist6", cycle(6))

    def swap():
        last = None
        for i in range(K):
            a, b = (0, 1) if i % 2 == 0 else (1, 0)
            _, uv, _, _ = step(ys[a], uvs[a], ys[b], uvs[b], ts_dev, *knobs)
            last = uv
        return last
    run("swap", swap)

    copy = jax.jit(lambda x: x + jnp.uint8(0))
    copy(ys[0]).block_until_ready()

    def fresh():
        last = None
        for i in range(K):
            j = i % 12
            fy = copy(ys[j])
            _, uv, _, _ = step(fy, uvs[0], ys[1], uvs[1], ts_dev, *knobs)
            last = uv
        return last
    run("fresh", fresh)

    bump = jax.jit(lambda x: x + jnp.uint8(1), donate_argnums=0)
    ch = copy(ys[0])
    ch = bump(ch)
    ch.block_until_ready()

    def chain():
        nonlocal ch
        last = None
        for i in range(K):
            ch = bump(ch)
            _, uv, _, _ = step(ch, uvs[0], ys[1], uvs[1], ts_dev, *knobs)
            last = uv
        return last
    run("chain", chain)

    # one big CONSTANT stacked arg, group step dispatched repeatedly
    gstep = _make_group_step(geom, 2, 0, "nearest", True, "hopper",
                             False, "vmap", False, "shift", 16, "pallas")
    k = 8
    f1y = jnp.stack(ys[0:k]); f1uv = jnp.stack(uvs[0:k])
    f2y = jnp.stack(ys[1:k + 1]); f2uv = jnp.stack(uvs[1:k + 1])
    gts = jnp.tile(ts_dev, (k, 1))
    g = gstep(f1y, f1uv, f2y, f2uv, gts, *knobs)
    np.asarray(g[1].ravel()[-1:])

    def one_arg():
        last = None
        for _ in range(K // k):
            _, guv, _, _ = gstep(f1y, f1uv, f2y, f2uv, gts, *knobs)
            last = guv
        return last
    run("one-arg", one_arg, pairs=(K // k) * k)

    # honest transcode ingest: HOST np.stack -> one asarray -> one
    # grouped dispatch per 8 pairs (includes the real upload)
    hy = [np.asarray(f.y) for f in host]
    huv = [np.asarray(f.uv) for f in host]

    def host_group():
        last = None
        for g0 in range(K // k):
            i0 = (g0 * k) % 6
            a = jnp.asarray(np.stack(hy[i0:i0 + k]))
            auv = jnp.asarray(np.stack(huv[i0:i0 + k]))
            b = jnp.asarray(np.stack(hy[i0 + 1:i0 + k + 1]))
            buv = jnp.asarray(np.stack(huv[i0 + 1:i0 + k + 1]))
            _, guv, _, _ = gstep(a, auv, b, buv, gts, *knobs)
            last = guv
        return last
    run("host-group", host_group, pairs=(K // k) * k)
    return 0


if __name__ == "__main__":
    sys.exit(main())
