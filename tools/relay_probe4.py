#!/usr/bin/env python
"""Relay argument-cost probes, round 5: are OUTPUT allocations the cost?

Unified read of probe rounds 1-4 (/tmp/probe*.txt, /tmp/gap5.txt):
  - a dispatch whose (executable, big-arg handles, small-arg values)
    tuple repeats the previous one is FREE (raw-const, raw-ts, chain,
    ring2-with-fixed-index);
  - ANY change (cycling buffer handles, a changing index value) costs
    ~56 ms at 4K and ~56 ms at 1080p per 62MB of outputs -- and the
    grouped variants cost ~(fresh output bytes)/1.1GB/s (gring8 498MB
    -> 450ms, gring24 1.5GB -> 1.9s, one-arg 498MB -> 435ms even with
    constant args);
  -> hypothesis: a non-memoized dispatch pays ~1 ms per MB of FRESH
    OUTPUT allocation; memoized dispatches reuse the previous output
    allocation; execution itself is in-order and real either way.

If true, donating pre-allocated SCRATCH buffers for the outputs should
make even memo-missing dispatches run at chip speed.  Rows:

  sum-cycle   step returning only full-reduction scalars (no big
              outputs), cycling 12 staged pairs: the zero-output floor
  aout-cycle  donated output scratch (y,uv) + cycling staged pairs
  aout-alt    same but alternating between TWO scratch sets (the
              consumer-safe double buffer a real engine needs)
  aout-stack  donated scratch + one constant 13-frame stacked source
              arg + cycling index (the bench/transcode shape)

    PYTHONPATH=.:/root/.axon_site python tools/relay_probe4.py
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
    K = 24
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
        _flow_stage, _warp_stage)
    from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds

    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    host = list(synthetic.gradient_pan(cfg, 14, vx=3, vy=1))
    ys = [jnp.asarray(f.y) for f in host]
    uvs = [jnp.asarray(f.uv) for f in host]
    geom = FlowGeometry.create(h, w, w)
    ts_dev = jnp.asarray(np.linspace(0.1, 0.9, n_out).astype(np.float32))
    knobs = (jnp.int32(radius), jnp.int32(8), jnp.int32(6),
             jnp.float32(0.0), jnp.float32(255.0), jnp.float32(28.0))

    chip = chip_pair_seconds(w, h, n_out, radius, k1=4, k2=12, repeats=1)
    print(f"chip      : {chip*1e3:8.3f} ms/pair", flush=True)

    def pair_body(f1y, f1uv, f2y, f2uv):
        f1u, f1v = f1uv[:, 0::2], f1uv[:, 1::2]
        f2u, f2v = f2uv[:, 0::2], f2uv[:, 1::2]
        blurred, frac, cut = _flow_stage(
            geom, 0, True, "hopper", False, f1y, f1u, f1v, f2y, f2u,
            f2v, *knobs[:3], knobs[5], False, 16, "pallas")
        y, uv = _warp_stage(
            geom, 2, 0, "nearest", True, "hopper", f1y, f1u, f1v,
            f2y, f2u, f2v, blurred, cut, ts_dev, knobs[3], knobs[4],
            knobs[5], "vmap", frac, "shift")
        return y, uv

    def run(tag, body, pairs=K):
        t0 = time.perf_counter()
        last = body()
        np.asarray(last.ravel()[-1:])
        dt = (time.perf_counter() - t0 - rtt) / pairs
        print(f"{tag:10s}: {dt*1e3:8.3f} ms/pair "
              f"(+{(dt-chip)*1e3:.3f} vs chip)", flush=True)

    # --- sum-cycle: no big outputs --------------------------------------
    @jax.jit
    def sum_step(f1y, f1uv, f2y, f2uv):
        y, uv = pair_body(f1y, f1uv, f2y, f2uv)
        return jnp.sum(y, dtype=jnp.uint32) + jnp.sum(uv,
                                                      dtype=jnp.uint32)

    s = sum_step(ys[0], uvs[0], ys[1], uvs[1])
    np.asarray(s.ravel()[-1:])
    rtt = _rtt()

    def sum_cycle():
        last = None
        for i in range(K):
            j = i % 12
            last = sum_step(ys[j], uvs[j], ys[j + 1], uvs[j + 1])
        return last
    run("sum-cycle", sum_cycle)

    # --- aout: donated output scratch ------------------------------------
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def aout_step(sy, suv, f1y, f1uv, f2y, f2uv):
        y, uv = pair_body(f1y, f1uv, f2y, f2uv)
        return y.astype(sy.dtype), uv.astype(suv.dtype)

    ch, cw = h // 2, w
    scr_y = jnp.zeros((n_out, h, w), jnp.uint8)
    scr_uv = jnp.zeros((n_out, ch, cw), jnp.uint8)
    scr_y, scr_uv = aout_step(scr_y, scr_uv, ys[0], uvs[0], ys[1], uvs[1])
    np.asarray(scr_uv.ravel()[-1:])
    rtt = _rtt()

    def aout_cycle():
        nonlocal scr_y, scr_uv
        for i in range(K):
            j = i % 12
            scr_y, scr_uv = aout_step(scr_y, scr_uv, ys[j], uvs[j],
                                      ys[j + 1], uvs[j + 1])
        return scr_uv
    run("aout-cycle", aout_cycle)

    scr2_y = jnp.zeros((n_out, h, w), jnp.uint8)
    scr2_uv = jnp.zeros((n_out, ch, cw), jnp.uint8)
    scr2_y, scr2_uv = aout_step(scr2_y, scr2_uv, ys[0], uvs[0],
                                ys[1], uvs[1])
    np.asarray(scr2_uv.ravel()[-1:])
    rtt = _rtt()

    def aout_alt():
        nonlocal scr_y, scr_uv, scr2_y, scr2_uv
        for i in range(K):
            j = i % 12
            if i % 2 == 0:
                scr_y, scr_uv = aout_step(scr_y, scr_uv, ys[j], uvs[j],
                                          ys[j + 1], uvs[j + 1])
            else:
                scr2_y, scr2_uv = aout_step(scr2_y, scr2_uv, ys[j],
                                            uvs[j], ys[j + 1],
                                            uvs[j + 1])
        return scr_uv
    run("aout-alt", aout_alt)

    # --- aout-stack: constant stacked source + cycling index -------------
    R = 13
    stack_y = jnp.stack(ys[:R])
    stack_uv = jnp.stack(uvs[:R])

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def aout_stack_step(sy, suv, gy, guv, i):
        f1y = jax.lax.dynamic_index_in_dim(gy, i, 0, False)
        f1uv = jax.lax.dynamic_index_in_dim(guv, i, 0, False)
        f2y = jax.lax.dynamic_index_in_dim(gy, i + 1, 0, False)
        f2uv = jax.lax.dynamic_index_in_dim(guv, i + 1, 0, False)
        y, uv = pair_body(f1y, f1uv, f2y, f2uv)
        return y.astype(sy.dtype), uv.astype(suv.dtype)

    scr_y, scr_uv = aout_stack_step(scr_y, scr_uv, stack_y, stack_uv,
                                    jnp.int32(0))
    np.asarray(scr_uv.ravel()[-1:])
    rtt = _rtt()

    def aout_stack():
        nonlocal scr_y, scr_uv
        for i in range(K):
            scr_y, scr_uv = aout_stack_step(scr_y, scr_uv, stack_y,
                                            stack_uv,
                                            jnp.int32(i % 12))
        return scr_uv
    run("aout-stack", aout_stack)
    return 0


if __name__ == "__main__":
    sys.exit(main())
