#!/usr/bin/env python
"""Relay argument-cost probes, round 4: grouped dispatch over a donated
resident ring, and the size/bytes question.

relay_probe2.py (/tmp/probe2.txt) showed donation lineage alone does
NOT rescue big state: a 156MB donated ring pays the same +56 ms/pair as
plain cycling, while an 8MB donated chain is free.  Whatever the
mechanism (per-dispatch fixed cost whenever the argument tuple changes,
or per-byte revalidation with a small hot set), batching K pairs into
ONE dispatch over the ring divides it by K.  Rows:

  dist2-1080p  cycling 2 staged 1080p pairs: is the penalty ~bytes
               (expect +14) or fixed per dispatch (expect +54)?
  ring2        25MB donated 2-frame ring, fixed index (size probe
               between chain's 8MB=free and ring's 156MB=+56)
  gring8/24    donated 13-frame ring, lax.scan over 8/24 pair indices
               INSIDE one dispatch: per-dispatch cost amortized K-ways

    PYTHONPATH=.:/root/.axon_site python tools/relay_probe3.py
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
        _make_source_step, _flow_stage, _warp_stage)
    from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds

    ts_host = np.linspace(0.1, 0.9, n_out).astype(np.float32)
    ts_dev = jnp.asarray(ts_host)
    knobs = (jnp.int32(radius), jnp.int32(8), jnp.int32(6),
             jnp.float32(0.0), jnp.float32(255.0), jnp.float32(28.0))

    def run(tag, body, pairs, chip, rtt):
        t0 = time.perf_counter()
        last = body()
        np.asarray(last.ravel()[-1:])
        dt = (time.perf_counter() - t0 - rtt) / pairs
        print(f"{tag:11s}: {dt*1e3:8.3f} ms/pair "
              f"(+{(dt-chip)*1e3:.3f} vs chip)", flush=True)

    # ---- 1080p bytes-vs-fixed probe -----------------------------------
    cfg1 = synthetic.SyntheticConfig(width=1920, height=1080, fps=24.0)
    hf = list(synthetic.gradient_pan(cfg1, 4, vx=3, vy=1))
    ys1 = [jnp.asarray(f.y) for f in hf]
    uvs1 = [jnp.asarray(f.uv) for f in hf]
    geom1 = FlowGeometry.create(1080, 1920, 1920)
    step1 = _make_source_step(geom1, 2, 0, "nearest", True, "hopper",
                              layers=16, flow_kernel="pallas")
    chip1 = chip_pair_seconds(1920, 1080, n_out, radius, k1=4, k2=12,
                              repeats=1)
    print(f"chip-1080p : {chip1*1e3:8.3f} ms/pair", flush=True)
    out = step1(ys1[0], uvs1[0], ys1[1], uvs1[1], ts_dev, *knobs)
    np.asarray(out[1].ravel()[-1:])
    rtt = _rtt()

    def dist2_1080():
        last = None
        for i in range(K):
            j = i % 2
            _, uv, _, _ = step1(ys1[j], uvs1[j], ys1[j + 1], uvs1[j + 1],
                                ts_dev, *knobs)
            last = uv
        return last
    run("dist2-1080p", dist2_1080, K, chip1, rtt)
    del step1, ys1, uvs1, out

    # ---- 4K rings ------------------------------------------------------
    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    host = list(synthetic.gradient_pan(cfg, 14, vx=3, vy=1))
    ys = [jnp.asarray(f.y) for f in host]
    uvs = [jnp.asarray(f.uv) for f in host]
    geom = FlowGeometry.create(h, w, w)
    chip = chip_pair_seconds(w, h, n_out, radius, k1=4, k2=12, repeats=1)
    print(f"chip       : {chip*1e3:8.3f} ms/pair", flush=True)

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

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def ring2_step(ry, ruv, i):
        f1y = jax.lax.dynamic_index_in_dim(ry, i, 0, keepdims=False)
        f1uv = jax.lax.dynamic_index_in_dim(ruv, i, 0, keepdims=False)
        f2y = jax.lax.dynamic_index_in_dim(ry, i + 1, 0, keepdims=False)
        f2uv = jax.lax.dynamic_index_in_dim(ruv, i + 1, 0, keepdims=False)
        y, uv = pair_body(f1y, f1uv, f2y, f2uv)
        return ry, ruv, y, uv

    r2y = jnp.stack(ys[:2])
    r2uv = jnp.stack(uvs[:2])
    r2y, r2uv, y, uv = ring2_step(r2y, r2uv, jnp.int32(0))
    np.asarray(uv.ravel()[-1:])
    rtt = _rtt()

    def ring2():
        nonlocal r2y, r2uv
        last = None
        for i in range(K):
            r2y, r2uv, y, uv = ring2_step(r2y, r2uv, jnp.int32(0))
            last = uv
        return last
    run("ring2", ring2, K, chip, rtt)
    del r2y, r2uv

    R = 13

    def make_gring(k):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def gring_step(ry, ruv, idxs):
            def body(c, i):
                f1y = jax.lax.dynamic_index_in_dim(ry, i, 0, False)
                f1uv = jax.lax.dynamic_index_in_dim(ruv, i, 0, False)
                f2y = jax.lax.dynamic_index_in_dim(ry, i + 1, 0, False)
                f2uv = jax.lax.dynamic_index_in_dim(ruv, i + 1, 0, False)
                y, uv = pair_body(f1y, f1uv, f2y, f2uv)
                return c, (y, uv)
            _, (yb, uvb) = jax.lax.scan(body, jnp.int32(0), idxs)
            return ry, ruv, yb, uvb
        return gring_step

    ring_y = jnp.stack(ys[:R])
    ring_uv = jnp.stack(uvs[:R])
    for k in (8, 24):
        gstep = make_gring(k)
        idxs = jnp.asarray(np.arange(k, dtype=np.int32) % 12)
        ring_y, ring_uv, yb, uvb = gstep(ring_y, ring_uv, idxs)
        np.asarray(uvb.ravel()[-1:])
        rtt = _rtt()

        def gring():
            nonlocal ring_y, ring_uv
            last = None
            for _ in range(max(K // k, 1)):
                ring_y, ring_uv, yb, uvb = gstep(ring_y, ring_uv, idxs)
                last = uvb
            return last
        run(f"gring{k}", gring, max(K // k, 1) * k, chip, rtt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
