"""Honest per-pair chip execution time via scan-chained programs.

See tools/chip_time.py for the rationale: per-output sync loops time the
relay's dispatch path, and readbacks degrade later dispatches -- but ONE
program that runs the fused step K times under lax.scan (with a data
dependency between iterations) measures pure chip execution, because
(t(K2)-t(K1))/(K2-K1) cancels every fixed cost.
"""

import time

import numpy as np


def chip_pair_seconds(width=3840, height=2160, n_outputs=5, radius=16,
                      model="hopper", k1=8, k2=40, p010=False,
                      repeats=2, layers=None, warp_sampling=None,
                      max_calc_res=None, num_iterations=0):
    import jax
    import jax.numpy as jnp
    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
    from mpv_frame_interpolator_tpu.pipeline.engine import (
        EngineConfig, _make_source_step)

    if warp_sampling is None:
        # measure what SHIPS: the engine's default sampler (VERDICT r4
        # weak #3 -- the committed chip number must track the default)
        warp_sampling = EngineConfig.warp_sampling

    if layers is None:
        # the engine's default bucket for this radius (layer_buckets)
        layers = next((b for b in (5, 8, 16) if b >= radius),
                      max(radius, 16))
    cfg = synthetic.SyntheticConfig(width=width, height=height, fps=24.0,
                                    pixfmt="p010" if p010 else "nv12")
    f1, f2, _ = list(synthetic.gradient_pan(cfg, 3, vx=3, vy=1))
    from mpv_frame_interpolator_tpu.ops import oracle
    geom = FlowGeometry.create(height, width, width,
                               max_calc_res or oracle.MAX_CALC_RES,
                               num_iterations)
    step = _make_source_step(geom, 2, 8 if p010 else 0, "nearest", True,
                             model, warp_sampling=warp_sampling,
                             layers=layers)
    ts = jnp.linspace(0.1, 0.9, n_outputs).astype(jnp.float32)
    args = (jnp.asarray(f1.y), jnp.asarray(f1.uv),
            jnp.asarray(f2.y), jnp.asarray(f2.uv))
    knobs = (jnp.int32(radius), jnp.int32(8), jnp.int32(6),
             jnp.float32(0.0), jnp.float32(255.0), jnp.float32(28.0))

    def chained(k):
        def body(carry, _):
            f1y = args[0].at[0, 0].set(
                jnp.where(carry > jnp.uint16(255), carry.astype(args[0].dtype),
                          args[0][0, 0]))
            y, uv, blurred, cut = step(f1y, args[1], args[2], args[3],
                                       ts, *knobs)
            # the carry must depend on EVERY output element: a scalar
            # slice would let XLA dead-code-eliminate work that doesn't
            # reach it, understating the chip (the sums are one cheap
            # reduction each)
            dep = (jnp.sum(uv, dtype=jnp.uint32)
                   + jnp.sum(y, dtype=jnp.uint32)
                   + jnp.sum(blurred.astype(jnp.uint32), dtype=jnp.uint32))
            return dep.astype(jnp.uint16), blurred[0, 0, 0]
        return jax.jit(lambda: jax.lax.scan(
            body, jnp.uint16(0), None, length=k)[1])

    fns = {k: chained(k) for k in (k1, k2)}
    # compile + channel warm (first readback pays the tunnel setup)
    for k in (k1, k2):
        np.asarray(fns[k]().ravel()[-1:])

    best = []
    for _ in range(repeats):
        times = {}
        for k in (k1, k2):
            t0 = time.perf_counter()
            np.asarray(fns[k]().ravel()[-1:])
            times[k] = time.perf_counter() - t0
        best.append((times[k2] - times[k1]) / (k2 - k1))
    return min(best)


