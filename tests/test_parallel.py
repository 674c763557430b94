"""Multi-device sharding + pair parallelism on the 8-device virtual mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpv_frame_interpolator_tpu.frame import split_chroma
from mpv_frame_interpolator_tpu.io import synthetic
from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry, make_flow_fn
from mpv_frame_interpolator_tpu.parallel.batch import PairParallelPool
from mpv_frame_interpolator_tpu.parallel.sharding import (
    make_mesh, sharded_flow_fn)
from mpv_frame_interpolator_tpu.pipeline.engine import (
    EngineConfig, InterpolationEngine)

from conftest import frame_pair, planar


class TestLayerShardedFlow:
    def test_matches_single_device(self, small_cfg):
        assert len(jax.devices()) == 8
        f1, f2 = frame_pair(small_cfg, "gradient_pan")
        geom = FlowGeometry.create(f1.fmt.height, f1.fmt.stride, f1.fmt.width)
        mesh = make_mesh()
        radius = 16
        a = [jnp.asarray(x) for x in (*planar(f1), *planar(f2))]
        off_s, blur_s = sharded_flow_fn(geom, radius, mesh)(
            *a, jnp.int32(8), jnp.int32(6))
        off_r, blur_r = make_flow_fn(geom, radius)(
            *a, jnp.int32(8), jnp.int32(6))
        np.testing.assert_array_equal(np.asarray(off_r), np.asarray(off_s))
        np.testing.assert_array_equal(np.asarray(blur_r), np.asarray(blur_s))


class TestPairParallel:
    def test_outputs_match_single_engine(self, small_cfg):
        cfgkw = dict(scene_detection=False, auto_quality=False,
                     measure_timing=False, initial_search_radius=5)
        frames = list(synthetic.moving_box(small_cfg, 5))
        single = InterpolationEngine(EngineConfig(**cfgkw))
        outs_1 = []
        for f in frames:
            outs_1.extend(single.push(f))
        pool = PairParallelPool(EngineConfig(**cfgkw))
        outs_n = list(pool.run(frames))
        assert len(outs_1) == len(outs_n)
        for a, b in zip(outs_1, outs_n):
            assert a.pts == pytest.approx(b.pts)
            va, vb = a.to_video_frame(), b.to_video_frame()
            np.testing.assert_array_equal(va.y, vb.y)
            np.testing.assert_array_equal(va.uv, vb.uv)

    def test_uses_multiple_devices(self, small_cfg):
        pool = PairParallelPool(EngineConfig(
            scene_detection=False, auto_quality=False, measure_timing=False))
        frames = list(synthetic.moving_box(small_cfg, 4))
        outs = list(pool.run(frames))
        devs = {next(iter(o._y.devices())).id for o in outs if not o._host}
        assert len(devs) >= 2   # pairs landed on distinct devices
