"""Pallas kernels must match the oracle bit-exactly (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from mpv_frame_interpolator_tpu.ops import oracle
from mpv_frame_interpolator_tpu.ops.pallas.blur import blur_flow_pallas


class TestPallasBlur:
    def test_matches_oracle(self):
        rng = np.random.default_rng(3)
        f = rng.integers(-500, 500, (2, 37, 53)).astype(np.int32)
        ref = oracle.blur_flow(f)
        out = np.asarray(blur_flow_pallas(jnp.asarray(f), 37, 53,
                                          interpret=True))
        np.testing.assert_array_equal(ref, out)

    def test_negative_truncation(self):
        # all-negative field exercises the trunc-toward-zero /64
        f = np.full((2, 16, 24), -100, np.int32)
        ref = oracle.blur_flow(f)
        out = np.asarray(blur_flow_pallas(jnp.asarray(f), 16, 24,
                                          interpret=True))
        np.testing.assert_array_equal(ref, out)

    def test_flow_res_shape(self):
        # the production flow-field geometry (1080p -> 480x270)
        rng = np.random.default_rng(4)
        f = rng.integers(-64, 64, (2, 270, 480)).astype(np.int32)
        ref = oracle.blur_flow(f)
        out = np.asarray(blur_flow_pallas(jnp.asarray(f), 270, 480,
                                          interpret=True))
        np.testing.assert_array_equal(ref, out)
