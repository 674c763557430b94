"""Test environment: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (the Pallas kernels use
interpret=True on CPU)."""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# per-session compile cache: the shared persistent cache may hold AOT
# artifacts compiled for a DIFFERENT host CPU (the xla cpu_aot_loader
# warns "could lead to execution errors such as SIGILL"), and loading
# them has produced real segfaults mid-suite
os.environ.setdefault("MFI_COMPILE_CACHE",
                      tempfile.mkdtemp(prefix="mfi_test_jaxcache_"))
# no background-precompile threads under pytest: concurrent XLA:CPU
# compiles (warm thread + test thread) have segfaulted the compiler here;
# the tests that exercise the warm path re-enable it explicitly
os.environ.setdefault("MFI_BG_PRECOMPILE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-selects the TPU backend via
# jax.config.update("jax_platforms", ...), which overrides the env var --
# override it back before any backend is instantiated.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from mpv_frame_interpolator_tpu.frame import FrameFormat, VideoFrame, split_chroma  # noqa: E402
from mpv_frame_interpolator_tpu.io import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg():
    # 64x48: res_scalar = 0 path; fast on CPU
    return synthetic.SyntheticConfig(width=64, height=48, fps=24.0)


@pytest.fixture(scope="session")
def pyramid_cfg():
    # tall enough that res_scalar > 0 (height 544 >> 1 = 272 > 270 -> rs 2)
    return synthetic.SyntheticConfig(width=96, height=544, fps=24.0)


def frame_pair(cfg, source="moving_box", **kw):
    gen = getattr(synthetic, source)(cfg, 2, **kw)
    f1 = next(gen)
    f2 = next(gen)
    return f1, f2


def planar(frame: VideoFrame):
    u, v = split_chroma(frame.uv)
    return frame.y, u, v
