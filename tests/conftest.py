"""Test environment: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (the Pallas kernels use
interpret=True on CPU)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# NO persistent compile cache under pytest (MFI_COMPILE_CACHE="" turns
# it off): the suite is one process, so the in-memory jit cache already
# dedups every program, and the cache only adds risk -- the shared cache
# can hold AOT artifacts for a DIFFERENT host CPU ("could lead to
# execution errors such as SIGILL"), and XLA:CPU's executable.serialize()
# has segfaulted outright WRITING certain programs (observed in
# jax's compilation_cache.put_executable_and_time during
# test_parallel.py even with a fresh tempdir cache).
os.environ.setdefault("MFI_COMPILE_CACHE", "")
# no background-precompile threads under pytest: concurrent XLA:CPU
# compiles (warm thread + test thread) have segfaulted the compiler here;
# the tests that exercise the warm path re-enable it explicitly
os.environ.setdefault("MFI_BG_PRECOMPILE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# SERIALIZED codegen: XLA:CPU's parallel codegen (LLVM splits compiled
# modules across a thread pool) segfaults this host's compiler late in
# the suite -- deterministically at test_parallel's per-device step
# compile after ~300 accumulated programs, backtrace in
# backend_compile_and_load, NOT reproducible with a short prefix.
# split_count=1 keeps every compile single-threaded; the same suite
# then passes.  Compiles get slower (the CLI subprocess tests inherit
# this too), which the affected timeouts budget for.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

# The axon sitecustomize force-selects the TPU backend via
# jax.config.update("jax_platforms", ...), which overrides the env var --
# override it back before any backend is instantiated.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# --- full-suite segfault guard (round 5, VERDICT r4 #1) ---------------
# The mid-suite XLA:CPU SIGSEGV (r4: 3x in TestHopperQ; r5 repro runs
# crashed at 27%/48%/56% -- each test passes alone) is a C++ throw
# dying inside libgcc's _Unwind_Find_FDE while walking the JIT
# eh-frame registrations that jaxlib's ORC JIT accumulates (full
# diagnosis + captured stack in tests/_ehframe_patch.py).  Keeping
# executables alive did NOT help (r5 run 2), so the registration data
# itself goes bad; the guard no-ops __register_frame/__deregister_frame
# in libjax_common.so via a runtime GOT patch, keeping libgcc's
# registered-object list empty.  Exceptions never legitimately cross
# the XLA FFI boundary into JIT frames, so nothing loses unwind info
# it actually needs.
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "_ehframe_patch",
    os.path.join(os.path.dirname(__file__), "_ehframe_patch.py"))
_ehframe_patch = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_ehframe_patch)
_ehframe_patch.neuter_jit_eh_registration()

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


@pytest.fixture(autouse=True)
def _drain_warm_threads():
    """Join any background-precompile threads at test teardown: a warm
    thread left compiling past its test's window races later tests'
    compiles (concurrent XLA:CPU compiles have segfaulted the compiler
    on this host -- observed in jax's compilation-cache write path)."""
    yield
    from mpv_frame_interpolator_tpu.pipeline import engine as em
    if em._warm_threads:
        if em._warm_shutdown is not None:
            em._warm_shutdown.set()
        for t in em._warm_threads:
            t.join(timeout=300.0)
        em._warm_threads.clear()
        if em._warm_shutdown is not None:
            em._warm_shutdown.clear()


def frame_pair(cfg, source="moving_box", **kw):
    gen = getattr(synthetic, source)(cfg, 2, **kw)
    f1 = next(gen)
    f2 = next(gen)
    return f1, f2


def planar(frame: VideoFrame):
    u, v = split_chroma(frame.uv)
    return frame.y, u, v
