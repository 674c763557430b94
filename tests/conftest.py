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
# The ~56% XLA:CPU crash (round 4: 3 reproductions in TestHopperQ
# programs; each test passes alone) is a STALE JIT EH-FRAME unwind:
# the crash PC sits in libgcc_s (_Unwind) dereferencing an unmapped
# page 45KB below a live JIT r-xp page (tools/segv_backtrace.c capture,
# run of 2026-08-20).  When a test's engine is garbage-collected its
# LoadedExecutables free their ORC JIT code; with hundreds of
# compiled-then-freed programs the registered .eh_frame list ends up
# pointing into unmapped JIT memory, and the next C++ unwind that walks
# it (an exception raised during a later compile) segfaults -- which is
# why only full-suite context reproduces.  Guard: keep every loaded
# executable alive for the process lifetime so its registration stays
# valid.  Cost is a few MB per program, bounded by the suite's compile
# count (the suite peaks ~6GB of 125GB either way).
import jax._src.compiler as _jax_compiler  # noqa: E402

_kept_executables = []
_orig_backend_compile_and_load = _jax_compiler.backend_compile_and_load


def _keepalive_backend_compile_and_load(*args, **kwargs):
    exe = _orig_backend_compile_and_load(*args, **kwargs)
    _kept_executables.append(exe)
    return exe


_jax_compiler.backend_compile_and_load = _keepalive_backend_compile_and_load

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
