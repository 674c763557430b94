"""Pallas TPU kernels for the hot ops.

Where the reference uses hand-written OpenCL kernels
(video/filter/HopperRender/Kernels/*.cl), the rebuild uses Pallas where a
hand kernel beats XLA and plain jnp where the compiler is already at the
memory-bound limit.  Measured on TPU v5e (see ARCHITECTURE.md §perf):

* the SAD delta-sum search and the warp are gather-dominated; XLA's TPU
  gather runs at tens of G-elements/s and the fused elementwise code
  around it is memory-bound, so those stay on the XLA path;
* the flow box blur is a dense, tile-regular op implemented here as a
  Pallas kernel (blur_flow_pallas), wired in via EngineConfig.pallas_blur /
  make_flow_fn(pallas_blur=True).

All kernels run under interpret=True on CPU (tests exercise them without
TPU hardware, SURVEY.md §4.8 analog of vo_null testing).
"""

from mpv_frame_interpolator_tpu.ops.pallas.blur import blur_flow_pallas  # noqa: F401
