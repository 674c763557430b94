"""Pallas TPU kernel: 8x8 box blur of the flow field.

Hand-kernel analog of blurFlowKernel.cl (reference:
video/filter/HopperRender/Kernels/blurFlowKernel.cl): the OpenCL version
stages a 24x24 local-memory tile with mirrored halos per 16x16 workgroup;
the TPU version holds the whole symmetric-padded plane in VMEM (the flow
field is <=270x480 int32 = 0.5 MB, far under the ~16 MB VMEM budget) and
runs the separable 16-add shift sum on the VPU, one grid step per plane.

Semantics are identical to ops.flow.blur_flow: taps [-4, 3] per axis,
symmetric edge padding (done by the caller), truncating division by 64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 4  # blurFlowKernel.cl:2 KERNEL_RADIUS


def _blur_kernel(pad_ref, out_ref):
    r = RADIUS
    lh, lw = out_ref.shape[1], out_ref.shape[2]
    rows = jnp.zeros((lh, lw + 2 * r), jnp.int32)
    for ky in range(-r, r):
        rows = rows + pad_ref[0, r + ky:r + ky + lh, :]
    acc = jnp.zeros((lh, lw), jnp.int32)
    for kx in range(-r, r):
        acc = acc + rows[:, r + kx:r + kx + lw]
    # C-style truncation toward zero for the /64 (blurFlowKernel.cl:88)
    q = jnp.where(acc < 0, -((-acc) >> 6), acc >> 6)
    out_ref[0, :, :] = q


@functools.partial(jax.jit, static_argnames=("lh", "lw", "interpret"))
def blur_flow_pallas(offset, lh: int, lw: int, interpret: bool = None):
    """Drop-in replacement for ops.flow.blur_flow; offset (2, lh, lw) int.

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (CPU tests / vo_null-style runs without hardware)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = RADIUS
    padded = jnp.pad(offset.astype(jnp.int32), ((0, 0), (r, r), (r, r)),
                     mode="symmetric")
    return pl.pallas_call(
        _blur_kernel,
        grid=(offset.shape[0],),
        in_specs=[pl.BlockSpec((1, lh + 2 * r, lw + 2 * r),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, lh, lw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((offset.shape[0], lh, lw), jnp.int32),
        interpret=interpret,
    )(padded)
