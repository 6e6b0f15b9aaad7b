"""Pallas TPU kernels for the hot BGK-family predict op.

The fused per-block computation — pairwise distance → sparse
(Melkumyan-Ramos) kernel → masked per-neighbor-slot (ȳ, k̄) matvec
(reference ``bgkinference.h:73-79`` / ``bgklinference.h:80-88``) — is the
innermost loop of every scan integration.  The XLA path (kernels/predict.py)
materializes [chunk,V,S] kernel intermediates in HBM between fusions; this
kernel keeps the whole [V,S_tile] working set in VMEM, accumulating the
[V,2G] result across S tiles on the MXU.

Formulas match kernels/math.py bit-for-bit (same f32 ops in the same
order); only the matmul accumulation order differs, which is inside the
test tolerances (the reference itself sums in R-tree order).

Used automatically on TPU (see :func:`use_pallas`); the XLA path remains
the fallback for CPU tests and interpreter-mode verification.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from la3dm_tpu.kernels import math as km

_S_TILE = 512


def use_pallas(segments: bool = True) -> bool:
    """Pallas path on real TPUs unless LA3DM_PALLAS=0 (force with =1).

    Defaults on for the segment kernel only: measured ~1.1× over the XLA
    path there (heavier elementwise chain kept in VMEM), parity for the
    point kernel (MXU matmul dominates either way)."""
    env = os.environ.get("LA3DM_PALLAS", "")
    if env == "0":
        return False
    if env == "1":
        return jax.default_backend() == "tpu"
    return segments and jax.default_backend() == "tpu"


def _predict_kernel(vox_ref, en_ref, lb_ref, sl_ref, va_ref,
                    ybar_ref, kbar_ref, acc_ref,
                    *, G: int, sf2: float, ell: float, segments: bool, n_s: int):
    """Grid step (b, s): one S tile of one block, accumulated in VMEM.

    Entries arrive transposed [D,St] so per-axis slices are native [1,St]
    rows (fancy indexing would lower to an unsupported gather).  The
    distance/kernel math reproduces kernels/math.py op-for-op.
    """
    import numpy as np

    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v = vox_ref[0]                                   # [V,3]
    e = en_ref[0]                                    # [D,St]
    lab = lb_ref[0, 0]                               # [St]
    slot = sl_ref[0, 0]                              # [St]
    mask = va_ref[0, 0]                              # [St] f32 0/1

    ellf = np.float32(ell)
    if segments:
        # point-to-segment distance (bgklinference.h:106-141), axis-sliced
        d0sq = jnp.zeros((v.shape[0], e.shape[1]), jnp.float32)
        d1sq = jnp.zeros_like(d0sq)
        c1 = jnp.zeros_like(d0sq)
        c2 = jnp.zeros((1, e.shape[1]), jnp.float32)
        for ax in range(3):
            p0 = e[ax:ax + 1, :]
            p1 = e[ax + 3:ax + 4, :]
            u = p1 - p0                              # [1,St]
            diff0 = v[:, ax:ax + 1] - p0             # [V,St]
            d0sq += diff0 * diff0
            d1 = v[:, ax:ax + 1] - p1
            d1sq += d1 * d1
            c1 += diff0 * u
            c2 += u * u
        b = c1 / jnp.maximum(c2, 1e-30)
        dmidsq = jnp.zeros_like(d0sq)
        for ax in range(3):
            p0 = e[ax:ax + 1, :]
            u = e[ax + 3:ax + 4, :] - p0
            nearest = p0 + u * b                     # [V,St]
            dm = v[:, ax:ax + 1] - nearest
            dmidsq += dm * dm
        d0 = jnp.sqrt(d0sq)
        d = jnp.where(c1 <= 0.0, d0,
                      jnp.where(c2 <= c1, jnp.sqrt(d1sq), jnp.sqrt(dmidsq)))
        d = jnp.where(jnp.sqrt(c2) < km.SEG_EPSILON, d0, d)
        K = km.sparse_kernel(d / ellf, sf2)
    else:
        d2 = jnp.zeros((v.shape[0], e.shape[1]), jnp.float32)
        for ax in range(3):
            diff = v[:, ax:ax + 1] / ellf - e[ax:ax + 1, :] / ellf
            d2 += diff * diff
        K = km.sparse_kernel(jnp.sqrt(d2), sf2)
    K = K * mask[None, :]                                     # [V,St]

    St = lab.shape[0]
    gcol = jax.lax.broadcasted_iota(jnp.int32, (St, G), 1)
    onehot = jnp.where(slot[:, None] == gcol, 1.0, 0.0)       # [St,G]
    rhs = jnp.concatenate([lab[:, None] * onehot, onehot], axis=1)  # [St,2G]
    acc_ref[:] += jnp.dot(K, rhs, preferred_element_type=jnp.float32)

    @pl.when(s_idx == n_s - 1)
    def _():
        ybar_ref[0] = acc_ref[:, :G]
        kbar_ref[0] = acc_ref[:, G:]


@functools.partial(jax.jit, static_argnames=("num_slots", "sf2", "ell",
                                             "segments", "interpret"))
def bgk_predict_pallas(vox, entries, labels, slots, valid,
                       num_slots: int, sf2: float, ell: float,
                       segments: bool = False, interpret: bool = False):
    """Batched fused predict: returns (ybar, kbar) [B,V,G].

    vox [B,V,3]; entries [B,S,D]; labels/slots/valid [B,S].  S must be a
    multiple of the 512-wide tile (callers pad to pow2 ≥ 128; tiles shrink
    to S when S < 512).
    """
    B, V, _ = vox.shape
    S = entries.shape[1]
    D = entries.shape[2]
    G = num_slots
    st = min(_S_TILE, S)
    n_s = S // st

    kernel = functools.partial(_predict_kernel, G=G, sf2=sf2, ell=ell,
                               segments=segments, n_s=n_s)
    grid = (B, n_s)
    out_shape = (jax.ShapeDtypeStruct((B, V, G), jnp.float32),
                 jax.ShapeDtypeStruct((B, V, G), jnp.float32))
    ybar, kbar = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, V, 3), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, st), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, st), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, st), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, st), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, V, G), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, G), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((V, 2 * G), jnp.float32)],
        out_shape=out_shape,
        interpret=interpret,
    )(vox, jnp.swapaxes(entries, 1, 2), labels.astype(jnp.float32)[:, None, :],
      slots.astype(jnp.int32)[:, None, :], valid.astype(jnp.float32)[:, None, :])
    return ybar, kbar
