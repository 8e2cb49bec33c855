"""Pallas streaming element-force kernels for the general (unstructured) path.

TPU-native re-expression of the reference's per-element force kernel
(ke_apply_element.slang; CPU twin pcg.cpp:561-662) for the gather-based
two-phase matvec.  The XLA scalar-component form (ops/apply_keff.py)
measures 18.6 ms for the 301k-hex force phase at 945k DOF on v5e —
memory-bound on unfused (H,)-stream intermediates; its theoretical floor
is ~0.4 ms (240 MB of gradient-table reads + ~0.8 GFLOP of VPU work).
These kernels stream every table through VMEM in (hqb, 128)-tile blocks
and keep all intermediates on-chip: measured 2.0 ms for the same phase
(9.3x), bit-identical to the stream math (ADR-20).

Layout contract — everything is an H-major component stream with the
element axis reshaped to (Hq, 128) full-lane tiles:

  hex:  grads (192, Hq, 128)  = (8gp * 8l * 3a) rows
        u     (24, Hq, 128)   = (8l * 3b) gathered displacement streams
        volss (8, Hq, 128)    = per-gp detJ * stiffness_scale
        lamu  (2, Hq, 128)    = lam, mu
        out   (24, Hq, 128)   = (8l * 3b) force streams
  tet:  grads (12, Tq, 128), u (12, Tq, 128), volss (1, Tq, 128),
        lamu (2, Tq, 128) -> out (12, Tq, 128)

The math is the tensor form shared with ops/apply_keff.py:
    G_ab = sum_l dN_la u_lb ;  S = V*s*(lam tr(G) I + mu (G + G^T)) ;
    f_lb = sum_a dN_la S_ab
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block size along the reshaped element axis: hqb sublane-tiles of 128
# lanes = 4096 elements per grid step.  VMEM per hex block at 32:
# (192+24+8+2+24) * 32 * 128 * 4 B = 4.1 MB — double-buffers inside the
# default 16 MB VMEM budget.
HQB = 32
LANE = 128
BLOCK_ELEMS = HQB * LANE


def _force_kernel(n_local: int, n_gp: int):
    """Build a kernel body for ``n_local`` nodes x ``n_gp`` Gauss points."""

    def kernel(g_ref, u_ref, v_ref, lm_ref, o_ref):
        u = [[u_ref[l * 3 + b] for b in range(3)] for l in range(n_local)]
        lam = lm_ref[0]
        mu = lm_ref[1]
        f = [[None] * 3 for _ in range(n_local)]
        for g in range(n_gp):
            gr = [
                [g_ref[(g * n_local + l) * 3 + a] for a in range(3)]
                for l in range(n_local)
            ]
            vs = v_ref[g]
            G = [
                [
                    sum(gr[l][a] * u[l][b] for l in range(n_local))
                    for b in range(3)
                ]
                for a in range(3)
            ]
            tr = G[0][0] + G[1][1] + G[2][2]
            S = [
                [
                    vs
                    * (
                        mu * (G[a][b] + G[b][a])
                        + (lam * tr if a == b else 0.0)
                    )
                    for b in range(3)
                ]
                for a in range(3)
            ]
            for l in range(n_local):
                for b in range(3):
                    contrib = sum(gr[l][a] * S[a][b] for a in range(3))
                    f[l][b] = (
                        contrib if f[l][b] is None else f[l][b] + contrib
                    )
        for l in range(n_local):
            for b in range(3):
                o_ref[l * 3 + b] = f[l][b]

    return kernel


def _run(kernel, grads, u, volss, lamu, n_streams, interpret):
    _, hq, _ = u.shape
    if hq % HQB:
        raise ValueError(
            f"element stream tile count {hq} not a multiple of {HQB}; "
            "pad the element axis to BLOCK_ELEMS"
        )

    def bs(rows):
        # zero index-map entries as i*0 so they trace at the grid index's
        # dtype — bare Python 0s become i64 under the package's x64 mode
        # and Mosaic rejects the mixed-type index map (same workaround as
        # structured_stencil.py)
        return pl.BlockSpec(
            (rows, HQB, LANE),
            lambda i: (i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_streams, hq, LANE), jnp.float32),
        grid=(hq // HQB,),
        in_specs=[
            bs(grads.shape[0]),
            bs(n_streams),
            bs(volss.shape[0]),
            bs(2),
        ],
        out_specs=bs(n_streams),
        interpret=interpret,
    )(grads, u, volss, lamu)


def hex_force_streams(grads, u, volss, lamu, interpret: bool = False):
    """(24, Hq, 128) force streams for the hex block (2x2x2 Gauss)."""
    return _run(_force_kernel(8, 8), grads, u, volss, lamu, 24, interpret)


def tet_force_streams(grads, u, volss, lamu, interpret: bool = False):
    """(12, Tq, 128) force streams for the tet block (1 quadrature point)."""
    return _run(_force_kernel(4, 1), grads, u, volss, lamu, 12, interpret)
