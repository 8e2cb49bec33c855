"""Pallas TPU kernel: fused hex8 element force computation.

Computes per-element local node forces F (E, 24) from gathered nodal
displacements ue (E, 24) in one VMEM-resident pass:

    G = ue @ W1          (MXU: 24 x 72 constant strain-displacement map)
    S = stress(G)        (VPU: isotropic lam/mu elementwise, per Gauss pt)
    F = S  @ W2          (MXU: 72 x 24 constant, Gauss weights folded in)

where W1[(l,b), (gp,a,b')] = g[gp,l,a] delta_bb' and
W2[(gp,a,b), (l,b')] = V_gp g[gp,l,a] delta_bb' encode the reference's
B-matrix algebra (pcg.cpp:561-662) as two constant matmuls — the whole
Gauss loop rides the MXU and the G/S intermediates never touch HBM.

Used by the structured fast path (constant W per grid) and reusable for
unstructured hexes with per-element tables (then W varies per element and
the einsum path is used instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def element_matmul_tables(grads: np.ndarray, gp_vol: np.ndarray):
    """Constant (24, 72) / (72, 24) maps from a Gauss gradient table.

    grads: (8gp, 8l, 3) float; gp_vol: (8,).
    """
    w1 = np.zeros((24, 72), np.float32)
    w2 = np.zeros((72, 24), np.float32)
    for gp in range(8):
        for a in range(3):
            for l in range(8):
                for b in range(3):
                    w1[l * 3 + b, gp * 9 + a * 3 + b] = grads[gp, l, a]
                    w2[gp * 9 + a * 3 + b, l * 3 + b] = gp_vol[gp] * grads[gp, l, a]
    return w1, w2


def _kernel(ue_ref, lam_ref, mu_ref, w1_ref, w2_ref, out_ref):
    ue = ue_ref[:]  # (B, 24)
    g = jnp.dot(ue, w1_ref[:], preferred_element_type=jnp.float32)  # (B, 72)

    b = ue.shape[0]
    gt = g.reshape(b, 8, 3, 3)
    trace = gt[:, :, 0, 0] + gt[:, :, 1, 1] + gt[:, :, 2, 2]  # (B, 8)
    sym = gt + jnp.swapaxes(gt, 2, 3)
    eye = jnp.eye(3, dtype=jnp.float32)
    lam = lam_ref[:][:, None, None, None]
    mu = mu_ref[:][:, None, None, None]
    stress = mu * sym + lam * trace[:, :, None, None] * eye

    out_ref[:] = jnp.dot(
        stress.reshape(b, 72), w2_ref[:], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("block",))
def hex_element_forces(ue, lam, mu, w1, w2, block: int = 1024):
    """(E, 24) gathered displacements -> (E, 24) local node forces.

    ``stiffness_scale`` should be folded into lam/mu by the caller.
    E must be a multiple of ``block``.
    """
    e = ue.shape[0]
    assert e % block == 0, (e, block)
    grid = (e // block,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 24), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((24, 72), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((72, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 24), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, 24), jnp.float32),
    )(ue, lam, mu, w1, w2)
