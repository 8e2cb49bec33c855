"""Block-Jacobi preconditioner: per-node 3x3 diagonal blocks of K_eff.

Rebuild of /root/reference/src/gpu/pcg.cpp:215-456.  For the isotropic
element stiffness the node-diagonal 3x3 block has the closed form

    B_l = V * scale * [ (lam + mu) g_l (x) g_l + mu |g_l|^2 I ]

(the (l,l) sub-block of V * B^T D B), which vectorizes into one fused pass
over each element block + the same dual-CSR gather assembly used by
apply_keff — identical math to the reference's full-Ke-then-extract-diagonal
loop (pcg.cpp:280-368), without building Ke.

Inversion follows the reference's regularization ladder exactly
(invert_spd_3x3, pcg.cpp:215-268):
1. adjugate inverse when |det| >= 1e-12;
2. else add eps = max(1e-6, max_diag * 1e-6 + 1e-12) to the diagonal, retry;
3. else fall back to a diagonal-only inverse 1 / max(d_ii, 1e-6).

Constrained axes get identity rows (pcg.cpp:390-400) and the preconditioner
apply zeroes constrained outputs (pcg.cpp:441-453).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh.pack import PackedModel

_DET_TOL = 1.0e-12


def _local_blocks(grads: jax.Array, vol_scale: jax.Array, lam: jax.Array, mu: jax.Array):
    """Per-(element[, gp], local-node) 3x3 diagonal blocks.

    grads: (..., L, 3); vol_scale/lam/mu broadcastable to (...,).
    Returns (..., L, 3, 3).
    """
    norm_sq = jnp.einsum("...la,...la->...l", grads, grads)
    outer = jnp.einsum("...la,...lb->...lab", grads, grads)
    eye = jnp.eye(3, dtype=grads.dtype)
    lam_mu = (lam + mu)[..., None]
    scale = vol_scale[..., None]
    return (scale * lam_mu)[..., None, None] * outer + (
        (scale * mu[..., None] * norm_sq)[..., None, None] * eye
    )


def assemble_node_blocks(
    model: PackedModel, stiffness_scale, mass_factor
) -> jax.Array:
    """Per-node 3x3 K_eff diagonal blocks, (N*, 3, 3) (pcg.cpp:270-378).

    Memory-bounded like the matvec (ops/apply_keff.py): the hex Gauss-
    point axis and the CSR neighbor-slot axis are unrolled as small
    static steps so the lane-padded (..., 3, 3) temporaries never carry
    an extra size-8 axis.
    """
    parts = []
    if model.padded_tet_count:
        # node-major transposed table: (4l, 3, T*) -> (T*, 4l, 3) view for
        # the block algebra (one relayout; this build is hoisted per dt)
        parts.append(
            _local_blocks(
                jnp.transpose(model.grads_tet, (2, 0, 1)),
                model.vol_tet * stiffness_scale,
                model.lam_tet,
                model.mu_tet,
            ).reshape(-1, 3, 3)  # (T*4, 3, 3)
        )
    if model.padded_hex_count:
        acc = None
        for g in range(8):
            # gp-major transposed table: (8l, 3, H) -> (H, 8l, 3) view for
            # the block algebra (one relayout per gp; this build runs once
            # per dt change, hoisted by the stepper)
            grads_g = jnp.transpose(model.grads_hex[g], (2, 0, 1))
            blocks_g = _local_blocks(
                grads_g,
                model.vol_hex[g] * stiffness_scale,
                model.lam_hex,
                model.mu_hex,
            )  # (H, 8l, 3, 3)
            acc = blocks_g if acc is None else acc + blocks_g
        parts.append(acc.reshape(-1, 3, 3))
    rows = parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    summed = None
    for d in range(model.csr_degree):
        term = (
            rows[model.csr_idx[:, d]]
            * model.csr_weight[:, d, None, None]
        )
        summed = term if summed is None else summed + term

    mass = (mass_factor * model.lumped_mass)[:, None, None] * jnp.eye(
        3, dtype=summed.dtype
    )
    return summed + mass


def _det3(m: jax.Array) -> jax.Array:
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def _adjugate(m: jax.Array) -> jax.Array:
    """Transpose of the cofactor matrix, batched (pcg.cpp:256-267)."""
    out = jnp.stack(
        [
            m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1],
            m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2],
            m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1],
            m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2],
            m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0],
            m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2],
            m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0],
            m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1],
            m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0],
        ],
        axis=-1,
    ).reshape(*m.shape[:-2], 3, 3)
    return out


def invert_spd_3x3(blocks: jax.Array) -> jax.Array:
    """Regularized batched SPD 3x3 inverse (pcg.cpp:215-268)."""
    det = _det3(blocks)
    singular = jnp.abs(det) < _DET_TOL

    diag = jnp.diagonal(blocks, axis1=-2, axis2=-1)
    max_diag = jnp.max(diag, axis=-1)
    epsilon = jnp.maximum(1.0e-6, max_diag * 1.0e-6 + 1.0e-12)
    eye = jnp.eye(3, dtype=blocks.dtype)
    regularized = jnp.where(
        singular[..., None, None], blocks + epsilon[..., None, None] * eye, blocks
    )
    det2 = _det3(regularized)
    still_singular = jnp.abs(det2) < _DET_TOL

    inv_det = 1.0 / jnp.where(still_singular, 1.0, det2)
    inverse = _adjugate(regularized) * inv_det[..., None, None]

    reg_diag = jnp.diagonal(regularized, axis1=-2, axis2=-1)
    diag_only = (1.0 / jnp.maximum(reg_diag, 1.0e-6))[..., :, None] * eye
    return jnp.where(still_singular[..., None, None], diag_only, inverse)


def build_block_jacobi_inverse(
    model: PackedModel, stiffness_scale, mass_factor
) -> jax.Array:
    """(N*, 3, 3) inverse blocks with identity rows on constrained axes
    (pcg.cpp:479-503 + 390-400)."""
    blocks = model.assemble_node_blocks(stiffness_scale, mass_factor)
    inverse = invert_spd_3x3(blocks)
    eye = jnp.eye(3, dtype=inverse.dtype)
    constrained = model.bc_mask[:, :, None]  # (N, 3, 1) broadcast over columns
    return jnp.where(constrained, eye[None], inverse)


def apply_preconditioner(
    model: PackedModel, block_inverse: jax.Array, residual: jax.Array
) -> jax.Array:
    """z = M^-1 r with constrained outputs zeroed (pcg.cpp:410-456)."""
    z = jnp.einsum("nab,nb->na", block_inverse, residual)
    return jnp.where(model.bc_mask, 0.0, z)
