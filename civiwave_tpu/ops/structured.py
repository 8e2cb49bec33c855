"""Stencil-form EBE operator for uniform structured hex grids.

Same math as ops/apply_keff.py's hex path (2x2x2 Gauss, tensor-form
isotropic stress), but connectivity is implicit:

* gather  -> 8 shifted slices of the (X, Y, Z, 3) node grid;
* scatter -> 8 shifted adds back into the node grid.

The Gauss gradient table is a single (8, 8, 3) constant, so the only HBM
traffic is the node vectors and the per-element material grids — the
operator runs at VPU speed instead of gather speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh.structured import CORNERS, StructuredModel


def _corner_views(u_grid: jax.Array, nx: int, ny: int, nz: int):
    """The 8 per-corner element views, each (nx, ny, nz, 3)."""
    return [
        u_grid[di : di + nx, dj : dj + ny, dk : dk + nz]
        for (di, dj, dk) in CORNERS
    ]


def _scatter_corners(f_corners, grid_shape):
    """Sum per-corner element fields back onto the node grid."""
    out = jnp.zeros((*grid_shape, *f_corners[0].shape[3:]), dtype=f_corners[0].dtype)
    nx, ny, nz = f_corners[0].shape[:3]
    for (di, dj, dk), f in zip(CORNERS, f_corners):
        out = out.at[di : di + nx, dj : dj + ny, dk : dk + nz].add(f)
    return out


def apply_keff_structured(
    model: StructuredModel, x: jax.Array, stiffness_scale, mass_factor
) -> jax.Array:
    """K_eff * x as a 27-point stencil; semantics match apply_keff exactly
    (sanitize -> element forces -> assemble -> mass term -> identity rows).
    """
    nx, ny, nz = model.nx, model.ny, model.nz
    grid_shape = model.grid_shape

    xs = jnp.where(model.bc_mask, 0.0, x)
    u_grid = xs.reshape(*grid_shape, 3)
    u_l = _corner_views(u_grid, nx, ny, nz)  # 8 x (nx, ny, nz, 3)

    lam = model.lam_grid[..., None, None]
    mu = model.mu_grid[..., None, None]
    grads = model.grads  # (8gp, 8l, 3) constant
    eye = jnp.eye(3, dtype=xs.dtype)

    f_corners = [
        jnp.zeros((nx, ny, nz, 3), dtype=xs.dtype) for _ in range(8)
    ]
    for gp in range(8):
        # displacement gradient G_ab = sum_l g_la u_lb
        g_tensor = sum(
            jnp.einsum("a,...b->...ab", grads[gp, l], u_l[l]) for l in range(8)
        )
        trace = g_tensor[..., 0, 0] + g_tensor[..., 1, 1] + g_tensor[..., 2, 2]
        stress = lam * trace[..., None, None] * eye + mu * (
            g_tensor + jnp.swapaxes(g_tensor, -1, -2)
        )
        weighted = (model.gp_vol[gp] * stiffness_scale) * stress
        for l in range(8):
            f_corners[l] = f_corners[l] + jnp.einsum(
                "a,...ab->...b", grads[gp, l], weighted
            )

    out = _scatter_corners(f_corners, grid_shape).reshape(-1, 3)
    out = out + (mass_factor * model.lumped_mass)[:, None] * xs
    return jnp.where(model.bc_mask, x, out)


def assemble_node_blocks_structured(
    model: StructuredModel, stiffness_scale, mass_factor
) -> jax.Array:
    """Per-node 3x3 K_eff diagonal blocks for the uniform grid.

    Per corner l the gp-summed block is
    ``scale * [(lam+mu) A_l + mu * b_l I]`` with constant
    ``A_l = sum_gp V_gp g_gl (x) g_gl`` and ``b_l = sum_gp V_gp |g_gl|^2``.
    """
    grads = model.grads  # (8gp, 8l, 3)
    gp_vol = model.gp_vol
    a_const = jnp.einsum("g,gla,glb->lab", gp_vol, grads, grads)  # (8, 3, 3)
    b_const = jnp.einsum("g,gla,gla->l", gp_vol, grads, grads)  # (8,)
    eye = jnp.eye(3, dtype=grads.dtype)

    lam_mu = (model.lam_grid + model.mu_grid) * stiffness_scale
    mu = model.mu_grid * stiffness_scale

    blocks = [
        lam_mu[..., None, None] * a_const[l]
        + (mu * b_const[l])[..., None, None] * eye
        for l in range(8)
    ]
    summed = _scatter_corners(blocks, model.grid_shape).reshape(-1, 3, 3)
    mass = (mass_factor * model.lumped_mass)[:, None, None] * eye
    return summed + mass
