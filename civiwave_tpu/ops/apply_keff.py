"""Matrix-free effective-stiffness operator K_eff * x — the TPU hot loop.

TPU-native re-expression of the reference's two-phase GPU mat-vec design
(ke_apply_element.slang + ke_gather_node.slang; CPU twin
/root/reference/src/gpu/pcg.cpp:505-694).  Instead of an explicit B-matrix
per element, the isotropic product is evaluated in tensor form:

    G   = sum_l grad_l (x) u_l          (displacement gradient)
    S   = lam * tr(G) * I + mu * (G + G^T)      (Cauchy stress)
    f_l = V * scale * sum_a grad_la * S_ab

which is algebraically identical to f = B^T D B u for the reference's
isotropic Voigt D (materials.hpp:124-134) but maps onto batched einsums
XLA fuses into one pass — no 6x24 B materialization.

Two phases, both gather-based (no scatter, no atomics — the reference's
core GPU-assembly idea, docs/spec.md:35):

1. per-element forces: one nodal gather per ELEMENT (hex Gauss points share
   it), gp forces reduced per element before assembly;
2. assembly: per-node dual-CSR gather over the concatenated force rows
   (ke_gather_node.slang's CSR loop, vectorized to a fixed-degree padded
   table) — measured ~8x faster than segment_sum scatter on TPU v5e.

Semantics preserved exactly (pcg.cpp:530-686):
* input is sanitized — constrained components read as zero;
* element forces scale by ``volume * stiffness_scale``;
* ``+ mass_factor * lumped_mass * x_sanitized`` adds the mass term;
* constrained rows are identity: output = raw input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh.pack import PackedModel


def sanitize(model: PackedModel, x: jax.Array) -> jax.Array:
    """Zero constrained components (pcg.cpp:535-546)."""
    return jnp.where(model.bc_mask, 0.0, x)


def _stress(g_tensor: jax.Array, lam: jax.Array, mu: jax.Array) -> jax.Array:
    """Isotropic Cauchy stress from the displacement gradient.

    g_tensor: (..., 3, 3); lam/mu broadcastable to (...,).
    """
    trace = g_tensor[..., 0, 0] + g_tensor[..., 1, 1] + g_tensor[..., 2, 2]
    eye = jnp.eye(3, dtype=g_tensor.dtype)
    sym = g_tensor + jnp.swapaxes(g_tensor, -1, -2)
    return (
        lam[..., None, None] * trace[..., None, None] * eye
        + mu[..., None, None] * sym
    )


def tet_forces(model: PackedModel, x_sanitized: jax.Array, stiffness_scale) -> jax.Array:
    """(T*, 4, 3) local node forces for the tet block."""
    u_e = x_sanitized[model.conn_tet]  # (T, 4, 3)
    grads = model.grads_tet
    g_tensor = jnp.einsum("tla,tlb->tab", grads, u_e)
    stress = _stress(g_tensor, model.lam_tet, model.mu_tet)
    scale = (model.vol_tet * stiffness_scale)[:, None, None]
    return scale * jnp.einsum("tla,tab->tlb", grads, stress)


def hex_forces(model: PackedModel, x_sanitized: jax.Array, stiffness_scale) -> jax.Array:
    """(H*, 8, 3) gp-reduced local node forces for the hex block."""
    u_e = x_sanitized[model.conn_hex]  # (H, 8, 3) — gathered once, all gps
    grads = model.grads_hex  # (H, 8gp, 8l, 3)
    g_tensor = jnp.einsum("hgla,hlb->hgab", grads, u_e)
    stress = _stress(
        g_tensor, model.lam_hex[:, None], model.mu_hex[:, None]
    )  # (H, 8gp, 3, 3)
    weighted = (model.vol_hex * stiffness_scale)[:, :, None, None] * stress
    # f_l = sum_g V_g grad_gla S_gab — gp reduction fused into the einsum
    return jnp.einsum("hgla,hgab->hlb", grads, weighted)


def assemble(model: PackedModel, forces_rows: jax.Array) -> jax.Array:
    """Per-node gather-sum over the dual CSR (ke_gather_node analogue).

    forces_rows: (R, 3) concatenated tet + hex force rows.
    """
    gathered = forces_rows[model.csr_idx]  # (N*, D, 3)
    return jnp.sum(gathered * model.csr_weight[..., None], axis=1)


def element_force_rows(
    model: PackedModel, x_sanitized: jax.Array, stiffness_scale
) -> jax.Array:
    """(R, 3) concatenated force rows from both element blocks."""
    parts = []
    if model.padded_tet_count:
        parts.append(
            tet_forces(model, x_sanitized, stiffness_scale).reshape(-1, 3)
        )
    if model.padded_hex_count:
        parts.append(
            hex_forces(model, x_sanitized, stiffness_scale).reshape(-1, 3)
        )
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=0)


def apply_keff(
    model: PackedModel,
    x: jax.Array,
    stiffness_scale,
    mass_factor,
) -> jax.Array:
    """K_eff * x with Dirichlet identity rows (pcg.cpp:505-694).

    x: (N*, 3) f32.  ``stiffness_scale`` / ``mass_factor`` may be traced
    scalars (they change with adaptive dt, newmark_stepper.cpp:1322-1326).
    """
    xs = sanitize(model, x)
    rows = element_force_rows(model, xs, stiffness_scale)
    out = assemble(model, rows)
    out = out + (mass_factor * model.lumped_mass)[:, None] * xs
    return jnp.where(model.bc_mask, x, out)
