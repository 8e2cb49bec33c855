"""Matrix-free effective-stiffness operator K_eff * x — the TPU hot loop.

TPU-native re-expression of the reference's two-phase GPU mat-vec design
(ke_apply_element.slang + ke_gather_node.slang; CPU twin
/root/reference/src/gpu/pcg.cpp:505-694).  Instead of an explicit B-matrix
per element, the isotropic product is evaluated in tensor form:

    G   = sum_l grad_l (x) u_l          (displacement gradient, per row)
    S   = lam * tr(G) * I + mu * (G + G^T)      (Cauchy stress)
    f_l = V * scale * G^T-contraction: f_lb = sum_a grad_la * S_ab

which is algebraically identical to f = B^T D B u for the reference's
isotropic Voigt D (materials.hpp:124-134) but maps onto dense batched
einsums that XLA fuses into a single pass — no 6x24 B materialization, no
scatter atomics (the reference's "gather-based assembly" idea,
docs/spec.md:35, realized here as one ``segment_sum``).

Semantics preserved exactly (pcg.cpp:530-686):
* input is sanitized — constrained components read as zero;
* element forces scale by ``volume * stiffness_scale``;
* ``+ mass_factor * lumped_mass * x_sanitized`` adds the mass term;
* constrained rows are identity: output = raw input.

Works unchanged for tet4 and hex8 because preprocessing emits uniform
quadrature rows (see mesh/preprocess.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh.pack import PackedModel


def sanitize(model: PackedModel, x: jax.Array) -> jax.Array:
    """Zero constrained components (pcg.cpp:535-546)."""
    return jnp.where(model.bc_mask, 0.0, x)


def element_forces(
    model: PackedModel,
    x_sanitized: jax.Array,
    stiffness_scale,
) -> jax.Array:
    """Per-row local node forces (Q*, 8, 3) = V * scale * B^T D B u_e."""
    x_pad = jnp.concatenate(
        [x_sanitized, jnp.zeros((1, 3), dtype=x_sanitized.dtype)], axis=0
    )
    u_e = x_pad[model.conn]  # (Q, 8, 3) gather
    grads = model.gradients
    # displacement gradient G_ab = sum_l g_la * u_lb
    g_tensor = jnp.einsum("qla,qlb->qab", grads, u_e)
    trace = g_tensor[:, 0, 0] + g_tensor[:, 1, 1] + g_tensor[:, 2, 2]
    eye = jnp.eye(3, dtype=g_tensor.dtype)
    stress = (
        model.lam_q[:, None, None] * trace[:, None, None] * eye[None]
        + model.mu_q[:, None, None] * (g_tensor + jnp.swapaxes(g_tensor, 1, 2))
    )
    scale = (model.volume * stiffness_scale)[:, None, None]
    return scale * jnp.einsum("qla,qab->qlb", grads, stress)


def scatter_add_forces(model: PackedModel, forces: jax.Array) -> jax.Array:
    """Sum local node forces into (N*, 3) nodal forces via segment_sum.

    The dump row (index N*) swallows padded slots; it is sliced away.  This
    replaces the reference's CSR ke_gather_node pass — XLA lowers the
    segment_sum to a vectorized scatter-add with no float atomics needed for
    determinism on TPU.
    """
    n_pad = model.padded_node_count
    flat = forces.reshape(-1, 3)
    segments = model.conn.reshape(-1)
    summed = jax.ops.segment_sum(flat, segments, num_segments=n_pad + 1)
    return summed[:n_pad]


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
    forces = element_forces(model, xs, stiffness_scale)
    out = scatter_add_forces(model, forces)
    out = out + (mass_factor * model.lumped_mass)[:, None] * xs
    return jnp.where(model.bc_mask, x, out)
