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

**Memory and layout at scale (the 5M-DOF and 2M-DOF lessons).**  Two
rules keep the general path scaling AND fast:

* element forces and node assembly evaluate in fixed-size chunks (gather
  included), capping every padded einsum temporary at a few hundred MB
  regardless of mesh size — at 1.6M hexes the unchunked intermediates
  demanded 25 GB on a 16 GB chip.  Identical math and summation order
  (chunks pin bit-equal results in tests).
* tables keep their natural 2-D/3-D row shapes — connectivity ``(H*, 8)``,
  CSR ``(N*, D)``, force rows ``(R, 3)`` — so every gather is a ROW gather
  (``x[conn]``, ``rows[csr_idx]``), which XLA lowers to fast sublane
  gathers.  An intermediate revision stored everything flat 1-D and
  gathered scalars through computed indices (``rows_flat[idx * 3 + c]``);
  that lowered to scalar gathers and measured 241 ms/matvec at 2.19M DOF
  on v5e (~20x regression) — row-shaped gathers restored it.
* the hex gradient/volume tables STAY stored (768 B/hex): an on-device
  recompute from gathered corner coordinates was built and measured —
  93 vs 47.7 ms/matvec at 945k DOF — because it trades a SEQUENTIAL
  table stream (~0.3 ms at 945k) for a second random row gather
  (~13 ms) plus ~3k VPU flops/hex of Jacobian math on heavily
  lane-padded (minor-dim 3) tensors.  Tables win on runtime; the
  measured per-piece budget at 945k is ~13 ms per row gather (x and
  CSR), ~15-20 ms of element einsums, ~17 ms assembly.

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

_HEX_CHUNK = 131072
_TET_CHUNK = 262144
_NODE_CHUNK = 131072






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


def _map_chunks(body, args, count: int, target_chunk: int):
    """Run ``body`` over chunks of equally-indexed arrays (leading axis).

    args: arrays whose leading axis is ``count``.  body receives per-chunk
    slices and returns an array whose leading axis is the chunk size;
    results concatenate along the leading axis.

    Chunks are unrolled at trace time with STATIC slices, not lax.map: the
    while-loop form measured ~10 ms of fixed overhead per chunk iteration
    (945k DOF matvec: 47.6 -> 153 ms with only 10 chunks); unrolled static
    slices keep straight-line XLA with the same bounded temporaries.  The
    last chunk may be shorter (shapes stay static — at most two body
    specializations trace).
    """
    if count <= target_chunk:
        return body(*args)
    outs = []
    for start in range(0, count, target_chunk):
        stop = min(start + target_chunk, count)
        outs.append(body(*(a[start:stop] for a in args)))
    return jnp.concatenate(outs)


def tet_forces(model: PackedModel, x_sanitized: jax.Array, stiffness_scale) -> jax.Array:
    """(T* * 4, 3) local node force rows for the tet block."""

    def body(conn, grads, vol, lam, mu):
        u_e = x_sanitized[conn]  # (c, 4, 3)
        g_tensor = jnp.einsum("tla,tlb->tab", grads, u_e)
        stress = _stress(g_tensor, lam, mu)
        scale = (vol * stiffness_scale)[:, None, None]
        return (scale * jnp.einsum("tla,tab->tlb", grads, stress)).reshape(-1, 3)

    return _map_chunks(
        body,
        (model.conn_tet, model.grads_tet, model.vol_tet,
         model.lam_tet, model.mu_tet),
        model.padded_tet_count,
        _TET_CHUNK,
    )


def hex_forces(model: PackedModel, x_sanitized: jax.Array, stiffness_scale) -> jax.Array:
    """(H* * 8, 3) gp-reduced local node force rows for the hex block."""

    def body(conn, grads, vol, lam, mu):
        u_e = x_sanitized[conn]  # (c, 8, 3) — one gather, all gps
        g_tensor = jnp.einsum("hgla,hlb->hgab", grads, u_e)
        stress = _stress(g_tensor, lam[:, None], mu[:, None])  # (c, 8gp, 3, 3)
        weighted = (vol * stiffness_scale)[:, :, None, None] * stress
        # f_l = sum_g V_g grad_gla S_gab — gp reduction fused into the einsum
        return jnp.einsum("hgla,hgab->hlb", grads, weighted).reshape(-1, 3)

    return _map_chunks(
        body,
        (model.conn_hex, model.grads_hex, model.vol_hex,
         model.lam_hex, model.mu_hex),
        model.padded_hex_count,
        _HEX_CHUNK,
    )


def assemble(model: PackedModel, rows: jax.Array) -> jax.Array:
    """Per-node gather-sum over the dual CSR (ke_gather_node analogue).

    rows: (R, 3) concatenated tet + hex force rows (row gathers — see the
    module docstring's layout lesson).
    """

    def body(idx, w):
        gathered = rows[idx]  # (c, D, 3)
        return jnp.sum(gathered * w[..., None], axis=1)

    return _map_chunks(
        body,
        (model.csr_idx, model.csr_weight),
        model.padded_node_count,
        _NODE_CHUNK,
    )


def element_force_rows(
    model: PackedModel, x_sanitized: jax.Array, stiffness_scale
) -> jax.Array:
    """(R, 3) concatenated force rows from both element blocks."""
    parts = []
    if model.padded_tet_count:
        parts.append(tet_forces(model, x_sanitized, stiffness_scale))
    if model.padded_hex_count:
        parts.append(hex_forces(model, x_sanitized, stiffness_scale))
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
