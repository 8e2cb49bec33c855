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

**Memory and layout at scale (the 5M-DOF and 2M-DOF lessons, ADR-18).**
Three rules keep the general path scaling AND fast:

* big per-element temporaries are bounded by splitting along SMALL STATIC
  axes, not by chunking the element axis: the hex force phase unrolls the
  8 Gauss points (per-gp intermediates are (H, 3, 3) — ~1.4 KB/hex
  lane-padded instead of ~11 KB/hex for the all-gp tensors that demanded
  25 GB at 1.6M hexes), and assembly unrolls the D CSR neighbor slots
  (per-slot gather fuses into its multiply-add).  Chunking the ELEMENT
  axis was tried three ways and all failed on XLA:TPU: unrolled static
  chunks sent the compiler pathological (a 6-chunk 945k matvec graph did
  not finish compiling in 40 min; 18 s for one chunk; CPU compiled the
  same HLO in 0.9 s), and both the lax.scan and fori_loop/dynamic-slice
  chunk engines compiled but CRASHED the TPU worker at execution,
  reproducibly.
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

import os

import jax
import jax.numpy as jnp

from ..mesh.pack import PackedModel
from .pallas.element_forces import (
    BLOCK_ELEMS,
    hex_force_streams,
    tet_force_streams,
)


def _element_backend() -> str:
    """Element force-phase backend: 'pallas' (TPU default), 'xla' (CPU
    default + fallback for unaligned/small blocks), or 'interpret'
    (Pallas interpreter — CPU tests of the kernel logic).  Override with
    CIVIWAVE_ELEMENT_KERNEL."""
    env = os.environ.get("CIVIWAVE_ELEMENT_KERNEL", "auto")
    if env in ("pallas", "xla", "interpret"):
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"


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


def _forces_pallas(
    conn: jax.Array,
    grads: jax.Array,
    volss: jax.Array,
    lam: jax.Array,
    mu: jax.Array,
    x_sanitized: jax.Array,
    n_local: int,
    kernel_fn,
    interpret: bool,
) -> jax.Array:
    """Shared Pallas force phase: flat row gather -> stream relayout ->
    streaming kernel -> (E*n_local, 3) force rows.

    The gather uses a FLAT index so its output stays in the natural
    (rows, 3) layout (the fast XLA gather form); the two stream
    relayouts are plain 2-D transposes XLA runs near bandwidth."""
    e_pad = conn.shape[0]
    eq = e_pad // 128
    n_streams = n_local * 3
    u_rows = x_sanitized[conn.reshape(-1)]  # (E*n_local, 3)
    u_streams = u_rows.reshape(e_pad, n_streams).T.reshape(n_streams, eq, 128)
    f = kernel_fn(
        grads.reshape(-1, eq, 128),
        u_streams,
        volss.reshape(-1, eq, 128),
        jnp.stack([lam, mu]).reshape(2, eq, 128),
        interpret=interpret,
    )
    return f.reshape(n_streams, e_pad).T.reshape(-1, 3)


def tet_forces(model: PackedModel, x_sanitized: jax.Array, stiffness_scale) -> jax.Array:
    """(T* * 4, 3) local node force rows for the tet block.

    SCALAR-COMPONENT form like :func:`hex_forces` (single quadrature
    point): every quantity is a (T,)-shaped component stream combined
    with statically-unrolled sums over the 4 local nodes and 3 axes, so
    no (..., 4, 3)- or (..., 3, 3)-minor-dim intermediate materializes.
    The einsum form lane-padded those tensors to ~KB per tet on TPU —
    the same 25 GB-class HBM blowup ADR-18 measured for hexes, just
    deferred to tet-dominant multi-million-element meshes.  The gradient
    table is stored node-major transposed (4l, 3, T*) so each of the 12
    component reads is a contiguous (T,) stream.

    On TPU, blocks aligned to BLOCK_ELEMS route to the Pallas streaming
    kernel (ops/pallas/element_forces.py) — same math, all intermediates
    in VMEM (ADR-20)."""
    backend = _element_backend()
    t_pad = model.padded_tet_count
    if backend != "xla" and t_pad >= BLOCK_ELEMS and t_pad % BLOCK_ELEMS == 0:
        return _forces_pallas(
            model.conn_tet,
            model.grads_tet,
            model.vol_tet * stiffness_scale,
            model.lam_tet,
            model.mu_tet,
            x_sanitized,
            4,
            tet_force_streams,
            interpret=backend == "interpret",
        )
    u_e = jnp.transpose(
        x_sanitized[model.conn_tet], (1, 2, 0)
    )  # (4l, 3, T) — one row gather + one relayout
    u = [[u_e[l, b] for b in range(3)] for l in range(4)]
    gr = [[model.grads_tet[l, a] for a in range(3)] for l in range(4)]
    lam, mu = model.lam_tet, model.mu_tet
    vs = model.vol_tet * stiffness_scale
    # G_ab = sum_l dN_la u_lb  (displacement gradient)
    G = [
        [sum(gr[l][a] * u[l][b] for l in range(4)) for b in range(3)]
        for a in range(3)
    ]
    tr = G[0][0] + G[1][1] + G[2][2]
    # S_ab = V s (lam tr d_ab + mu (G_ab + G_ba))
    S = [
        [
            vs * (mu * (G[a][b] + G[b][a]) + (lam * tr if a == b else 0.0))
            for b in range(3)
        ]
        for a in range(3)
    ]
    f = [
        [sum(gr[l][a] * S[a][b] for a in range(3)) for b in range(3)]
        for l in range(4)
    ]
    out = jnp.stack(
        [jnp.stack(fl, axis=-1) for fl in f], axis=1
    )  # (T, 4l, 3)
    return out.reshape(-1, 3)


def hex_forces(model: PackedModel, x_sanitized: jax.Array, stiffness_scale) -> jax.Array:
    """(H* * 8, 3) gp-reduced local node force rows for the hex block.

    SCALAR-COMPONENT form: every quantity is an (H,)-shaped component
    stream — the displacement-gradient/stress tensor components, the
    per-node force components — combined with statically-unrolled sums
    over Gauss points, local nodes and axes.  No (..., 3, 3)- or
    (..., 8, 3)-minor-dim intermediate ever materializes, so there is no
    lane-padding blowup (the all-gp einsum form demanded 25 GB of padded
    intermediates at 1.6M hexes) and XLA fuses the whole phase into a
    few full-lane elementwise kernels.  The gradient table is stored
    gp-major transposed so each of the 192 component reads is a
    contiguous (H,) stream.

    On TPU, blocks aligned to BLOCK_ELEMS route to the Pallas streaming
    kernel (ops/pallas/element_forces.py): the XLA stream form measures
    18.6 ms for the 301k-hex phase at 945k DOF (memory-bound on unfused
    stream intermediates), the kernel 2.0 ms, bit-identical (ADR-20)."""
    backend = _element_backend()
    h_pad = model.padded_hex_count
    if backend != "xla" and h_pad >= BLOCK_ELEMS and h_pad % BLOCK_ELEMS == 0:
        return _forces_pallas(
            model.conn_hex,
            model.grads_hex,
            model.vol_hex * stiffness_scale,
            model.lam_hex,
            model.mu_hex,
            x_sanitized,
            8,
            hex_force_streams,
            interpret=backend == "interpret",
        )
    u_e = jnp.transpose(
        x_sanitized[model.conn_hex], (1, 2, 0)
    )  # (8l, 3, H) — one row gather + one relayout
    u = [[u_e[l, b] for b in range(3)] for l in range(8)]
    lam, mu = model.lam_hex, model.mu_hex
    f = [[None] * 3 for _ in range(8)]
    for g in range(8):
        gr = [
            [model.grads_hex[g, l, a] for a in range(3)] for l in range(8)
        ]
        vs = model.vol_hex[g] * stiffness_scale
        # G_ab = sum_l dN_la u_lb  (displacement gradient)
        G = [
            [
                sum(gr[l][a] * u[l][b] for l in range(8))
                for b in range(3)
            ]
            for a in range(3)
        ]
        tr = G[0][0] + G[1][1] + G[2][2]
        # S_ab = V_g s (lam tr d_ab + mu (G_ab + G_ba))
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
        for l in range(8):
            for b in range(3):
                contrib = sum(gr[l][a] * S[a][b] for a in range(3))
                f[l][b] = contrib if f[l][b] is None else f[l][b] + contrib
    out = jnp.stack(
        [jnp.stack(fl, axis=-1) for fl in f], axis=1
    )  # (H, 8l, 3)
    return out.reshape(-1, 3)


def assemble(model: PackedModel, rows: jax.Array) -> jax.Array:
    """Per-node gather-sum over the dual CSR (ke_gather_node analogue).

    rows: (R, 3) concatenated tet + hex force rows (row gathers — see the
    module docstring's layout lesson).  The neighbor-slot axis is
    unrolled: each slot's gather fuses into its multiply-add, so nothing
    (N*, D, 3)-shaped materializes at any mesh size."""
    out = None
    for d in range(model.csr_degree):
        term = rows[model.csr_idx[:, d]] * model.csr_weight[:, d, None]
        out = term if out is None else out + term
    return out


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
