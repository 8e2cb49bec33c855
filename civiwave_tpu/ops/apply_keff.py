"""Matrix-free effective-stiffness operator K_eff * x — the TPU hot loop.

TPU-native re-expression of the reference's two-phase GPU mat-vec design
(ke_apply_element.slang + ke_gather_node.slang; CPU twin
/root/reference/src/gpu/pcg.cpp:505-694).  Instead of an explicit B-matrix
per element, the isotropic product is evaluated in tensor form:

    G   = sum_l grad_l (x) u_l          (displacement gradient)
    S   = lam * tr(G) * I + mu * (G + G^T)      (Cauchy stress)
    f_l = V * scale * sum_a grad_la * S_ab

which is algebraically identical to f = B^T D B u for the reference's
isotropic Voigt D (materials.hpp:124-134).

Two phases, both gather-based (no scatter, no atomics — the reference's
core GPU-assembly idea, docs/spec.md:35):

1. per-element forces: one nodal gather per ELEMENT, element math on
   H-major component streams — the Pallas streaming kernel
   (ops/pallas/element_forces.py) on TPU, the XLA scalar-component form
   elsewhere;
2. assembly: per-node gather over the per-element force rows
   (ke_gather_node.slang's CSR loop, vectorized to a fixed-degree padded
   table) — measured ~8x faster than segment_sum scatter on TPU v5e.

**The banded-window gather design (ADR-20).**  XLA:TPU's row gather runs
at ~5.9 ns/row from an HBM-resident table but ~1.5-2.8 ns/row when the
table operand is small enough (~1-4 MB) for the memory assigner to stage
it in VMEM — and the rate is completely insensitive to index locality
(box = Morton = random = sorted, measured).  Pack therefore sorts
elements by min corner node and plans static windows:

* x-gather: element chunks whose corner ids span <= X_WINDOW_NODES rows;
  each chunk gathers from a dynamic_slice window with a FLAT index (flat
  1-D indices + reshape keep the gather's output in its natural (rows,3)
  layout — fusing a (n,8,3)-shaped consumer into the gather re-layouts
  the output into tile-padded form and halves throughput);
* assembly: node chunks whose incident force rows span <= A_WINDOW_ROWS;
  each chunk TRANSPOSES its (S, Ec) stream segment into a physically
  small (Ec*rpe, 3) row table, gathers flat, and applies the CSR weights
  in a separate pass behind an optimization_barrier (a weighted-sum
  consumer fused into the gather also kills the fast path, measured).

Falls back to the unwindowed forms when pack planned no windows (mixed
tet+hex meshes, bands over the window size, >64 chunks) — identical
semantics at HBM gather rate.

Memory/layout rules from ADR-18 still hold: element temporaries bounded
by unrolling SMALL static axes (gp, CSR slots), tables keep natural row
shapes, gradient tables stay stored (recompute measured slower).

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


def _use_windows() -> bool:
    """Banded gather windows are a TPU gather-emitter optimization; CPU
    keeps the simpler unwindowed graphs (same semantics, faster compile).
    Override with CIVIWAVE_GATHER_WINDOWS=0/1 (tests force 1 on CPU)."""
    env = os.environ.get("CIVIWAVE_GATHER_WINDOWS", "auto")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def _use_oct() -> bool:
    """Offset-pattern (oct) gathers (ADR-33): one 24-wide gathered row
    per element / per node instead of 8 narrow rows — measured 3.1x on
    the x-phase and 3.5x on assembly at 66^3 on v5e.  TPU-only for the
    same reason as the windows.  Override with CIVIWAVE_OCT=0/1."""
    env = os.environ.get("CIVIWAVE_OCT", "auto")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def sanitize(model: PackedModel, x: jax.Array) -> jax.Array:
    """Zero constrained components (pcg.cpp:535-546)."""
    return jnp.where(model.bc_mask, 0.0, x)


def _stress(g_tensor: jax.Array, lam: jax.Array, mu: jax.Array) -> jax.Array:
    """Isotropic Cauchy stress from the displacement gradient — the all-gp
    einsum reference form used by parity tests (tests/test_pcg.py).

    g_tensor: (..., 3, 3); lam/mu broadcastable to (...,).
    """
    trace = g_tensor[..., 0, 0] + g_tensor[..., 1, 1] + g_tensor[..., 2, 2]
    eye = jnp.eye(3, dtype=g_tensor.dtype)
    sym = g_tensor + jnp.swapaxes(g_tensor, -1, -2)
    return (
        lam[..., None, None] * trace[..., None, None] * eye
        + mu[..., None, None] * sym
    )


def _u_streams(
    xs: jax.Array, conn: jax.Array, windows: tuple, n_local: int
) -> jax.Array:
    """(nl*3, E) displacement component streams.

    Windowed form: per element chunk, gather flat from the chunk's
    dynamic_slice window, materialize behind a barrier (keeps the gather
    output in its natural (rows, 3) layout — fusing the stream transpose
    into the gather re-layouts its output and costs ~2x, measured), then
    transpose per chunk (the small per-window transposes are free where
    one full-size (E,24)->(24,E) transpose costs ~4.5 ms at 300k hexes)."""
    e_pad = conn.shape[0]
    s = n_local * 3
    if not windows or not _use_windows():
        return xs[conn.reshape(-1)].reshape(e_pad, s).T
    parts = []
    for e0, ec, lo, size in windows:
        win = jax.lax.dynamic_slice(xs, (lo, 0), (size, 3))
        idx = conn[e0 : e0 + ec].reshape(-1) - lo
        g = jax.lax.optimization_barrier(win[idx])
        parts.append(g.reshape(ec, s).T)
    return jnp.concatenate(parts, axis=1)


def _u_streams_oct(
    xs: jax.Array, base: jax.Array, chunks: tuple
) -> jax.Array:
    """(nl*3, E) displacement streams via ONE gathered row per element
    (ADR-33).  Every element in a chunk reads its corners at the same
    per-slot offsets from its min corner, so a (L, nl*3) table built
    from nl shifted slices of the chunk window serves all corners at
    once: 2.45 ms vs 7.58 ms for the 8-row windowed form at 66^3
    (experiments/exp_oct_gather_r5.py x_oct vs x_ship)."""
    parts = []
    for e0, ec, lo, L, offs in chunks:
        span = max(offs)
        win = jax.lax.dynamic_slice(xs, (lo, 0), (L + span, 3))
        tab = jnp.concatenate(
            [jax.lax.slice(win, (o, 0), (o + L, 3)) for o in offs],
            axis=1,
        )  # (L, nl*3) — columns are (slot, comp) in conn slot order
        idx = base[e0 : e0 + ec] - lo
        g = jax.lax.optimization_barrier(tab[idx])  # (ec, nl*3)
        parts.append(g.T)
    return jnp.concatenate(parts, axis=1)


def _stream_math(
    u_streams, grad_stream, vol_stream, lam, mu, n_local: int, n_gp: int
):
    """XLA scalar-component force math: every quantity an (E,)-shaped
    stream combined by statically-unrolled sums over gp/l/axis, so no
    (..., nl, 3)-minor-dim intermediate materializes (ADR-18).  Returns
    the (nl*3, E) force stream stack."""
    u = [[u_streams[l * 3 + b] for b in range(3)] for l in range(n_local)]
    f = [[None] * 3 for _ in range(n_local)]
    for g in range(n_gp):
        gr = [
            [grad_stream(g, l, a) for a in range(3)] for l in range(n_local)
        ]
        vs = vol_stream(g)
        # G_ab = sum_l dN_la u_lb  (displacement gradient)
        G = [
            [
                sum(gr[l][a] * u[l][b] for l in range(n_local))
                for b in range(3)
            ]
            for a in range(3)
        ]
        tr = G[0][0] + G[1][1] + G[2][2]
        # S_ab = V s (lam tr d_ab + mu (G_ab + G_ba))
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
                f[l][b] = contrib if f[l][b] is None else f[l][b] + contrib
    return jnp.stack([f[l][b] for l in range(n_local) for b in range(3)])


def _force_streams(
    model: PackedModel, x_sanitized: jax.Array, stiffness_scale, block: str
) -> jax.Array:
    """(nl*3, E*) force component streams for one element block."""
    if block == "tet":
        conn, windows = model.conn_tet, model.xw_tet
        oct_chunks, oct_base = model.xo_tet, model.oct_base_tet
        grads, vol = model.grads_tet, model.vol_tet
        lam, mu = model.lam_tet, model.mu_tet
        n_local, n_gp, kernel = 4, 1, tet_force_streams
    else:
        conn, windows = model.conn_hex, model.xw_hex
        oct_chunks, oct_base = model.xo_hex, model.oct_base_hex
        grads, vol = model.grads_hex, model.vol_hex
        lam, mu = model.lam_hex, model.mu_hex
        n_local, n_gp, kernel = 8, 8, hex_force_streams
    e_pad = conn.shape[0]
    n_streams = n_local * 3
    if oct_chunks and oct_base is not None and _use_oct():
        us = _u_streams_oct(x_sanitized, oct_base, oct_chunks)
    else:
        us = _u_streams(x_sanitized, conn, windows, n_local)
    backend = _element_backend()
    if backend != "xla" and e_pad >= BLOCK_ELEMS and e_pad % BLOCK_ELEMS == 0:
        eq = e_pad // 128
        f = kernel(
            grads.reshape(-1, eq, 128),
            us.reshape(n_streams, eq, 128),
            (vol * stiffness_scale).reshape(-1, eq, 128),
            jnp.stack([lam, mu]).reshape(2, eq, 128),
            interpret=backend == "interpret",
        )
        return f.reshape(n_streams, e_pad)
    if block == "tet":
        vs = vol * stiffness_scale
        return _stream_math(
            us,
            lambda g, l, a: grads[l, a],
            lambda g: vs,
            lam,
            mu,
            n_local,
            n_gp,
        )
    volss = vol * stiffness_scale
    return _stream_math(
        us,
        lambda g, l, a: grads[g, l, a],
        lambda g: volss[g],
        lam,
        mu,
        n_local,
        n_gp,
    )


def tet_forces(model: PackedModel, x_sanitized: jax.Array, stiffness_scale) -> jax.Array:
    """(T* * 4, 3) local node force rows for the tet block."""
    f = _force_streams(model, x_sanitized, stiffness_scale, "tet")
    return f.T.reshape(-1, 3)


def hex_forces(model: PackedModel, x_sanitized: jax.Array, stiffness_scale) -> jax.Array:
    """(H* * 8, 3) gp-reduced local node force rows for the hex block."""
    f = _force_streams(model, x_sanitized, stiffness_scale, "hex")
    return f.T.reshape(-1, 3)


def assemble(model: PackedModel, rows: jax.Array) -> jax.Array:
    """Per-node gather-sum over the dual CSR (ke_gather_node analogue).

    rows: (R, 3) concatenated tet + hex force rows.  The neighbor-slot
    axis is unrolled: each slot's gather fuses into its multiply-add, so
    nothing (N*, D, 3)-shaped materializes at any mesh size.  Unwindowed
    fallback path (mixed meshes / oversize bands)."""
    out = None
    for d in range(model.csr_degree):
        term = rows[model.csr_idx[:, d]] * model.csr_weight[:, d, None]
        out = term if out is None else out + term
    return out


def _assemble_windowed(
    model: PackedModel, f_streams: jax.Array, rpe: int
) -> jax.Array:
    """Banded assembly: per node chunk, transpose the (S, Ec) stream
    segment into a small physical row table, flat-gather the chunk's CSR
    indices from it, then apply weights behind a barrier (ADR-20)."""
    d = model.csr_degree
    outs = []
    for n0, ncnt, e_lo, e_cnt in model.aw:
        seg = jax.lax.dynamic_slice(
            f_streams, (0, e_lo), (f_streams.shape[0], e_cnt)
        )
        rows_c = seg.T.reshape(-1, 3)  # (e_cnt*rpe, 3) small table
        idx = model.csr_idx[n0 : n0 + ncnt].reshape(-1) - e_lo * rpe
        g = jax.lax.optimization_barrier(rows_c[idx])
        gw = g.reshape(ncnt, d, 3)
        w = model.csr_weight[n0 : n0 + ncnt]
        outs.append(
            sum(gw[:, k, :] * w[:, k : k + 1] for k in range(d))
        )
    return jnp.concatenate(outs, axis=0)


def _assemble_oct(model: PackedModel, f_streams: jax.Array) -> jax.Array:
    """Offset-pattern assembly (ADR-33): ONE gathered 24-wide stream
    column per node.  Per chunk, the (K*3, L) table is K shifted stream
    triples — contiguous sublane slices of ``f_streams``, no (rows, 3)
    relayout anywhere (the tile-padded row form measured 12.5 ns/row vs
    0.96 for this shape, experiments/exp_oct_gather_r5.py).  Slices
    overhanging the padded element axis are zero-filled: only
    zero-weight slots can land there (a real incidence always references
    a real element)."""
    e_pad = f_streams.shape[1]
    outs = []
    for n0, ncnt, e_lo, L, pattern in model.oa_oct:
        rows = []
        for de, l in pattern:
            start = e_lo + de  # may be negative (boundary-node columns)
            lo_c = min(max(start, 0), e_pad)
            hi_c = min(max(start + L, 0), e_pad)
            # clamped so pads stay non-negative even when the slice lies
            # entirely off either end of the element axis
            left = min(max(-start, 0), L)
            avail = max(hi_c - lo_c, 0)
            right = L - left - avail
            tri = jax.lax.slice(
                f_streams, (l * 3, lo_c), (l * 3 + 3, lo_c + avail)
            )
            if left or right:
                tri = jnp.pad(tri, ((0, 0), (left, right)))
            rows.append(tri)
        tab = jnp.concatenate(rows, axis=0)  # (K*3, L)
        idx = model.oa_col[n0 : n0 + ncnt] - e_lo
        g = jax.lax.optimization_barrier(tab[:, idx])  # (K*3, ncnt)
        gg = g.reshape(len(pattern), 3, ncnt)
        w = model.oa_w[n0 : n0 + ncnt]  # (ncnt, K)
        outs.append(jnp.einsum("kbn,nk->bn", gg, w))
    res = jnp.concatenate(outs, axis=1)  # (3, N*) component-major
    return res.T


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
    if model.oa_oct and _use_oct():
        # offset-pattern fast path (ADR-33): stream-form forces, one
        # gathered column per node, single (3, N*) -> (N*, 3) relayout
        block = "tet" if model.padded_tet_count else "hex"
        f = _force_streams(model, xs, stiffness_scale, block)
        out = _assemble_oct(model, f)
    elif model.aw and _use_windows():
        # single-block banded path: keep forces in stream form; the
        # per-chunk transposes inside the assembly replace the full-size
        # rows relayout
        block = "tet" if model.padded_tet_count else "hex"
        f = _force_streams(model, xs, stiffness_scale, block)
        out = _assemble_windowed(model, f, 4 if block == "tet" else 8)
    else:
        rows = element_force_rows(model, xs, stiffness_scale)
        out = assemble(model, rows)
    out = out + (mass_factor * model.lumped_mass)[:, None] * xs
    out = jnp.where(model.bc_mask, x, out)
    if model.has_damping and model.damp_factor is not None:
        # Lysmer-Kuhlemeyer dashpots enter K_eff as + a1 * C
        # (physics/absorbing.py); free-row masking on BOTH sides (xs is
        # input-sanitized) keeps the operator symmetric for CG.
        from ..physics.absorbing import sym_apply

        term = model.damp_factor * sym_apply(model.damp_blocks, xs)
        out = out + jnp.where(model.bc_mask, 0.0, term)
    return out
