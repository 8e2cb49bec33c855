"""Banded halo-exchange K_eff operator for the general (unstructured) path.

Runs the two-phase gather matvec (ops/apply_keff.py semantics, reference
twin /root/reference/src/gpu/pcg.cpp:505-694) per shard under
``jax.shard_map`` using the tables planned by
:mod:`parallel.general_halo`:

1. sanitize locally (row-local), receive the +1 neighbor's first G
   sanitized rows (one ``ppermute``) — the element u-gather reads the
   (L+G, 3) extended window;
2. per-shard element force streams — the SAME math as the single-chip
   path (the Pallas streaming kernel when the shard's element block is
   kernel-aligned, the XLA scalar-component streams otherwise);
3. per-shard CSR assembly over L+G node rows from local force rows,
   send the G ghost-row partial sums forward (second ``ppermute``), add;
4. mass term + Dirichlet identity rows, row-local.

Exactly 2 collective-permutes of (G, 3) f32 per matvec replace GSPMD's
implicit full-vector all-gathers; dots/axpys/preconditioner stay GSPMD
row-sharded outside this operator, mirroring ops/structured_sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .apply_keff import _element_backend, _stream_math
from .pallas.element_forces import (
    BLOCK_ELEMS,
    hex_force_streams,
    tet_force_streams,
)


def _local_forces(us, grads_l, vol_l, lam_l, mu_l, block, ss):
    """(nl*3, E_s) per-shard force streams (mirrors _force_streams)."""
    n_local, n_gp = (4, 1) if block == "tet" else (8, 8)
    e_s = us.shape[1]
    n_streams = n_local * 3
    backend = _element_backend()
    if backend != "xla" and e_s >= BLOCK_ELEMS and e_s % BLOCK_ELEMS == 0:
        kernel = tet_force_streams if block == "tet" else hex_force_streams
        eq = e_s // 128
        f = kernel(
            grads_l.reshape(-1, eq, 128),
            us.reshape(n_streams, eq, 128),
            (vol_l * ss).reshape(-1, eq, 128),
            jnp.stack([lam_l, mu_l]).reshape(2, eq, 128),
            interpret=backend == "interpret",
        )
        return f.reshape(n_streams, e_s)
    if block == "tet":
        vs = vol_l * ss
        return _stream_math(
            us, lambda g, l, a: grads_l[l, a], lambda g: vs,
            lam_l, mu_l, n_local, n_gp,
        )
    volss = vol_l * ss
    return _stream_math(
        us, lambda g, l, a: grads_l[g, l, a], lambda g: volss[g],
        lam_l, mu_l, n_local, n_gp,
    )


def apply_keff_general_sharded(model, x, stiffness_scale, mass_factor):
    """K_eff * x with explicit banded halo exchange (plan attached by
    ``parallel.sharding.shard_simulation``).  Same semantics as
    ops/apply_keff.apply_keff — identical output, 2 ppermutes per call."""
    mesh = model.shard_mesh
    ax = model.shard_axis
    n = int(mesh.shape[ax])
    block = model.halo_block
    L = model.halo_local_nodes
    G = model.halo_ghost
    nl = 4 if block == "tet" else 8
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]

    def local_fn(x_loc, bc_loc, mass_loc, conn_l, grads_l, vol_l,
                 lam_l, mu_l, ci, cw, ss, mf):
        xs = jnp.where(bc_loc, 0.0, x_loc)  # sanitize (row-local)
        if G:
            ghost = jax.lax.ppermute(xs[:G], ax, bwd)
            x_ext = jnp.concatenate([xs, ghost], axis=0)  # (L+G, 3)
        else:
            x_ext = xs
        e_s = conn_l.shape[0]
        us = x_ext[conn_l.reshape(-1)].reshape(e_s, nl * 3).T
        f = _local_forces(us, grads_l, vol_l, lam_l, mu_l, block, ss)
        rows = f.T.reshape(-1, 3)  # (E_s * nl, 3) local force rows
        out_ext = None
        for d in range(ci.shape[1]):
            term = rows[ci[:, d]] * cw[:, d, None]
            out_ext = term if out_ext is None else out_ext + term
        if G:
            recv = jax.lax.ppermute(out_ext[L:], ax, fwd)
            out = out_ext[:L].at[:G].add(recv)
        else:
            out = out_ext
        out = out + (mf * mass_loc)[:, None] * xs
        return jnp.where(bc_loc, x_loc, out)

    grads_spec = (
        P(None, None, ax) if block == "tet" else P(None, None, None, ax)
    )
    vol_spec = P(ax) if block == "tet" else P(None, ax)
    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(ax, None),  # x
            P(ax, None),  # bc_mask
            P(ax),        # lumped_mass
            P(ax, None),  # halo_conn
            grads_spec,
            vol_spec,
            P(ax),        # halo_lam
            P(ax),        # halo_mu
            P(ax, None),  # halo_csr_idx
            P(ax, None),  # halo_csr_weight
            P(),          # stiffness_scale
            P(),          # mass_factor
        ),
        out_specs=P(ax, None),
        check_vma=False,
    )
    out = sharded(
        x, model.bc_mask, model.lumped_mass,
        model.halo_conn, model.halo_grads, model.halo_vol,
        model.halo_lam, model.halo_mu,
        model.halo_csr_idx, model.halo_csr_weight,
        jnp.asarray(stiffness_scale, jnp.float32),
        jnp.asarray(mass_factor, jnp.float32),
    )
    if model.has_damping and model.damp_factor is not None:
        # Lysmer-Kuhlemeyer dashpots: row-local, applied under GSPMD
        # exactly as on the single-chip path (ops/apply_keff.py)
        from ..physics.absorbing import sym_apply

        xs = jnp.where(model.bc_mask, 0.0, x)
        term = model.damp_factor * sym_apply(model.damp_blocks, xs)
        out = out + jnp.where(model.bc_mask, 0.0, term)
    return out
