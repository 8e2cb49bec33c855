"""Geometric multigrid V-cycle preconditioner for the structured fast path.

The reference's only preconditioner is per-node block-Jacobi
(/root/reference/src/gpu/pcg.cpp:479-503), and round-1 measurement showed
PCG iteration count — not the matvec — is the stepping-rate frontier at
scale (27.6 iters/step at 50M DOF, tol 2e-4).  Chebyshev polynomial
acceleration was prototyped and honestly rejected (docs/decisions.md
ADR-14): it trades iterations for the same total Krylov matvecs.  A coarse
grid is the only lever that actually removes work — smooth error components
that block-Jacobi cannot damp are solved on grids 8x smaller per level.

Design (all pieces chosen so the preconditioner is symmetric positive
definite, which PCG requires):

* **Hierarchy**: vertex-centered coarsening of the (X, Y, Z) node grid,
  coarse node i <-> fine node 2i, coarse extent (f+1)//2.  Every coarse
  level is just a smaller :class:`StructuredModel` with doubled spacing —
  the existing homogeneous stencil operator (ops/structured.py) IS the
  coarse operator.  For nested trilinear hex FEM the Galerkin operator
  P^T A P equals the rediscretized-2h operator exactly (coarse trilinear
  shape functions are piecewise trilinear on the fine cells), so
  rediscretization loses nothing where grids nest (pinned by test).
* **Transfers**: trilinear prolongation P (even fine planes copy, odd fine
  planes average their coarse neighbors, tensor-product over axes);
  restriction is exactly P^T.  Coarse lumped mass is P^T m_f — total mass
  is conserved and the interior value equals the rediscretized rho*(2h)^3.
* **Smoother**: damped block-Jacobi z += omega * B^-1 (r - A z) — reuses
  the reference-parity block inverse (pcg.cpp:215-268).  omega = 1/(1.1 *
  max(lambda_K, 1)) with lambda_K = lambda_max(B_K^-1 K) from a one-time
  power iteration per level at model build.  Since A = ss*K + mf*M with M
  diagonal and B = blockdiag(A), A <= max(lambda_K, 1) * B for EVERY
  (ss, mf) >= 0 (elementwise PSD assembly gives K <= 8 B_K, and the mass
  part is exactly its own diagonal), so the damping stays in the SPD range
  for all dt the adaptive policy can produce.
* **Cycle**: symmetric V(1,1) — pre-smooth from zero, coarse-grid
  correction, post-smooth; identical smoother both sides makes the cycle
  operator symmetric, and omega < 2/lambda_max makes it PD.
* **Dirichlet**: residuals entering the cycle are zero on constrained
  axes; transfers are clamped on both sides (Pi_f P Pi_c and its exact
  transpose Pi_c P^T Pi_f), and the identity rows of every level's
  operator keep constrained components at zero throughout.

Scope: homogeneous, unsharded structured grids (the constant-stencil fast
path).  ``attach_multigrid`` silently falls back to block-Jacobi anywhere
else; the YAML knob ``solver.preconditioner: multigrid`` opts a scenario
in (the reference schema already carries the field, config.cpp:311-336).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.structured import StructuredModel

_MIN_COARSE_DIM = 3  # never coarsen an axis below 3 nodes
_MIN_COARSE_NODES = 300  # stop once a level is this small
_MAX_LEVELS = 6  # coarse levels cap
_COARSE_SWEEPS = 4  # smoother sweeps standing in for the coarsest solve
_POWER_ITERS = 24
# levels above this node count reuse the next coarser level's spectral
# estimate — the damped-Jacobi spectrum is grid-self-similar (measured at
# 945k DOF: fine 0.327 vs next-coarser 0.327), and the cutoff keeps the
# one-time hierarchy build free of large-grid compiles
_POWER_MAX_NODES = 150_000
_SAFETY = 1.1


# --------------------------------------------------------------------------
# transfers (trilinear P and exactly-P^T restriction, tensor-product)
# --------------------------------------------------------------------------


def _prolong_axis(x: jax.Array, axis: int, fine_size: int) -> jax.Array:
    """1-D trilinear prolongation along ``axis``: c -> fine_size nodes.

    fine even node 2i = coarse i; fine odd node 2i+1 = (coarse i +
    coarse i+1)/2 (a missing right neighbor past the end contributes 0,
    which is the exact transpose of the restriction's zero pad).
    """
    c = x.shape[axis]
    tail = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
    x_next = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, c, axis=axis), tail], axis=axis
    )
    odd = 0.5 * (x + x_next)
    inter = jnp.stack([x, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * c
    inter = inter.reshape(shape)
    return jax.lax.slice_in_dim(inter, 0, fine_size, axis=axis)


def _restrict_axis(x: jax.Array, axis: int) -> jax.Array:
    """1-D restriction along ``axis`` — the exact transpose of
    :func:`_prolong_axis`: coarse i = fine 2i + (fine 2i-1 + fine 2i+1)/2."""
    f = x.shape[axis]
    c = (f + 1) // 2
    pad = 2 * c - f
    if pad:
        width = [(0, 0)] * x.ndim
        width[axis] = (0, pad)
        x = jnp.pad(x, width)
    shape = list(x.shape)
    shape[axis] = c
    shape.insert(axis + 1, 2)
    xr = x.reshape(shape)
    even = jax.lax.index_in_dim(xr, 0, axis + 1, keepdims=False)
    odd = jax.lax.index_in_dim(xr, 1, axis + 1, keepdims=False)
    head = jnp.zeros_like(jax.lax.slice_in_dim(odd, 0, 1, axis=axis))
    odd_prev = jnp.concatenate(
        [head, jax.lax.slice_in_dim(odd, 0, c - 1, axis=axis)], axis=axis
    )
    return even + 0.5 * (odd + odd_prev)


def prolong(x: jax.Array, fine_shape: Tuple[int, int, int]) -> jax.Array:
    """Coarse CSG vector (3, cX, cY, cZ) -> fine (3, *fine_shape)."""
    for ax in range(3):
        x = _prolong_axis(x, 1 + ax, fine_shape[ax])
    return x


def restrict(x: jax.Array) -> jax.Array:
    """Fine CSG vector (3, X, Y, Z) -> coarse (3, (X+1)//2, ...); exact
    transpose of :func:`prolong` for the matching shapes."""
    for ax in range(3):
        x = _restrict_axis(x, 1 + ax)
    return x


# --------------------------------------------------------------------------
# hierarchy construction (host-side, once per model)
# --------------------------------------------------------------------------


def _restrict_axis_np(x: np.ndarray, axis: int) -> np.ndarray:
    """Host-side twin of :func:`_restrict_axis` (pinned equal by test).

    The hierarchy build runs once on the host; routing these few tiny ops
    through the accelerator cost ~270 s of per-op compiles on the TPU
    relay (each unique eager op shape compiles) for microseconds of math.
    """
    f = x.shape[axis]
    c = (f + 1) // 2
    pad = 2 * c - f
    if pad:
        width = [(0, 0)] * x.ndim
        width[axis] = (0, pad)
        x = np.pad(x, width)
    shape = list(x.shape)
    shape[axis] = c
    shape.insert(axis + 1, 2)
    xr = x.reshape(shape)
    even = np.take(xr, 0, axis=axis + 1)
    odd = np.take(xr, 1, axis=axis + 1)
    odd_prev = np.zeros_like(odd)
    src = [slice(None)] * odd.ndim
    dst = [slice(None)] * odd.ndim
    src[axis] = slice(0, c - 1)
    dst[axis] = slice(1, c)
    odd_prev[tuple(dst)] = odd[tuple(src)]
    return even + 0.5 * (odd + odd_prev)


def _coarsen_model(model: StructuredModel) -> StructuredModel | None:
    """One vertex-centered coarse level of a homogeneous structured model."""
    fx, fy, fz = model.grid_shape
    cx, cy, cz = ((d + 1) // 2 for d in (fx, fy, fz))
    if min(cx, cy, cz) < _MIN_COARSE_DIM:
        return None

    # constraints by injection at the coincident (even-index) fine nodes
    bc_f = np.asarray(model.bc_mask)
    bc_c = np.ascontiguousarray(bc_f[:, ::2, ::2, ::2])

    # coarse lumped mass = P^T m_f (conserves total mass; equals the
    # rediscretized rho*(2h)^3/8-per-corner value in the interior)
    mass_c = np.asarray(model.mass_grid, np.float64)
    for ax in range(3):
        mass_c = _restrict_axis_np(mass_c, ax)

    hx, hy, hz = model.spacing
    nxc, nyc, nzc = cx - 1, cy - 1, cz - 1
    # numpy leaves throughout — every eager jnp.full/zeros here compiled a
    # tiny program on the TPU relay (~400 s for a 4-level hierarchy);
    # attach_multigrid bulk-device_puts the finished levels in one shot
    return StructuredModel(
        lam_grid=np.full((nxc, nyc, nzc), model.lam0, np.float32),
        mu_grid=np.full((nxc, nyc, nzc), model.mu0, np.float32),
        mass_grid=np.asarray(mass_c, np.float32),
        bc_mask=np.ascontiguousarray(bc_c),
        bc_value=np.zeros((3, cx, cy, cz), np.float32),
        position0=np.zeros((1, 3), np.float32),  # never consumed
        nx=nxc,
        ny=nyc,
        nz=nzc,
        node_count=cx * cy * cz,
        padded_node_count=cx * cy * cz,
        pad_planes=0,
        spacing=(2.0 * hx, 2.0 * hy, 2.0 * hz),
        homogeneous=True,
        lam0=model.lam0,
        mu0=model.mu0,
        use_pallas=model.use_pallas,
        pallas_interpret=model.pallas_interpret,
    )


def _estimate_lambda_max(model: StructuredModel) -> float:
    """lambda_max(B_K^-1 K) by power iteration on the free subspace (the
    pure-stiffness extreme; max(lambda, 1) then bounds every (ss, mf)).

    Runs on the CPU backend when one is available: every power-iterated
    level is <= _POWER_MAX_NODES nodes (trivial compute), but each level
    needs its own jit compile, and per-level TPU compiles dominated the
    hierarchy build (~190 s at 945k DOF measured; ~2 s on CPU).  The
    level's arrays are bulk device_put to the CPU first — otherwise every
    eager op in the block-inverse build pulls accelerator-resident inputs
    through the relay one RPC at a time (measured 600+ s at 945k).
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None

    if cpu is not None:
        model = jax.device_put(model, cpu)

    def _run():
        from . import structured as _ops

        binv = _ops.build_block_jacobi_inverse_structured(
            model, np.float32(1.0), np.float32(0.0)
        )

        @jax.jit
        def iterate(w):
            aw = _ops.apply_keff_structured(
                model, w, np.float32(1.0), np.float32(0.0)
            )
            # identity rows return the (zero) constrained input; keep the
            # iterate on the free subspace explicitly anyway
            y = _ops.apply_preconditioner_structured(
                model, binv, jnp.where(model.bc_mask, 0.0, aw)
            )
            norm = jnp.sqrt(jnp.sum(y * y))
            return y / jnp.maximum(norm, 1.0e-30), norm

        rng = np.random.default_rng(7)
        w = jnp.asarray(
            rng.standard_normal(model.vector_shape).astype(np.float32)
        )
        w = jnp.where(model.bc_mask, 0.0, w)
        w = w / jnp.sqrt(jnp.sum(w * w))
        lam = 1.0
        for _ in range(_POWER_ITERS):
            w, lam = iterate(w)
        return float(lam)

    if cpu is None:
        return _run()
    with jax.default_device(cpu):
        return _run()


def attach_multigrid(model: StructuredModel) -> StructuredModel:
    """Return a copy of ``model`` with an MG hierarchy attached and
    ``preconditioner='multigrid'``.

    Falls back to the unchanged (block-Jacobi) model when the fast path's
    assumptions don't hold: heterogeneous material (no constant coarse
    stencil), explicit shard_map decomposition (coarse levels are not yet
    distributed), or a grid too small to coarsen.
    """
    if not model.homogeneous or model.shard_mesh is not None:
        import sys

        reason = (
            "heterogeneous material grid"
            if not model.homogeneous
            else "shard_map X-slab decomposition (coarse levels are not "
            "distributed)"
        )
        print(
            f"note: multigrid preconditioner unavailable ({reason}); "
            "falling back to block_jacobi",
            file=sys.stderr,
        )
        return model
    levels: list[StructuredModel] = []
    cur = model
    while len(levels) < _MAX_LEVELS:
        nxt = _coarsen_model(cur)
        if nxt is None:
            break
        levels.append(nxt)
        cur = nxt
        if cur.node_count <= _MIN_COARSE_NODES:
            break
    if not levels:
        return model

    # spectral bounds per level, coarsest first so big levels can reuse
    # the self-similar coarse estimate instead of full-size matvecs
    all_levels = [model] + levels
    lambdas: list[float] = [0.0] * len(all_levels)
    prev = None
    for i in range(len(all_levels) - 1, -1, -1):
        lvl = all_levels[i]
        if prev is not None and lvl.node_count > _POWER_MAX_NODES:
            lambdas[i] = prev
        else:
            lambdas[i] = _estimate_lambda_max(lvl)
            prev = lambdas[i]
    omegas = tuple(
        1.0 / (_SAFETY * max(lam, 1.0)) for lam in lambdas
    )
    # one bulk transfer of the numpy-built hierarchy onto the default
    # device (no per-array eager compiles on the relay)
    levels_dev = jax.device_put(tuple(levels))
    return dataclasses.replace(
        model,
        mg_levels=levels_dev,
        mg_omegas=omegas,
        preconditioner="multigrid",
    )


# --------------------------------------------------------------------------
# the V-cycle (runs inside the jitted PCG while_loop body)
# --------------------------------------------------------------------------


def _block_inverse_scaled(model, stiffness_scale, mass_factor):
    """Symmetric-packed block-Jacobi inverse with per-node diagonal
    normalization before the 3x3 inversion.

    Coarse-level blocks overflow the plain f32 adjugate/determinant path:
    a level-l node's diagonal is ~ mass_factor * rho * (2^l h)^3 (~3e14 by
    level 5 of the flagship grids), so the determinant's f32 cofactor
    products hit inf - inf = NaN on boundary blocks (and benign-but-useless
    inf -> zero inverses in the interior).  Dividing by the max diagonal
    first puts the determinant at O(1) for every level; the result is the
    same inverse in exact arithmetic (inv(B) = inv(B/s)/s).
    """
    from . import structured as _ops

    blocks = _ops.assemble_node_blocks_structured(
        model, stiffness_scale, mass_factor
    )
    diag = jnp.stack([blocks[0, 0], blocks[1, 1], blocks[2, 2]])
    s = jnp.maximum(jnp.max(diag, axis=0), 1.0e-30)
    inverse = _ops._invert_spd_3x3_lead(blocks / s[None, None]) / s[None, None]
    return jnp.stack(
        [
            inverse[0, 0],
            inverse[1, 1],
            inverse[2, 2],
            inverse[0, 1],
            inverse[0, 2],
            inverse[1, 2],
        ]
    )


def build_mg_preconditioner(model: StructuredModel, stiffness_scale, mass_factor):
    """Per-level block-Jacobi inverses + the traced K_eff scalars (the
    V-cycle needs them for its residual matvecs)."""
    invs = tuple(
        _block_inverse_scaled(lvl, stiffness_scale, mass_factor)
        for lvl in (model,) + model.mg_levels
    )
    return (invs, stiffness_scale, mass_factor)


def apply_mg_preconditioner(model: StructuredModel, precond, residual):
    """z = V_cycle(r) — symmetric positive definite by construction."""
    invs, ss, mf = precond
    levels = (model,) + model.mg_levels
    return _vcycle(levels, invs, model.mg_omegas, 0, residual, ss, mf)


def _vcycle(levels, invs, omegas, li, r, ss, mf):
    from . import structured as _ops

    model = levels[li]
    om = np.float32(omegas[li])
    with jax.named_scope(f"mg_level{li}"):
        # pre-smooth from zero initial guess (constrained components of r
        # are zero and the apply zeroes constrained outputs)
        z = om * _ops.apply_preconditioner_structured(model, invs[li], r)

        if li == len(levels) - 1:
            for _ in range(_COARSE_SWEEPS - 1):
                resid = r - _ops.apply_keff_structured(model, z, ss, mf)
                z = z + om * _ops.apply_preconditioner_structured(
                    model, invs[li], resid
                )
            return z

        d = r - _ops.apply_keff_structured(model, z, ss, mf)
        coarse = levels[li + 1]
        rc = restrict(d)
        rc = jnp.where(coarse.bc_mask, 0.0, rc)
        ec = _vcycle(levels, invs, omegas, li + 1, rc, ss, mf)
        corr = prolong(ec, model.grid_shape)
        z = z + jnp.where(model.bc_mask, 0.0, corr)

        # post-smooth (same smoother -> symmetric cycle operator)
        resid = r - _ops.apply_keff_structured(model, z, ss, mf)
        z = z + om * _ops.apply_preconditioner_structured(model, invs[li], resid)
    return z
