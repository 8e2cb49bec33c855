"""Device-resident block-Jacobi PCG as a single ``lax.while_loop``.

Rebuild of /root/reference/src/gpu/pcg.cpp:696-918 — but where the reference
ran its PCG loop on the CPU, calling out per kernel (its Phase 9+ goal of a
fully device-resident loop was never shipped, pcg.hpp:191), here the entire
solve is one jitted while_loop: zero host round-trips per iteration.

Precision contract (README.md:14, docs/spec.md:16): FP32 vectors in the hot
loop, FP64 dot-product reductions.  The reference chunks FP64 partials per
256-lane workgroup (pcg.cpp:170-207); on TPU the same contract is a cast to
f64 + ``jnp.sum`` — under ``pjit`` this becomes an f64 ``psum`` over the mesh
axis, directly replacing pcg_dot_partials/pcg_reduce_final.slang.

Dirichlet semantics preserved at all five touchpoints (pcg.cpp:458-475,
530-546, 674-686, 860, 903-914): sanitize input, identity rows in the
operator, x=rhs / r=0 after every solution update, and p zeroed on
constrained axes.

Degenerate denominators (|p.Ap| or |rho| < 1e-18, pcg.cpp:846-851, 888-892)
cannot raise inside jit; they set ``breakdown`` in the telemetry and stop the
loop with converged=False.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..mesh.pack import PackedModel

_BREAKDOWN_TOL = 1.0e-18
_RHS_NORM_FLOOR = 1.0e-12  # pcg.cpp:774


class PcgTelemetry(NamedTuple):
    """Solve statistics (pcg.hpp:126-133). Array-valued for jit returns."""

    iterations: jax.Array  # int32
    residual_norm: jax.Array  # f64
    rhs_norm: jax.Array  # f64
    alpha_last: jax.Array  # f64
    beta_last: jax.Array  # f64
    converged: jax.Array  # bool
    breakdown: jax.Array  # bool — denominator/rho collapse


def dot_f64(a: jax.Array, b: jax.Array, dtype=jnp.float64) -> jax.Array:
    """High-precision reduction over f32 solver vectors (any layout) — the
    precision contract.  ``dtype`` honors the YAML ``precision.reductions``
    knob (config.hpp:152-156): float64 by default; float32 is the opt-out
    that keeps everything in f32.

    fp64 is implemented CHUNKED, mirroring the reference's design
    (pcg.cpp:170-207, pcg_dot_partials.slang: f32 products reduced per
    256-lane workgroup, f64 partials combined at the end): the f32 product
    is partially reduced along the minor axis (Z = a few hundred entries
    for CSG grids, 3 for nodal rows), and only the partials accumulate in
    f64.  Casting whole 50M-DOF vectors to emulated f64 on v5e measured
    5.5 ms for the three PCG dots; the chunked form measures 1.5 ms with
    the same trajectories.  The partial reduction runs over the UNSHARDED
    minor axis, so under GSPMD the f64 combine is a per-shard partial +
    psum over the mesh axis, exactly the pcg_reduce_final.slang role.
    """
    if dtype == jnp.float32:
        return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32))
    prod = a * b  # f32 vectors stay f32 (chunked); f64 vectors keep f64
    if prod.ndim >= 2:
        partial = jnp.sum(prod, axis=-1)  # minor-axis chunks
        return jnp.sum(partial.astype(dtype))
    return jnp.sum(prod.astype(dtype))


def _clamp_dirichlet(model: PackedModel, rhs, x, r):
    """x = rhs, r = 0 on constrained axes (pcg.cpp:458-475)."""
    x = jnp.where(model.bc_mask, rhs, x)
    r = jnp.where(model.bc_mask, 0.0, r)
    return x, r


class _Carry(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    rho: jax.Array
    residual_norm: jax.Array
    alpha_last: jax.Array
    beta_last: jax.Array
    iteration: jax.Array
    converged: jax.Array
    breakdown: jax.Array


def solve_pcg(
    model: PackedModel,
    rhs: jax.Array,
    stiffness_scale,
    mass_factor,
    relative_tolerance,
    max_iterations,
    x0: jax.Array,
    warm_start: bool = True,
    reduction_dtype=jnp.float64,
    vector_dtype=jnp.float32,
    preconditioner=None,
):
    """PCG solve; returns (solution (N*, 3) vectors, PcgTelemetry).

    ``relative_tolerance`` and ``max_iterations`` may be traced scalars so
    pause-mode tolerance switches and adaptive policies never recompile.
    ``reduction_dtype`` is the dot-product accumulator type (the YAML
    ``precision.reductions`` knob); ``vector_dtype`` is the solver-vector
    type (``precision.vectors`` — f32 contract by default, f64 as the
    accuracy/debug mode, config.hpp:152-156).

    ``preconditioner``: a prebuilt ``model.build_preconditioner(ss, mf)``
    result to reuse across solves.  Building it in-solve costs 80 ms of the
    ~460 ms step at 50M DOF (ADR-17) and only depends on dt through
    (ss, mf), so the stepper hoists it and rebuilds on dt changes only.
    """
    f32 = vector_dtype
    rdt = reduction_dtype

    def rdot(a, b):
        return dot_f64(a, b, rdt)

    block_inverse = (
        model.build_preconditioner(stiffness_scale, mass_factor)
        if preconditioner is None
        else preconditioner
    )

    x = x0 if warm_start else jnp.zeros_like(x0)

    ax = model.apply_keff(x, stiffness_scale, mass_factor)
    r = (rhs - ax).astype(f32)
    x, r = _clamp_dirichlet(model, rhs, x, r)

    rhs_norm_true = jnp.sqrt(rdot(rhs, rhs))
    rhs_norm = jnp.where(rhs_norm_true < _RHS_NORM_FLOOR, 1.0, rhs_norm_true)
    tolerance = relative_tolerance * rhs_norm

    residual_norm = jnp.sqrt(rdot(r, r))
    converged0 = residual_norm <= tolerance

    z = model.apply_preconditioner(block_inverse, r)
    rho0 = rdot(r, z)
    breakdown0 = jnp.logical_and(
        jnp.logical_not(converged0), jnp.abs(rho0) < _BREAKDOWN_TOL
    )
    p = jnp.where(model.bc_mask, 0.0, z).astype(f32)

    max_iters = jnp.asarray(max_iterations, dtype=jnp.int32)

    def cond(carry: _Carry):
        return jnp.logical_and(
            carry.iteration < max_iters,
            jnp.logical_and(
                jnp.logical_not(carry.converged), jnp.logical_not(carry.breakdown)
            ),
        )

    def body(carry: _Carry) -> _Carry:
        # named scopes = the reference's per-dispatch RGP labels
        # (newmark_stepper.cpp:809-817) for jax.profiler traces
        with jax.named_scope("pcg_matvec"):
            ap = model.apply_keff(carry.p, stiffness_scale, mass_factor)
        denom = rdot(carry.p, ap)
        breakdown = jnp.abs(denom) < _BREAKDOWN_TOL
        safe_denom = jnp.where(breakdown, 1.0, denom)
        alpha = carry.rho / safe_denom

        # f32 axpys with an f32 scalar — exactly the reference's fp32
        # pcg_axpy.slang (alpha/beta arrive as f32 cbuffer scalars there
        # too); promoting the 50M-DOF vectors to emulated f64 measured
        # +1.5 ms/iteration on v5e for identical trajectories.
        alpha32 = alpha.astype(f32)
        x = carry.x + alpha32 * carry.p
        r = carry.r - alpha32 * ap
        # The reference re-clamps x/r on constrained axes every iteration
        # (pcg.cpp:860, 903-914).  Here the clamp is an exact no-op by
        # invariant — p is zeroed on constrained axes each iteration, the
        # operator's identity rows give ap = p = 0 there, so x stays = rhs
        # and r stays = 0 bit-for-bit from the pre-loop clamp — and is
        # elided to save the bc/rhs reads (pinned by the parity tests).

        # precondition BEFORE the norms: r-update, preconditioner apply and
        # both r-reductions then fuse into adjacent passes over r/z.  (A
        # hand-fused Pallas version of this whole tail was measured and
        # removed — XLA's loop fusion already delivers it, ADR-16.)
        with jax.named_scope("pcg_precondition"):
            z = model.apply_preconditioner(block_inverse, r)
        residual_norm = jnp.sqrt(rdot(r, r))
        converged = residual_norm <= tolerance

        rho_new = rdot(r, z)
        beta = rho_new / jnp.where(jnp.abs(carry.rho) < _BREAKDOWN_TOL, 1.0, carry.rho)
        rho_breakdown = jnp.logical_and(
            jnp.logical_not(converged), jnp.abs(carry.rho) < _BREAKDOWN_TOL
        )
        p = z + beta.astype(f32) * carry.p
        p = jnp.where(model.bc_mask, 0.0, p)

        stop = jnp.logical_or(converged, jnp.logical_or(breakdown, rho_breakdown))
        return _Carry(
            x=jnp.where(breakdown, carry.x, x),
            r=jnp.where(breakdown, carry.r, r),
            p=jnp.where(stop, carry.p, p),
            rho=jnp.where(stop, carry.rho, rho_new),
            residual_norm=jnp.where(breakdown, carry.residual_norm, residual_norm),
            alpha_last=jnp.where(breakdown, carry.alpha_last, alpha),
            beta_last=jnp.where(stop, carry.beta_last, beta),
            iteration=carry.iteration + jnp.where(breakdown, 0, 1),
            converged=converged,
            breakdown=jnp.logical_or(breakdown, rho_breakdown),
        )

    init = _Carry(
        x=x,
        r=r,
        p=p,
        rho=rho0,
        residual_norm=residual_norm,
        alpha_last=jnp.asarray(0.0, rdt),
        beta_last=jnp.asarray(0.0, rdt),
        iteration=jnp.asarray(0, jnp.int32),
        converged=converged0,
        breakdown=breakdown0,
    )
    final = jax.lax.while_loop(cond, body, init)

    telemetry = PcgTelemetry(
        iterations=final.iteration,
        residual_norm=final.residual_norm,
        rhs_norm=rhs_norm_true,
        alpha_last=final.alpha_last,
        beta_last=final.beta_last,
        converged=final.converged,
        breakdown=final.breakdown,
    )
    return final.x, telemetry
