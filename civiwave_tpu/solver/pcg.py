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


def dot_partials(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32 minor-axis-chunked partial products of one dot (the chunk phase
    of :func:`dot_f64` without the final accumulate) — building block of
    the fused single-reduction variant."""
    prod = a * b
    if prod.ndim >= 2:
        return jnp.sum(prod, axis=-1)
    return prod


def fused_dots(pairs, dtype=jnp.float64) -> jax.Array:
    """k dot products reduced in ONE pass: returns a (k,) vector.

    Each pair's f32 chunk partials are stacked along a new leading axis and
    the whole stack is accumulated in ``dtype`` by a single reduce.  Under
    GSPMD this lowers to one per-shard partial reduction + ONE (k,)-vector
    all-reduce over the mesh axis — the communication-reduced analogue of
    pcg_reduce_final.slang, where the classic loop's three dependent dots
    cost three sequential all-reduces per iteration.
    """
    parts = [dot_partials(a, b) for a, b in pairs]
    stacked = jnp.stack(parts)
    axes = tuple(range(1, stacked.ndim))
    if dtype == jnp.float32:
        return jnp.sum(stacked.astype(jnp.float32), axis=axes)
    return jnp.sum(stacked.astype(dtype), axis=axes)


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
    variant: str = "classic",
    replace_every: int = 10,
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

    ``variant``: 'classic' is the reference's 3-dot loop (pcg.cpp:830-915);
    'fused' is the Chronopoulos-Gear single-reduction recurrence (one
    all-reduce per iteration — see :func:`solve_pcg_fused`); 'pipelined'
    is the Ghysels-Vanroose recurrence whose single reduction additionally
    OVERLAPS with the preconditioner+matvec (see
    :func:`solve_pcg_pipelined`); 'auto' (the default) picks 'fused' when
    the model can run the whole-iteration Pallas kernel (large structured
    TPU grids — see :func:`_solve_pcg_megafused`) or when it is
    GSPMD-sharded (one all-reduce per iteration instead of 2-3), and
    'classic' otherwise.

    ``replace_every``: pipelined-variant residual-replacement period
    (the YAML ``solver.replace_every`` knob); 0 disables replacement.
    Ignored by the other variants, which recompute M^-1 r fresh each
    iteration and need no replacement.
    """
    block_inverse = (
        model.build_preconditioner(stiffness_scale, mass_factor)
        if preconditioner is None
        else preconditioner
    )
    if variant == "auto":
        # fused when the structured model profits from the pc+matvec
        # kernel at this size (ADR-22 crossover) or under GSPMD (one
        # all-reduce per iteration instead of 2-3); classic otherwise
        prefers = getattr(model, "prefers_fused_pcg", None)
        kernel_pref = prefers is not None and prefers(
            block_inverse, vector_dtype
        )
        sharded = getattr(model, "shard_mesh", None) is not None
        variant = "fused" if (kernel_pref or sharded) else "classic"
    if variant == "fused":
        return solve_pcg_fused(
            model, rhs, stiffness_scale, mass_factor, relative_tolerance,
            max_iterations, x0, warm_start=warm_start,
            reduction_dtype=reduction_dtype, vector_dtype=vector_dtype,
            preconditioner=block_inverse,
        )
    if variant == "pipelined":
        return solve_pcg_pipelined(
            model, rhs, stiffness_scale, mass_factor, relative_tolerance,
            max_iterations, x0, warm_start=warm_start,
            reduction_dtype=reduction_dtype, vector_dtype=vector_dtype,
            preconditioner=block_inverse, replace_every=replace_every,
        )
    f32 = vector_dtype
    rdt = reduction_dtype

    def rdot(a, b):
        return dot_f64(a, b, rdt)

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


class _FusedCarry(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    s: jax.Array  # A p (recurred, not recomputed)
    gamma: jax.Array  # (r, u) of the current iterate
    alpha: jax.Array  # step length to apply next
    residual_norm: jax.Array
    alpha_last: jax.Array
    beta_last: jax.Array
    iteration: jax.Array
    converged: jax.Array
    breakdown: jax.Array


def solve_pcg_fused(
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
    """Chronopoulos-Gear PCG: ONE fused reduction per iteration.

    Mathematically identical to classic PCG (same alpha/beta/iterates in
    exact arithmetic; Chronopoulos & Gear 1989, the standard
    single-synchronization CG reformulation), but the three dot products
    are rearranged to be mutually independent so they reduce in one pass:

        x += alpha p ; r -= alpha s          (s = A p, recurred)
        u  = M^-1 r ; w = A u
        gamma' = (r,u); delta = (w,u); rr = (r,r)   <- ONE (3,)-all-reduce
        beta  = gamma'/gamma
        alpha = gamma' / (delta - beta gamma'/alpha)
        p = u + beta p ; s = w + beta s

    The classic loop (pcg.cpp:830-915, solve_pcg above) serializes p.Ap
    before the x/r update and r.r / r.z after it — two dependent reduction
    points, 2-3 sequential f64 all-reduces per iteration under GSPMD.  Here
    the single (3,) reduction is the only collective per iteration, which
    is what the >=500 steps/s north star at 10M DOF on v5p-32 needs: the
    per-iteration critical path becomes matvec + precondition + ONE
    ~10-20 us all-reduce (README projection).  Cost: one extra recurrence
    vector (s) and one extra matvec at setup (w0 = A u0) — ~1/iters
    single-chip overhead, which is why 'classic' stays the single-chip
    default.

    Numerics: the recurred s = A p drifts from the true A p by rounding at
    ~1e-7/iteration in f32; at the 2e-4 runtime tolerance and <=120
    iteration caps used here the trajectories match classic to within
    test tolerances (pinned by tests/test_pcg.py).
    """
    f32 = vector_dtype
    rdt = reduction_dtype

    block_inverse = (
        model.build_preconditioner(stiffness_scale, mass_factor)
        if preconditioner is None
        else preconditioner
    )

    # whole-iteration kernel path: on the eligible structured TPU path the
    # ENTIRE iteration (p/s recurrence, axpys, pc apply, matvec, all three
    # dots) is one Pallas pass — see _solve_pcg_megafused
    builder = getattr(model, "build_fused_pcg_iteration", None)
    if builder is not None:
        bundle = builder(
            block_inverse, stiffness_scale, mass_factor, rdt, f32
        )
        if bundle is not None:
            return _solve_pcg_megafused(
                model, rhs, stiffness_scale, mass_factor,
                relative_tolerance, max_iterations, x0,
                warm_start=warm_start, reduction_dtype=rdt,
                vector_dtype=f32, block_inverse=block_inverse,
                bundle=bundle,
            )

    x = x0 if warm_start else jnp.zeros_like(x0)

    ax = model.apply_keff(x, stiffness_scale, mass_factor)
    r = (rhs - ax).astype(f32)
    x, r = _clamp_dirichlet(model, rhs, x, r)

    # pc apply + matvec back-to-back: the structured TPU path fuses both
    # into ONE Pallas pass over r (ops.structured.apply_pc_keff_structured)
    with jax.named_scope("pcg_pc_matvec"):
        u, w = model.apply_pc_keff(
            block_inverse, r, stiffness_scale, mass_factor
        )
    # one fused setup reduction: gamma0, delta0, ||r||^2 and ||rhs||^2
    gamma0, delta0, rr0, rhs2 = fused_dots(
        [(r, u), (w, u), (r, r), (rhs, rhs)], rdt
    )
    rhs_norm_true = jnp.sqrt(rhs2)
    rhs_norm = jnp.where(rhs_norm_true < _RHS_NORM_FLOOR, 1.0, rhs_norm_true)
    tolerance = relative_tolerance * rhs_norm

    residual_norm = jnp.sqrt(rr0)
    converged0 = residual_norm <= tolerance

    delta_breakdown0 = jnp.abs(delta0) < _BREAKDOWN_TOL
    breakdown0 = jnp.logical_and(jnp.logical_not(converged0), delta_breakdown0)
    alpha0 = gamma0 / jnp.where(delta_breakdown0, 1.0, delta0)

    p = jnp.where(model.bc_mask, 0.0, u).astype(f32)
    s = jnp.where(model.bc_mask, 0.0, w).astype(f32)

    max_iters = jnp.asarray(max_iterations, dtype=jnp.int32)

    def cond(carry: _FusedCarry):
        return jnp.logical_and(
            carry.iteration < max_iters,
            jnp.logical_and(
                jnp.logical_not(carry.converged), jnp.logical_not(carry.breakdown)
            ),
        )

    # the structured TPU path can emit the three iteration dots as row
    # partials from the pc+matvec kernel pass itself (None = compose)
    dots_fn = getattr(model, "apply_pc_keff_dots", None)

    def body(carry: _FusedCarry) -> _FusedCarry:
        alpha32 = carry.alpha.astype(f32)
        x = carry.x + alpha32 * carry.p
        r = carry.r - alpha32 * carry.s
        # constrained axes: p and s are zero there by recurrence (u, w are
        # bc-zeroed each iteration), so x stays = rhs and r stays = 0
        # bit-for-bit — the same proved-no-op clamp elision as classic.
        fused_out = None
        if dots_fn is not None:
            fused_out = dots_fn(
                block_inverse, r, stiffness_scale, mass_factor, rdt
            )
        if fused_out is not None:
            with jax.named_scope("pcg_pc_matvec_dots"):
                u, w, (gamma_new, delta, rr) = fused_out
        else:
            with jax.named_scope("pcg_pc_matvec"):
                u, w = model.apply_pc_keff(
                    block_inverse, r, stiffness_scale, mass_factor
                )
            with jax.named_scope("pcg_fused_reduction"):
                gamma_new, delta, rr = fused_dots(
                    [(r, u), (w, u), (r, r)], rdt
                )
        residual_norm = jnp.sqrt(rr)
        converged = residual_norm <= tolerance

        gamma_breakdown = jnp.abs(carry.gamma) < _BREAKDOWN_TOL
        beta = gamma_new / jnp.where(gamma_breakdown, 1.0, carry.gamma)
        alpha_denom = delta - beta * gamma_new / jnp.where(
            jnp.abs(carry.alpha) < _BREAKDOWN_TOL, 1.0, carry.alpha
        )
        denom_breakdown = jnp.abs(alpha_denom) < _BREAKDOWN_TOL
        alpha_new = gamma_new / jnp.where(denom_breakdown, 1.0, alpha_denom)

        breakdown = jnp.logical_and(
            jnp.logical_not(converged),
            jnp.logical_or(gamma_breakdown, denom_breakdown),
        )
        stop = jnp.logical_or(converged, breakdown)

        beta32 = beta.astype(f32)
        p = u + beta32 * carry.p
        p = jnp.where(model.bc_mask, 0.0, p)
        s = (w + beta32 * carry.s).astype(f32)
        s = jnp.where(model.bc_mask, 0.0, s)

        return _FusedCarry(
            x=x,
            r=r,
            p=jnp.where(stop, carry.p, p),
            s=jnp.where(stop, carry.s, s),
            gamma=jnp.where(stop, carry.gamma, gamma_new),
            alpha=jnp.where(stop, carry.alpha, alpha_new),
            residual_norm=residual_norm,
            alpha_last=carry.alpha,  # the step just applied
            beta_last=jnp.where(stop, carry.beta_last, beta),
            iteration=carry.iteration + 1,
            converged=converged,
            breakdown=breakdown,
        )

    init = _FusedCarry(
        x=x,
        r=r,
        p=p,
        s=s,
        gamma=gamma0,
        alpha=alpha0,
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


class _PipelinedCarry(NamedTuple):
    x: jax.Array
    r: jax.Array
    u: jax.Array  # M^-1 r (recurred)
    w: jax.Array  # K_eff u (recurred)
    p: jax.Array  # direction
    s: jax.Array  # K_eff p (recurred)
    q: jax.Array  # M^-1 s (recurred)
    z: jax.Array  # K_eff q (recurred)
    gamma: jax.Array  # (r, u) of the previous iterate
    alpha: jax.Array  # previous step length
    residual_norm: jax.Array
    alpha_last: jax.Array
    beta_last: jax.Array
    iteration: jax.Array
    converged: jax.Array
    breakdown: jax.Array


def solve_pcg_pipelined(
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
    replace_every: int = 10,
):
    """Ghysels-Vanroose pipelined PCG: the one reduction per iteration
    OVERLAPS with the preconditioner apply + matvec.

    The fused (Chronopoulos-Gear) loop already collapses the three dots
    into one all-reduce per iteration, but that all-reduce sits on the
    critical path between iterations: the (gamma, delta) it produces feed
    the very next axpys.  In the north-star regime (README projection —
    ~105k nodes/chip on v5p-32) the ~15 us ICI all-reduce latency is the
    DOMINANT per-iteration term, larger than the per-shard compute.  The
    Ghysels-Vanroose reformulation (Ghysels & Vanroose, Parallel
    Computing 40, 2014 — the standard latency-hiding CG) moves the heavy
    work (m = M^-1 w, n = K_eff m) BETWEEN the dot-partial computation and
    the first use of the reduced scalars, so XLA's latency-hiding
    scheduler can run the async all-reduce concurrently with the
    pc+matvec pass:

        gamma' = (r,u); delta = (w,u); rr = (r,r)   <- ONE all-reduce,
        m = M^-1 w ; n = K_eff m                       overlapped with this
        beta  = gamma'/gamma ; alpha = gamma'/(delta - beta gamma'/alpha)
        z = n + beta z ; q = m + beta q ; p = u + beta p ; s = w + beta s
        x += alpha p ; r -= alpha s ; u -= alpha q ; w -= alpha z

    Identical iterates to classic/fused CG in exact arithmetic.  Costs vs
    fused: two extra recurrence vectors (q, z) and 8 axpys instead of 4 —
    ~2x the vector tail — plus one trailing pc+matvec pass per solve (the
    convergence check sees the residual one iteration late).  On a single
    chip this LOSES; it exists for the multi-chip latency wall, selected
    via ``solver: variant: pipelined`` in the scenario YAML.

    Dirichlet semantics: r is clamped to 0 on constrained axes before the
    loop; the preconditioner's and operator's identity rows then keep
    every recurrence vector (u, w, m, n and all four directions) exactly
    zero there by induction, so x stays = rhs bit-for-bit — the same
    proved-no-op clamp elision as the other variants.

    Numerics: unlike classic/fused CG — which recompute M^-1 r (and A p)
    fresh from the recurred residual every iteration, so rounding errors
    stay RELATIVE to the shrinking iterate scale — the pipelined u/w
    recurrences accumulate an ABSOLUTE f32 error floor set by the largest
    early iterates.  At the 2e-4 runtime tolerance this never matters
    (trajectory parity with classic, measured); at tighter tolerances the
    loop would stall, so every ``replace_every`` iterations the recurred
    (u, w) are recomputed from the recurred r with one extra pc+matvec
    pass — the Ghysels-Vanroose residual-replacement strategy (their
    section 4).  Measured on the kappa~1e12 test bar (f32): no
    replacement stalls at ~5e-5 relative; replace_every=10 converges to
    1e-7 in 34 iterations (classic: 12 — the extra iterations rebuild the
    Krylov information the drift destroyed).  The trigger is purely
    ``(iteration+1) % replace_every == 0`` — it fires regardless of
    tolerance, so a ~25-iteration production solve at 2e-4 pays 2 extra
    pc+matvec passes.  ``replace_every=0`` disables replacement entirely
    (safe at production tolerances, where the f32 drift floor sits far
    below 2e-4); it is plumbed through :func:`solve_pcg` and the YAML
    ``solver.replace_every`` knob.
    """
    f32 = vector_dtype
    rdt = reduction_dtype

    block_inverse = (
        model.build_preconditioner(stiffness_scale, mass_factor)
        if preconditioner is None
        else preconditioner
    )

    x = x0 if warm_start else jnp.zeros_like(x0)

    ax = model.apply_keff(x, stiffness_scale, mass_factor)
    r = (rhs - ax).astype(f32)
    x, r = _clamp_dirichlet(model, rhs, x, r)

    with jax.named_scope("pcg_pc_matvec"):
        u, w = model.apply_pc_keff(
            block_inverse, r, stiffness_scale, mass_factor
        )
    u = jnp.where(model.bc_mask, 0.0, u).astype(f32)
    w = jnp.where(model.bc_mask, 0.0, w).astype(f32)

    rhs_norm_true = jnp.sqrt(dot_f64(rhs, rhs, rdt))
    rhs_norm = jnp.where(rhs_norm_true < _RHS_NORM_FLOOR, 1.0, rhs_norm_true)
    tolerance = relative_tolerance * rhs_norm

    # pre-loop convergence check (matches classic/fused): an already-
    # converged x0 (or max_iterations=0) must report converged=True with
    # the true initial residual, not inf, and skip the loop body's
    # pc+matvec entirely.
    residual_norm0 = jnp.sqrt(dot_f64(r, r, rdt))
    converged0 = residual_norm0 <= tolerance

    max_iters = jnp.asarray(max_iterations, dtype=jnp.int32)
    zeros = jnp.zeros_like(r)

    def cond(c: _PipelinedCarry):
        return jnp.logical_and(
            c.iteration < max_iters,
            jnp.logical_and(
                jnp.logical_not(c.converged), jnp.logical_not(c.breakdown)
            ),
        )

    def body(c: _PipelinedCarry) -> _PipelinedCarry:
        # dot partials FIRST: the (3,) reduction result is not consumed
        # until after the pc+matvec below, so under GSPMD the all-reduce
        # runs concurrently with it (async start here, done at 'beta')
        with jax.named_scope("pcg_pipelined_reduction"):
            gamma_new, delta, rr = fused_dots(
                [(c.r, c.u), (c.w, c.u), (c.r, c.r)], rdt
            )
        with jax.named_scope("pcg_pc_matvec"):
            m, w_of_m = model.apply_pc_keff(
                block_inverse, c.w, stiffness_scale, mass_factor
            )
        n = w_of_m.astype(f32)
        m = m.astype(f32)

        residual_norm = jnp.sqrt(rr)
        converged = residual_norm <= tolerance

        first = c.iteration == 0
        gamma_breakdown = jnp.logical_and(
            jnp.logical_not(first), jnp.abs(c.gamma) < _BREAKDOWN_TOL
        )
        beta = jnp.where(
            first,
            jnp.asarray(0.0, rdt),
            gamma_new / jnp.where(gamma_breakdown, 1.0, c.gamma),
        )
        alpha_denom = delta - beta * gamma_new / jnp.where(
            jnp.abs(c.alpha) < _BREAKDOWN_TOL, 1.0, c.alpha
        )
        denom_breakdown = jnp.abs(alpha_denom) < _BREAKDOWN_TOL
        alpha = gamma_new / jnp.where(denom_breakdown, 1.0, alpha_denom)

        breakdown = jnp.logical_and(
            jnp.logical_not(converged),
            jnp.logical_or(gamma_breakdown, denom_breakdown),
        )
        stop = jnp.logical_or(converged, breakdown)

        beta32 = beta.astype(f32)
        alpha32 = alpha.astype(f32)
        z = n + beta32 * c.z
        q = m + beta32 * c.q
        p = c.u + beta32 * c.p
        s = c.w + beta32 * c.s
        x = c.x + alpha32 * p
        r = c.r - alpha32 * s
        u = c.u - alpha32 * q
        w = c.w - alpha32 * z

        if replace_every:
            # periodic residual replacement (see docstring): recompute the
            # recurred (u, w) from the recurred r.  The predicate is
            # derived from the replicated iteration counter, so under
            # GSPMD every device takes the same branch and the branch's
            # halo collectives stay uniform.
            want = jnp.logical_and(
                jnp.logical_not(stop),
                (c.iteration + 1) % jnp.asarray(replace_every, jnp.int32)
                == 0,
            )

            def _replace(r_new):
                with jax.named_scope("pcg_residual_replacement"):
                    u2, w2 = model.apply_pc_keff(
                        block_inverse, r_new, stiffness_scale, mass_factor
                    )
                return (
                    jnp.where(model.bc_mask, 0.0, u2).astype(f32),
                    jnp.where(model.bc_mask, 0.0, w2).astype(f32),
                )

            u, w = jax.lax.cond(
                want, _replace, lambda _rn: (u, w), r
            )

        return _PipelinedCarry(
            x=jnp.where(stop, c.x, x),
            r=jnp.where(stop, c.r, r),
            u=jnp.where(stop, c.u, u),
            w=jnp.where(stop, c.w, w),
            p=jnp.where(stop, c.p, p),
            s=jnp.where(stop, c.s, s),
            q=jnp.where(stop, c.q, q),
            z=jnp.where(stop, c.z, z),
            gamma=jnp.where(stop, c.gamma, gamma_new),
            alpha=jnp.where(stop, c.alpha, alpha),
            residual_norm=residual_norm,
            alpha_last=jnp.where(stop, c.alpha_last, alpha),
            beta_last=jnp.where(stop, c.beta_last, beta),
            iteration=c.iteration + jnp.where(stop, 0, 1),
            converged=converged,
            breakdown=breakdown,
        )

    init = _PipelinedCarry(
        x=x,
        r=r,
        u=u,
        w=w,
        p=zeros,
        s=zeros,
        q=zeros,
        z=zeros,
        gamma=jnp.asarray(1.0, rdt),
        alpha=jnp.asarray(1.0, rdt),
        residual_norm=residual_norm0.astype(rdt),
        alpha_last=jnp.asarray(0.0, rdt),
        beta_last=jnp.asarray(0.0, rdt),
        iteration=jnp.asarray(0, jnp.int32),
        converged=converged0,
        breakdown=jnp.asarray(False),
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


class _MegaCarry(NamedTuple):
    x: jax.Array  # all six vectors in the x_ext-PADDED carry layout
    r: jax.Array
    u: jax.Array  # M^-1 r of the current iterate
    w: jax.Array  # K_eff u (recurred through the kernel)
    p: jax.Array  # direction of the PREVIOUS iterate (updated in-kernel)
    s: jax.Array  # K_eff p of the previous iterate
    gamma: jax.Array
    alpha: jax.Array  # step to apply next
    beta: jax.Array  # direction-update scalar to apply next
    residual_norm: jax.Array
    alpha_last: jax.Array
    beta_last: jax.Array
    iteration: jax.Array
    converged: jax.Array
    breakdown: jax.Array


def _solve_pcg_megafused(
    model,
    rhs: jax.Array,
    stiffness_scale,
    mass_factor,
    relative_tolerance,
    max_iterations,
    x0: jax.Array,
    *,
    warm_start: bool,
    reduction_dtype,
    vector_dtype,
    block_inverse,
    bundle,
):
    """Chronopoulos-Gear PCG with the WHOLE iteration as one Pallas pass.

    Same algebra as :func:`solve_pcg_fused` with the p/s direction update
    deferred across the loop boundary: body n feeds (u_{n-1}, w_{n-1},
    p_{n-2}, s_{n-2}, alpha_{n-1}, beta_{n-1}) to the kernel, which forms
    p_{n-1}/s_{n-1} in-flight, applies the axpys, preconditions, applies
    the operator and emits the three dot reductions — identical iterates,
    the update merely crosses into the next kernel launch.  The p/s
    stop-gating of solve_pcg_fused is dropped: on exit those carries are
    one iterate old and consumed by nothing (the gating there preserved
    dead values).  Dot chunking is z-row-then-components f32 partials
    accumulated in ``reduction_dtype`` (ADR-13 contract; trajectory
    parity vs the classic loop pinned by tests).
    """
    f32 = vector_dtype
    rdt = reduction_dtype
    iteration, pad, unpad = bundle

    x = x0 if warm_start else jnp.zeros_like(x0)
    ax = model.apply_keff(x, stiffness_scale, mass_factor)
    r = (rhs - ax).astype(f32)
    x, r = _clamp_dirichlet(model, rhs, x, r)

    with jax.named_scope("pcg_pc_matvec"):
        u, w = model.apply_pc_keff(
            block_inverse, r, stiffness_scale, mass_factor
        )
    gamma0, delta0, rr0, rhs2 = fused_dots(
        [(r, u), (w, u), (r, r), (rhs, rhs)], rdt
    )
    rhs_norm_true = jnp.sqrt(rhs2)
    rhs_norm = jnp.where(rhs_norm_true < _RHS_NORM_FLOOR, 1.0, rhs_norm_true)
    tolerance = relative_tolerance * rhs_norm

    residual_norm = jnp.sqrt(rr0)
    converged0 = residual_norm <= tolerance

    delta_breakdown0 = jnp.abs(delta0) < _BREAKDOWN_TOL
    breakdown0 = jnp.logical_and(jnp.logical_not(converged0), delta_breakdown0)
    alpha0 = gamma0 / jnp.where(delta_breakdown0, 1.0, delta0)

    x_p = pad(x)
    zeros_p = jnp.zeros_like(x_p)
    max_iters = jnp.asarray(max_iterations, dtype=jnp.int32)

    def cond(c: _MegaCarry):
        return jnp.logical_and(
            c.iteration < max_iters,
            jnp.logical_and(
                jnp.logical_not(c.converged), jnp.logical_not(c.breakdown)
            ),
        )

    def body(c: _MegaCarry) -> _MegaCarry:
        with jax.named_scope("pcg_mega_iteration"):
            (nx_, nr, nu, nw, np_, ns), (gamma_new, delta, rr) = iteration(
                (c.x, c.r, c.u, c.w, c.p, c.s),
                c.alpha.astype(f32),
                c.beta.astype(f32),
            )
        residual_norm = jnp.sqrt(rr)
        converged = residual_norm <= tolerance

        gamma_breakdown = jnp.abs(c.gamma) < _BREAKDOWN_TOL
        beta = gamma_new / jnp.where(gamma_breakdown, 1.0, c.gamma)
        alpha_denom = delta - beta * gamma_new / jnp.where(
            jnp.abs(c.alpha) < _BREAKDOWN_TOL, 1.0, c.alpha
        )
        denom_breakdown = jnp.abs(alpha_denom) < _BREAKDOWN_TOL
        alpha_new = gamma_new / jnp.where(denom_breakdown, 1.0, alpha_denom)

        breakdown = jnp.logical_and(
            jnp.logical_not(converged),
            jnp.logical_or(gamma_breakdown, denom_breakdown),
        )
        stop = jnp.logical_or(converged, breakdown)

        return _MegaCarry(
            x=nx_,
            r=nr,
            u=nu,
            w=nw,
            p=np_,
            s=ns,
            gamma=jnp.where(stop, c.gamma, gamma_new),
            alpha=jnp.where(stop, c.alpha, alpha_new),
            beta=jnp.where(stop, c.beta, beta),
            residual_norm=residual_norm,
            alpha_last=c.alpha,  # the step just applied
            beta_last=jnp.where(stop, c.beta_last, beta),
            iteration=c.iteration + 1,
            converged=converged,
            breakdown=breakdown,
        )

    init = _MegaCarry(
        x=x_p,
        r=pad(r),
        u=pad(u),
        w=pad(w),
        p=zeros_p,  # beta0 = 0: the first in-kernel update forms p0 = u0
        s=zeros_p,
        gamma=gamma0,
        alpha=alpha0,
        beta=jnp.asarray(0.0, rdt),
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
    return unpad(final.x), telemetry
