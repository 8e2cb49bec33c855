"""Static equilibrium solve: K u = f with Dirichlet values.

BASELINE.json config #1 is "static cantilever-beam tip deflection (hex8,
~10k DOF, Jacobi-PCG to 1e-8, CPU-runnable, VTU diff vs reference)" — a
mode the reference never shipped as such (its library always steps the
dynamic system; statics only exist inside its dense CPU oracle,
/root/reference/src/physics/solver.cpp:354-378 with the inertial terms
active).  Here the static problem is the Newmark operator with
``stiffness_scale = 1`` and ``mass_factor = 0``: the same matrix-free
``apply_keff``, the same 5-touchpoint Dirichlet semantics, the same
block-Jacobi PCG — so every fast path (structured stencil, banded
windows, sharding) serves statics for free.

Also the anchor for the analytic validation matrix
(/root/reference/docs/validation.md:8-23): the cantilever tip-deflection
check in tests/test_validation_analytic.py drives this entry point.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .pcg import PcgTelemetry, solve_pcg


def solve_static(
    model,
    external_force: jax.Array,
    tolerance: float = 1.0e-8,
    max_iterations: int = 4000,
    reduction_precision: str = "fp64",
    vector_precision: str = "fp32",
    preconditioner=None,
    variant: str = "auto",
) -> Tuple[jax.Array, PcgTelemetry]:
    """Solve K u = f_ext (+ Dirichlet targets) to ``tolerance``.

    Returns the displacement in the model's solver-vector layout (use
    ``model.to_nodal`` for host rows) and the PCG telemetry.  Jittable;
    the preconditioner is built inside when not supplied.
    """
    f32 = jnp.float64 if vector_precision == "fp64" else jnp.float32
    one = f32(1.0)
    zero = f32(0.0)
    rhs = jnp.asarray(external_force, f32)
    rhs = jnp.where(model.bc_mask, model.bc_value, rhs)
    if preconditioner is None:
        preconditioner = model.build_preconditioner(one, zero)
    x_seed = jnp.zeros(model.vector_shape, f32)
    return solve_pcg(
        model,
        rhs,
        one,
        zero,
        jnp.float64(tolerance),
        jnp.int32(max_iterations),
        x_seed,
        warm_start=False,
        reduction_dtype=(
            jnp.float32 if reduction_precision == "fp32" else jnp.float64
        ),
        vector_dtype=f32,
        preconditioner=preconditioner,
        variant=variant,
    )


def solve_static_jit(
    model,
    external_force: jax.Array,
    tolerance: float = 1.0e-8,
    max_iterations: int = 4000,
    **kwargs,
) -> Tuple[jax.Array, PcgTelemetry]:
    """jit-wrapped :func:`solve_static` (model passed as argument so its
    tables are jit operands, not embedded HLO constants)."""
    fn = jax.jit(
        lambda m, f, tol, it: solve_static(m, f, tol, it, **kwargs),
        static_argnums=(),
    )
    return fn(
        model,
        external_force,
        jnp.float64(tolerance),
        jnp.int32(max_iterations),
    )


def static_oracle(mesh, preprocess_outputs, cfg, materials_list):
    """Dense FP64 static reference solve on the host (numpy) — the
    oracle twin for VTU diffs and unit tests.  Returns (N, 3) rows."""
    import numpy as np

    from ..physics import loads as loads_mod
    from ..physics import oracle

    assembly = oracle.assemble_linear_system(
        mesh, preprocess_outputs, materials_list
    )
    dirichlet = oracle.build_dirichlet_conditions(mesh, cfg)
    f = loads_mod.assemble_load_vector(
        mesh, cfg, preprocess_outputs, 0.0
    ).reshape(-1).astype(np.float64)
    k_bc = assembly.stiffness.copy()
    oracle.apply_dirichlet(k_bc, f, dirichlet, None)  # state unused
    # oracle CG converges on the ABSOLUTE residual (solver.cpp:159-225);
    # 1e-8 relative: diag-preconditioned CG stalls near f64 roundoff on
    # ill-conditioned slender geometries, and the parity budget is 2.5e-4
    tol = 1.0e-8 * max(float(np.linalg.norm(f)), 1.0)
    u, stats = oracle.conjugate_gradient(
        k_bc, f, max_iterations=20000, tolerance=tol
    )
    assert stats.converged, "static oracle CG failed to converge"
    return u.reshape(-1, 3)
