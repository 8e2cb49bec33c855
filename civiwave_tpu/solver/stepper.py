"""Implicit Newmark-beta frame orchestration — one jitted device program.

Rebuild of /root/reference/src/gpu/newmark_stepper.cpp:1094-1399.  The
reference choreographed predictor/update GPU dispatches around a CPU PCG
loop with synchronous queue waits; here the whole frame — predictor,
effective RHS, Dirichlet clamp, device-resident PCG, state update — is ONE
jitted computation.  ``dt``, tolerance and iteration cap are traced scalars,
so adaptive timestepping and pause-mode tolerance switches never trigger
recompilation (the XLA analogue of the reference recomputing K_eff scalars
per frame, newmark_stepper.cpp:1322-1326).

Step order preserved exactly (newmark_stepper.cpp:1094-1160):
1. coefficients a0..a5 from the *current* dt;
2. predictor u_pred/v_pred from the pre-step state (1245-1286);
3. effective RHS from the pre-step state (NOT the predictor) with mass +
   Rayleigh terms, and the beta_R * K * damping_rhs matvec through the
   stiffness-only operator (1162-1217);
4. Dirichlet RHS clamp rhs = bc_value - u (1219-1243);
5. PCG with warm start + runtime/pause tolerance (1120-1133);
6. update u = u_pred + d, a = d/(beta dt^2), v = v_pred + gamma/(beta dt) d
   (1288-1314).

The host-side :class:`NewmarkStepper` wraps the jitted step with the
adaptive-dt policy (1328-1367) and reference-compatible telemetry.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import SolverSettings, TimeSettings
from ..mesh.pack import PackedModel, SimState
from ..physics.materials import RayleighCoefficients
from .pcg import PcgTelemetry, solve_pcg


@dataclass(frozen=True)
class AdaptivePolicy:
    """Adaptive dt knobs (newmark_stepper.hpp:56-63)."""

    low_iteration_ratio: float = 0.3
    increase_factor: float = 1.1
    decrease_factor: float = 0.5


@dataclass
class StepTelemetry:
    """Host-side per-frame telemetry (newmark_stepper.hpp:68-79)."""

    simulation_time: float
    time_step: float
    applied_tolerance: float
    paused_mode: bool
    dt_increased: bool = False
    dt_decreased: bool = False
    dt_clamped_min: bool = False
    dt_clamped_max: bool = False
    pcg_iterations: int = 0
    pcg_residual_norm: float = 0.0
    pcg_rhs_norm: float = 0.0
    pcg_alpha_last: float = 0.0
    pcg_beta_last: float = 0.0
    pcg_converged: bool = False
    pcg_breakdown: bool = False


class _DeviceStepOut(NamedTuple):
    state: SimState
    pcg: PcgTelemetry


def effective_scalars(
    dt: float,
    rayleigh_alpha: float,
    rayleigh_beta: float,
    newmark_beta: float = 0.25,
    newmark_gamma: float = 0.5,
    vector_precision: str = "fp32",
):
    """Host-side (stiffness_scale, mass_factor) in the vector precision —
    bitwise the values newmark_step derives on device from the same f64 dt
    (newmark_stepper.cpp:1322-1326), for prebuilding the preconditioner.
    In fp64 vector mode newmark_step keeps the scalars in f64, so the
    prebuilt preconditioner must too."""
    a0 = 1.0 / (newmark_beta * dt * dt)
    a1 = newmark_gamma / (newmark_beta * dt)
    scalar = np.float64 if vector_precision == "fp64" else np.float32
    return (
        scalar(1.0 + a1 * rayleigh_beta),
        scalar(a0 + a1 * rayleigh_alpha),
    )


def newmark_step(
    model: PackedModel,
    state: SimState,
    external_force: jax.Array,
    dt,
    tolerance,
    max_iterations,
    *,
    rayleigh_alpha: float,
    rayleigh_beta: float,
    newmark_beta: float = 0.25,
    newmark_gamma: float = 0.5,
    warm_start: bool = True,
    warm_start_policy: str = "predictor",
    solver_variant: str = "auto",
    solver_replace_every: int = 10,
    reduction_precision: str = "fp64",
    vector_precision: str = "fp32",
    preconditioner=None,
) -> _DeviceStepOut:
    """One implicit Newmark frame, fully on device.

    ``dt``/``tolerance``/``max_iterations`` are traced; the Rayleigh and
    Newmark constants are Python floats fixed at trace time (they are fixed
    per scenario in the reference too).  ``vector_precision`` is the YAML
    ``precision.vectors`` knob (config.hpp:152-156): "fp32" is the
    production contract, "fp64" the accuracy/debug mode that carries every
    kinematic and solver vector in f64 (structured grids then use the XLA
    stencil forms — the Pallas kernel is f32-only).
    """
    f32 = jnp.float64 if vector_precision == "fp64" else jnp.float32
    dt = jnp.asarray(dt, jnp.float64)
    u0 = state.displacement
    if u0.dtype != f32:
        state = SimState(
            *(jnp.asarray(v, f32) for v in (
                state.displacement, state.velocity,
                state.acceleration, state.warm_x,
            ))
        )
    external_force = jnp.asarray(external_force, f32)

    # coefficients (newmark.cpp:34-47) in f64 scalars on device
    beta, gamma = newmark_beta, newmark_gamma
    a0 = 1.0 / (beta * dt * dt)
    a1 = gamma / (beta * dt)
    a2 = 1.0 / (beta * dt)
    a3 = (1.0 / (2.0 * beta)) - 1.0
    a4 = (gamma / beta) - 1.0
    a5 = dt * ((gamma / (2.0 * beta)) - 1.0)

    stiffness_scale = (1.0 + a1 * rayleigh_beta).astype(f32)
    mass_factor = (a0 + a1 * rayleigh_alpha).astype(f32)

    u = state.displacement
    v = state.velocity
    acc = state.acceleration

    # predictor from the pre-step state (newmark_stepper.cpp:1245-1286).
    # named_scope = the TPU analogue of the reference's RGP debug labels
    # around every dispatch ("Newmark Dispatch", vulkan_context.cpp:777-813)
    with jax.named_scope("newmark_predictor"):
        dt32 = dt.astype(f32)
        u_pred = u + dt32 * v + ((0.5 - beta) * dt * dt).astype(f32) * acc
        v_pred = v + ((1.0 - gamma) * dt).astype(f32) * acc

    # effective RHS from the pre-step state (newmark_stepper.cpp:1162-1217)
    with jax.named_scope("effective_rhs"):
        mass = model.mass_b
        mass_term = mass * (
            a0.astype(f32) * u + a2.astype(f32) * v + f32(a3) * acc
        )
        damping_rhs = (
            a1.astype(f32) * u + f32(a4) * v + a5.astype(f32) * acc
        )
        rhs = external_force + mass_term + f32(rayleigh_alpha) * mass * damping_rhs
        if rayleigh_beta != 0.0:
            damping_output = model.apply_keff(damping_rhs, f32(1.0), f32(0.0))
            # stiffness-only operator has identity rows on constrained axes;
            # match the reference, which adds beta_R * (K * damping_rhs)
            # verbatim
            rhs = rhs + f32(rayleigh_beta) * damping_output
        # Lysmer-Kuhlemeyer absorbing dashpots (extension — the reference
        # has none): a general damping matrix C enters the implicit system
        # as rhs += C (a1 u + a4 v + a5 a) and K_eff += a1 C, the same
        # algebra as the Rayleigh terms above (newmark.cpp:83-133)
        has_absorbing = bool(
            getattr(model, "has_damping", False)
            or getattr(model, "absorb_faces", ())
        )
        if has_absorbing:
            import dataclasses

            rhs = rhs + model.absorbing_force(damping_rhs)
            model = dataclasses.replace(model, damp_factor=a1.astype(f32))

    # Dirichlet RHS clamp.  DELIBERATE DEVIATION from
    # newmark_stepper.cpp:1219-1243 (rhs = target - u): the effective system
    # is the textbook total-displacement Newmark form, so the constrained
    # solution component is the target itself and the PCG solution is TOTAL
    # u_{n+1}.  The increment fed to the reference's own update formulas is
    # x - u_pred (see oracle.apply_dirichlet for the full rationale).
    rhs = jnp.where(model.bc_mask, model.bc_value, rhs)

    # Warm-start seed.  The reference warm-starts from the previous solve's
    # solution (newmark_stepper.cpp:1120-1133) = the "solution" policy; the
    # default "predictor" policy seeds from u_pred instead — the same vector
    # the Newmark update measures the increment against, and a strictly
    # better extrapolation (it carries velocity + acceleration forward,
    # where the previous solution lags one frame).  Measured at tol 2e-4:
    # 28.0 -> 24.9 iters/step at 4.44M DOF (+9.8% steps/s) for zero extra
    # memory or passes (ADR-17).  The "delta" policy goes one further:
    # the implicit correction D = x - u_pred is smooth frame to frame, so
    # seeding with u_pred + D_prev (state.warm_x stores D under this
    # policy) removes the part of the residual the predictor cannot see.
    if warm_start_policy == "delta":
        x_seed = u_pred + state.warm_x
    elif warm_start_policy == "predictor":
        x_seed = u_pred
    else:  # "solution" — reference parity
        x_seed = state.warm_x

    with jax.named_scope("pcg_solve"):
        solution, pcg_telemetry = solve_pcg(
            model,
            rhs,
            stiffness_scale,
            mass_factor,
            tolerance,
            max_iterations,
            x_seed,
            warm_start=warm_start,
            reduction_dtype=(
                jnp.float32 if reduction_precision == "fp32" else jnp.float64
            ),
            vector_dtype=f32,
            preconditioner=preconditioner,
            variant=solver_variant,
            replace_every=solver_replace_every,
        )

    # state update (newmark_stepper.cpp:1288-1314) with delta = x - u_pred,
    # algebraically identical to a' = a0(x-u) - a2 v - a3 a (newmark.cpp:151)
    with jax.named_scope("newmark_update"):
        delta = solution - u_pred
        inv_beta_dt2 = (1.0 / (beta * dt * dt)).astype(f32)
        gamma_over_beta_dt = (gamma / (beta * dt)).astype(f32)
        new_state = SimState(
            displacement=u_pred + delta,
            velocity=v_pred + gamma_over_beta_dt * delta,
            acceleration=inv_beta_dt2 * delta,
            # "delta" policy carries the correction; others the solution
            warm_x=delta if warm_start_policy == "delta" else solution,
        )
    return _DeviceStepOut(state=new_state, pcg=pcg_telemetry)


class NewmarkStepper:
    """Host orchestration: jitted frame + adaptive dt policy.

    Mirrors cwf::gpu::newmark::Stepper (newmark_stepper.hpp:92-190):
    ``step(time, paused)`` advances the device state one frame and returns
    :class:`StepTelemetry`; dt adaptation follows newmark_stepper.cpp:
    1328-1367 (grow x1.1 when iterations <= 0.3 * max, halve when
    non-converged, clamp to [min_dt, max_dt]).
    """

    def __init__(
        self,
        model: PackedModel,
        initial_state: SimState,
        external_force: jax.Array,
        rayleigh: RayleighCoefficients,
        solver_settings: SolverSettings,
        time_settings: TimeSettings,
        adaptive_policy: AdaptivePolicy = AdaptivePolicy(),
        newmark_beta: float = 0.25,
        newmark_gamma: float = 0.5,
        warm_start: bool = True,
        reduction_precision: str = "fp64",
        vector_precision: str = "fp32",
        warm_start_policy: str | None = None,
        solver_variant: str | None = None,
    ) -> None:
        self.model = model
        self.state = initial_state
        self.external_force = external_force
        self.rayleigh = rayleigh
        self.solver_settings = solver_settings
        self.time_settings = time_settings
        self.adaptive_policy = adaptive_policy
        self.current_dt = (
            time_settings.initial_dt if time_settings.initial_dt > 0.0 else 1.0e-3
        )
        self.accumulated_time = 0.0
        self.frame_index = 0
        self.warm_start_enabled = warm_start
        # constructor args override the YAML solver settings when given;
        # both default through SolverSettings (ADR-17: 'predictor' is the
        # measured-better default, 'solution' is reference parity)
        self.warm_start_policy = (
            warm_start_policy
            if warm_start_policy is not None
            else getattr(solver_settings, "warm_start_policy", "predictor")
        )
        self.solver_variant = (
            solver_variant
            if solver_variant is not None
            else getattr(solver_settings, "variant", "auto")
        )
        # pipelined-variant residual-replacement period (YAML
        # solver.replace_every; 0 disables — see solve_pcg_pipelined)
        self.solver_replace_every = getattr(
            solver_settings, "replace_every", 10
        )

        self._step_fn = jax.jit(
            partial(
                newmark_step,
                rayleigh_alpha=rayleigh.alpha,
                rayleigh_beta=rayleigh.beta,
                newmark_beta=newmark_beta,
                newmark_gamma=newmark_gamma,
                warm_start=warm_start,
                warm_start_policy=self.warm_start_policy,
                solver_variant=self.solver_variant,
                solver_replace_every=self.solver_replace_every,
                reduction_precision=reduction_precision,
                vector_precision=vector_precision,
            )
        )
        # preconditioner hoisting: the build depends on dt only (through
        # the K_eff scalars), so it is built host-side-triggered and reused
        # across frames; rebuilding in-step cost 80 ms of the ~460 ms frame
        # at 50M DOF (ADR-17).  _precond_dt tracks the dt it was built for.
        self._newmark_beta = newmark_beta
        self._newmark_gamma = newmark_gamma
        self._vector_precision = vector_precision
        self._precond = None
        self._precond_dt = None
        self._build_precond_fn = jax.jit(
            lambda m, ss, mf: m.build_preconditioner(ss, mf)
        )

    @property
    def node_count(self) -> int:
        return self.model.node_count

    @property
    def dof_count(self) -> int:
        return self.model.dof_count

    def set_external_force(self, external_force: jax.Array) -> None:
        self.external_force = external_force

    def step(self, simulation_time_seconds: float, paused_mode: bool = False) -> StepTelemetry:
        """Run one frame (newmark_stepper.cpp:1094-1160)."""
        self.accumulated_time = simulation_time_seconds
        tolerance = (
            self.solver_settings.pause_tolerance
            if paused_mode
            else self.solver_settings.runtime_tolerance
        )
        if self._precond_dt != self.current_dt:
            ss, mf = effective_scalars(
                self.current_dt,
                self.rayleigh.alpha,
                self.rayleigh.beta,
                self._newmark_beta,
                self._newmark_gamma,
                vector_precision=self._vector_precision,
            )
            self._precond = self._build_precond_fn(self.model, ss, mf)
            self._precond_dt = self.current_dt
        out = self._step_fn(
            self.model,
            self.state,
            self.external_force,
            jnp.float64(self.current_dt),
            jnp.float64(tolerance),
            jnp.int32(self.solver_settings.max_iterations),
            preconditioner=self._precond,
        )
        self.state = out.state
        pcg = jax.device_get(out.pcg)

        telemetry = StepTelemetry(
            simulation_time=simulation_time_seconds,
            time_step=self.current_dt,
            applied_tolerance=tolerance,
            paused_mode=paused_mode,
            pcg_iterations=int(pcg.iterations),
            pcg_residual_norm=float(pcg.residual_norm),
            pcg_rhs_norm=float(pcg.rhs_norm),
            pcg_alpha_last=float(pcg.alpha_last),
            pcg_beta_last=float(pcg.beta_last),
            pcg_converged=bool(pcg.converged),
            pcg_breakdown=bool(pcg.breakdown),
        )
        self._adapt_timestep(telemetry)
        self.frame_index += 1
        self.accumulated_time = simulation_time_seconds + self.current_dt
        return telemetry

    def _adapt_timestep(self, telemetry: StepTelemetry) -> None:
        """Grow/shrink/clamp dt (newmark_stepper.cpp:1328-1367)."""
        if not self.time_settings.adaptive:
            return
        threshold = self.adaptive_policy.low_iteration_ratio * float(
            self.solver_settings.max_iterations
        )
        if telemetry.pcg_iterations <= threshold:
            self.current_dt *= self.adaptive_policy.increase_factor
            telemetry.dt_increased = True
        elif not telemetry.pcg_converged:
            self.current_dt *= self.adaptive_policy.decrease_factor
            telemetry.dt_decreased = True
        if self.time_settings.min_dt > 0.0 and self.current_dt <= self.time_settings.min_dt:
            self.current_dt = self.time_settings.min_dt
            telemetry.dt_clamped_min = True
        if self.time_settings.max_dt > 0.0 and self.current_dt >= self.time_settings.max_dt:
            self.current_dt = self.time_settings.max_dt
            telemetry.dt_clamped_max = True

    # --- checkpoint / resume (improvement over the reference, which has
    # none — SURVEY.md section 5) -----------------------------------------
    def save_checkpoint(self, manager, wait: bool = False) -> None:
        manager.save(
            self.frame_index,
            self.state,
            self.current_dt,
            self.accumulated_time,
            wait=wait,
        )

    def restore_checkpoint(self, manager, step: int | None = None) -> int:
        """Restore state/dt/clock/frame; returns the restored frame index."""
        state, current_dt, accumulated_time, frame_index = manager.restore(step)
        self.state = state
        self.current_dt = current_dt
        self.accumulated_time = accumulated_time
        self.frame_index = frame_index
        return frame_index

    # --- host views of the device state (unpadded nodal rows) ------------
    def displacement(self):
        return jax.device_get(self.model.to_nodal(self.state.displacement))

    def velocity(self):
        return jax.device_get(self.model.to_nodal(self.state.velocity))

    def acceleration(self):
        return jax.device_get(self.model.to_nodal(self.state.acceleration))
