"""Scenario runner: YAML -> mesh -> pack -> Newmark loop -> VTU/CSV.

The reference library has no CLI (``viewer_demo.cpp`` is its only
executable); this runner is the deliberate usability addition called out in
SURVEY.md section 7.  It stitches the canonical pipeline together
(the call stack in SURVEY.md section 3.1):

    load_config -> load_gmsh -> preprocess.run -> build_packed_model
    -> NewmarkStepper -> per-frame OutputManager.handle_frame

Usage::

    python -m civiwave_tpu.runner scenario.yaml --frames 100 --output out/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from dataclasses import asdict, dataclass
from typing import List, Optional

from .config.loader import load_config_from_file
from .config.schema import Config
from .utils.errors import CwfError
from .mesh import pack, preprocess
from .mesh.gmsh import load_gmsh_file
from .mesh.model import Mesh
from .physics import loads as loads_mod
from .physics import materials
from .post.output import OutputManager
from .solver.stepper import NewmarkStepper, StepTelemetry


@dataclass
class Simulation:
    """A fully-wired scenario ready to step.

    ``model`` is either the general :class:`~civiwave_tpu.mesh.pack.
    PackedModel` or the :class:`~civiwave_tpu.mesh.structured.
    StructuredModel` fast path (both implement the operator protocol);
    ``mesh``/``preprocess`` are built lazily for the structured path —
    only output/interactive consumers need the host-side mesh.
    """

    config: Config
    mesh: Optional[Mesh]
    preprocess: Optional[preprocess.PreprocessOutputs]
    model: object
    stepper: NewmarkStepper
    output: Optional[OutputManager]
    force_schedule: Optional[object] = None  # StructuredForceSchedule
    _scenario_path: str = ""
    _mesh_root: Optional[str] = None

    @property
    def structured(self) -> bool:
        """Whether the scenario runs on the structured-grid fast path."""
        from .mesh.structured import StructuredModel

        return isinstance(self.model, StructuredModel)

    def ensure_host_mesh(self) -> None:
        """Build mesh + preprocess on demand (structured scenarios skip
        them unless an output/interactive consumer asks)."""
        if self.mesh is None:
            self.mesh = _load_mesh(
                self.config, self._scenario_path, self._mesh_root
            )
        if self.preprocess is None:
            self.preprocess = preprocess.run(self.mesh, self.config)

    def run(
        self,
        frames: int,
        paused_mode: bool = False,
        verbose: bool = False,
        checkpoint_manager=None,
        checkpoint_every: int = 50,
    ) -> List[StepTelemetry]:
        """Advance ``frames`` steps, re-evaluating time-curve loads and
        writing outputs per frame."""
        telemetries: List[StepTelemetry] = []
        has_curves = any(
            t.scale_curve for t in self.config.loads.tractions
        ) or any(p.scale_curve for p in self.config.loads.points)
        t = self.stepper.accumulated_time
        start_frame = self.stepper.frame_index
        for frame in range(start_frame, start_frame + frames):
            if has_curves and frame > 0:
                if self.force_schedule is not None:
                    self.stepper.set_external_force(
                        self.force_schedule.at_time(self.config.curves, t)
                    )
                else:
                    load = loads_mod.assemble_load_vector(
                        self.mesh, self.config, self.preprocess, t
                    )
                    # from_nodal handles padding AND any RCM renumbering
                    # the pack applied (ADR-32)
                    self.stepper.set_external_force(
                        self.model.from_nodal(pack.clamp_to_f32(load))
                    )

            telemetry = self.stepper.step(t, paused_mode=paused_mode)
            telemetries.append(telemetry)
            t = self.stepper.accumulated_time

            if self.output is not None:
                self.output.handle_from_stepper(
                    telemetry.simulation_time, frame, self.stepper
                )
            if (
                checkpoint_manager is not None
                and checkpoint_every > 0
                and frame > 0
                and frame % checkpoint_every == 0
            ):
                self.stepper.save_checkpoint(checkpoint_manager)
            if verbose:
                print(
                    f"frame {frame:5d} t={telemetry.simulation_time:.6f}s "
                    f"dt={telemetry.time_step:.2e} "
                    f"iters={telemetry.pcg_iterations} "
                    f"res={telemetry.pcg_residual_norm:.3e} "
                    f"conv={telemetry.pcg_converged}"
                )
        if self.output is not None:
            self.output.flush()  # drain the async VTU writer
        return telemetries


def _load_mesh(cfg: Config, scenario_path: str, mesh_root: Optional[str]) -> Mesh:
    """Resolve the mesh: a Gmsh file, or the synthetic box scheme
    ``synthetic://box/nx,ny,nz[,tet|hex][,spacing]``."""
    mesh_path = cfg.mesh_path
    if mesh_path.startswith("synthetic://box/"):
        from .mesh.structured_config import parse_box_spec
        from .utils.synthetic import box_mesh

        nx, ny, nz, hex_elements, spacing = parse_box_spec(mesh_path)
        refs = (
            list(cfg.absorbing)
            + [t.group for t in cfg.loads.tractions]
            + [f.group for f in cfg.dirichlet]
        )
        return box_mesh(
            nx, ny, nz, hex_elements=hex_elements, spacing=spacing,
            # emit the six SIDE_* face groups whenever the scenario
            # references any of them (absorbing faces, side tractions...)
            side_groups=any(g.startswith("SIDE_") for g in refs),
        )

    if not os.path.isabs(mesh_path):
        base = mesh_root if mesh_root is not None else os.getcwd()
        candidate = os.path.join(base, mesh_path)
        if not os.path.isfile(candidate):
            # also try relative to the scenario file itself
            alt = os.path.join(os.path.dirname(scenario_path), mesh_path)
            candidate = alt if os.path.isfile(alt) else candidate
        mesh_path = candidate
    return load_gmsh_file(mesh_path)


def build_simulation(
    scenario_path: str,
    output_root: Optional[str] = None,
    mesh_root: Optional[str] = None,
) -> Simulation:
    """Wire the full pipeline from a scenario YAML path.

    ``synthetic://box`` hex scenarios with one material and axis-plane
    loads/fixes route onto the structured-grid fast path (constant-stencil
    operator, no gathers — see mesh/structured_config.py); everything else
    takes the general PackedModel gather path.
    """
    cfg = load_config_from_file(scenario_path)
    mats = [materials.make_properties(m) for m in cfg.materials]
    rayleigh = materials.compute_rayleigh(cfg.damping)

    from .mesh.structured_config import try_build_structured

    routed = try_build_structured(cfg)
    schedule = None
    if routed is not None:
        model, schedule = routed
        print(
            f"path: structured fast path ({model.nx}x{model.ny}x{model.nz} "
            f"grid, {model.dof_count:,} DOF, constant-stencil operator)",
            file=sys.stderr,
        )
        state = model.zero_state()
        force = schedule.at_time(cfg.curves, 0.0)
        mesh = pre = None
    else:
        if cfg.solver.preconditioner == "multigrid":
            # geometric MG needs the structured fast path's uniform grid;
            # the general gather path solves with block-Jacobi (the
            # reference's preconditioner, pcg.cpp:479-503)
            print(
                "note: solver.preconditioner 'multigrid' requires the "
                "structured fast path; this scenario takes the general "
                "path with block_jacobi",
                file=sys.stderr,
            )
        mesh = _load_mesh(cfg, scenario_path, mesh_root)
        pre = preprocess.run(mesh, cfg)
        model, state, force = pack.build_packed_model(mesh, pre, cfg, mats)
        print(
            f"path: general gather path ({mesh.element_count:,} elements, "
            f"{model.dof_count:,} DOF, dual-CSR assembly)",
            file=sys.stderr,
        )

    stepper = NewmarkStepper(
        model, state, force, rayleigh, cfg.solver, cfg.time,
        reduction_precision=cfg.precision.reduction_precision,
        vector_precision=cfg.precision.vector_precision,
    )

    sim = Simulation(
        config=cfg,
        mesh=mesh,
        preprocess=pre,
        model=model,
        stepper=stepper,
        output=None,
        force_schedule=schedule,
        _scenario_path=scenario_path,
        _mesh_root=mesh_root,
    )
    if output_root is not None:
        if sim.structured:
            # device-side derived fields + O(1) probes: no host
            # mesh/preprocess needed (scales to the 50M-DOF demo)
            from .post.output import StructuredOutputManager

            sim.output = StructuredOutputManager(
                output_root, cfg.output, sim.model
            )
        else:
            sim.ensure_host_mesh()
            _, _, d_all = materials.material_tables(mats)
            sim.output = OutputManager(
                output_root, cfg.output, sim.mesh, sim.preprocess, d_all
            )
    return sim


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="civiwave-tpu", description="Run a CiviWave scenario on TPU/JAX."
    )
    parser.add_argument("scenario", help="path to the scenario YAML")
    parser.add_argument("--frames", type=int, default=10, help="frames to run")
    parser.add_argument(
        "--output", default=None, help="output root for VTU/probe files"
    )
    parser.add_argument(
        "--paused", action="store_true", help="use the pause-mode tolerance"
    )
    parser.add_argument(
        "--static",
        action="store_true",
        help="solve static equilibrium K u = f instead of time stepping "
        "(one PCG solve to the pause tolerance; writes VTU frame 0)",
    )
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument(
        "--telemetry-json",
        default=None,
        help="write per-frame telemetry to this JSON file",
    )
    parser.add_argument(
        "--checkpoint-dir", default=None, help="orbax checkpoint directory"
    )
    parser.add_argument(
        "--checkpoint-every", type=int, default=50, help="frames per checkpoint"
    )
    parser.add_argument(
        "--resume",
        action="store_true",
        help="resume from the latest checkpoint in --checkpoint-dir",
    )
    parser.add_argument(
        "--profile",
        default=None,
        help="capture a jax.profiler trace into this directory",
    )
    args = parser.parse_args(argv)

    try:
        return _run_cli(args)
    except CwfError as err:
        # CwfError carries the reference-style breadcrumbed message
        # (config.hpp:83-87 analogue); a CLI user gets one clean line,
        # not a traceback.
        print(f"error: {err}", file=sys.stderr)
        return 1


def _run_cli(args) -> int:
    # persistent XLA compile cache: the analogue of the reference loading
    # precompiled .spv kernels by name (newmark_stepper.cpp:704-705) —
    # cold processes reuse prior executables instead of recompiling
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    sim = build_simulation(args.scenario, output_root=args.output)

    if args.static:
        return _run_static(sim, args)

    manager = None
    if args.checkpoint_dir:
        from .utils.checkpoint import CheckpointManager

        manager = CheckpointManager(args.checkpoint_dir)
        if args.resume and manager.latest_step() is not None:
            frame = sim.stepper.restore_checkpoint(manager)
            print(f"resumed from checkpoint at frame {frame}")

    profile_ctx = None
    if args.profile:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()

    start = time.perf_counter()
    telemetries = sim.run(
        args.frames,
        paused_mode=args.paused,
        verbose=not args.quiet,
        checkpoint_manager=manager,
        checkpoint_every=args.checkpoint_every,
    )
    elapsed = time.perf_counter() - start

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
    if manager is not None:
        sim.stepper.save_checkpoint(manager, wait=True)
        manager.close()

    converged = sum(1 for t in telemetries if t.pcg_converged)
    print(
        f"ran {len(telemetries)} frames in {elapsed:.3f}s "
        f"({len(telemetries) / max(elapsed, 1e-9):.1f} steps/s), "
        f"{converged}/{len(telemetries)} converged, "
        f"final t={sim.stepper.accumulated_time:.6f}s"
    )
    if args.telemetry_json:
        with open(args.telemetry_json, "w", encoding="utf-8") as f:
            json.dump([asdict(t) for t in telemetries], f, indent=2)
    return 0


def _run_static(sim: Simulation, args) -> int:
    """Static-equilibrium mode (BASELINE config #1): one PCG solve of
    K u = f to the scenario's pause tolerance, written as VTU frame 0."""
    import jax

    from .mesh.pack import SimState
    from .solver.static import solve_static

    cfg = sim.config
    tolerance = cfg.solver.pause_tolerance
    start = time.perf_counter()
    u, pcg = jax.jit(
        lambda m, f: solve_static(
            m,
            f,
            tolerance=tolerance,
            max_iterations=cfg.solver.max_iterations,
            reduction_precision=cfg.precision.reduction_precision,
            vector_precision=cfg.precision.vector_precision,
        )
    )(sim.model, sim.stepper.external_force)
    pcg = jax.device_get(pcg)
    elapsed = time.perf_counter() - start

    # expose the solution through the stepper so both output managers
    # (general + structured) read it the same way
    zero = sim.model.zero_state().velocity
    sim.stepper.state = SimState(
        displacement=u, velocity=zero, acceleration=zero, warm_x=u
    )
    if sim.output is not None:
        sim.output.handle_from_stepper(0.0, 0, sim.stepper)
        sim.output.flush()

    u_host = sim.stepper.displacement()
    print(
        f"static solve: {int(pcg.iterations)} PCG iterations to "
        f"tol {tolerance:g} in {elapsed:.3f}s, "
        f"residual {float(pcg.residual_norm):.3e}, "
        f"converged={bool(pcg.converged)}, "
        f"max |u| = {float(abs(u_host).max()):.6e} m"
    )
    if args.telemetry_json:
        payload = {
            "mode": "static",
            "iterations": int(pcg.iterations),
            "residual_norm": float(pcg.residual_norm),
            "rhs_norm": float(pcg.rhs_norm),
            "converged": bool(pcg.converged),
            "tolerance": tolerance,
            "max_displacement": float(abs(u_host).max()),
            "elapsed_seconds": elapsed,
        }
        with open(args.telemetry_json, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=2)
    return 0 if bool(pcg.converged) else 1


if __name__ == "__main__":
    raise SystemExit(main())
