"""Multi-chip perf harness: compiler-verified collective counts + projection.

Builds the sharded structured Newmark step for a range of shard counts on
whatever devices exist (real chips or virtual CPU devices), extracts the
per-PCG-iteration collective counts from the compiled HLO
(civiwave_tpu/parallel/collectives.py), and emits ONE JSON line per
(shard count, solver variant) combining:

* the compiled truth: all-reduces + collective-permutes per iteration;
* a projected steps/s at the north-star config (BASELINE.md: 10M-DOF hex on
  v5p-32) from measured single-chip kernel times + the collective counts;
* a measured steps/s when enough real TPU chips are attached (skipped on
  virtual meshes — a CPU timing would be meaningless).

This converts the README's hand math into compiler-verified math and is
ready to run the day real multi-chip hardware appears.

Projection model (all knobs env-overridable):
    t_iter(N) = (t_matvec + t_tail) * (target_dof / N) / measured_dof
                + n_all_reduce * t_ar + n_permute * t_cp
    steps/s   = 1 / (t_iter * iters_per_step + t_frame_envelope(N))
Defaults use the round-4 DRIVER-measured v5e numbers (BENCH_r04.json:
4.57 ms/matvec at 50.3M DOF; 5.3 steps/s at 24.8 iters/step => 7.41 ms
total per iteration, so a 2.84 ms PCG tail after the 5 ms frame envelope)
scaled by CIVIWAVE_MC_CHIP_SPEEDUP for the target chip (v5p HBM bandwidth
is ~3.4x v5e's; both kernels are bandwidth/VPU-bound) and 15/5 us per
all-reduce/one-plane-permute over ICI (scaling-book-class latencies).

Env knobs:
    CIVIWAVE_MC_SIZE=63,32,32      grid for HLO extraction (compile-sized)
    CIVIWAVE_MC_SHARDS=1,2,4,8     shard counts to compile
    CIVIWAVE_MC_SHARDS2D=4x2,2x4   2-D (X, Y) device grids to compile
    CIVIWAVE_MC_TARGET_DOF=10.06e6 projection workload
    CIVIWAVE_MC_MEASURED_DOF=50.33e6, CIVIWAVE_MC_T_MATVEC_MS=4.57,
    CIVIWAVE_MC_T_TAIL_MS=2.84, CIVIWAVE_MC_ITERS=24.8,
    CIVIWAVE_MC_CHIP_SPEEDUP=3.4 (v5p/v5e), CIVIWAVE_MC_AR_US=15,
    CIVIWAVE_MC_CP_US=5
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _env_f(name: str, default: float) -> float:
    return float(os.environ.get(name, default))


def main() -> None:
    import jax

    from civiwave_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    shard_req = [
        int(s)
        for s in os.environ.get("CIVIWAVE_MC_SHARDS", "1,2,4,8").split(",")
    ]
    need = max(shard_req, default=1)
    for spec in os.environ.get("CIVIWAVE_MC_SHARDS2D", "4x2").split(","):
        if "x" in spec:
            px, py = (int(s) for s in spec.split("x"))
            need = max(need, px * py)
    if len(jax.devices()) < need:
        # fall back to virtual CPU devices (the axon sitecustomize holds
        # one real chip open; compile-time collective extraction is
        # platform-independent).  Env vars must land before jax
        # initializes, so RE-EXEC this process with them set — same
        # subprocess principle as __graft_entry__.dryrun_multichip, no
        # jax._src private API.
        if os.environ.get("CIVIWAVE_MC_REEXEC") == "1":
            raise RuntimeError(
                f"re-exec still sees {len(jax.devices())} devices"
            )
        env = dict(os.environ)
        env["CIVIWAVE_MC_REEXEC"] = "1"
        # neutralize the axon TPU-relay sitecustomize: it gates on this
        # env var and would otherwise re-register the axon platform over
        # the CPU selection at interpreter start (same treatment as
        # __graft_entry__.dryrun_multichip)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_NUM_CPU_DEVICES"] = str(need)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={need}"
            ).strip()
        log(f"re-exec with {need} virtual CPU devices")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    n_visible = len(jax.devices())
    backend = jax.default_backend()
    shard_counts = [n for n in shard_req if n <= n_visible]
    if not shard_counts:
        log(f"no usable shard counts on {n_visible} visible devices")
        return

    size = os.environ.get("CIVIWAVE_MC_SIZE", "63,32,32")
    nx, ny, nz = (int(s) for s in size.split(","))

    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.parallel.collectives import per_iteration_counts
    from civiwave_tpu.parallel.sharding import make_device_mesh, shard_structured
    from civiwave_tpu.physics import materials
    from civiwave_tpu.solver.stepper import effective_scalars, newmark_step
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    ray = materials.compute_rayleigh(cfg.damping)
    pad_mult = max(shard_counts)
    model, force = build_structured_model(
        nx, ny, nz, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6), pad_x_multiple=pad_mult,
    )
    state = model.zero_state()
    log(
        f"grid {nx}x{ny}x{nz} ({model.dof_count:,} DOF), backend={backend}, "
        f"{n_visible} devices, shard counts {shard_counts}"
    )

    # projection constants (see module docstring)
    target_dof = _env_f("CIVIWAVE_MC_TARGET_DOF", 10.06e6)
    measured_dof = _env_f("CIVIWAVE_MC_MEASURED_DOF", 50.33e6)
    t_matvec = _env_f("CIVIWAVE_MC_T_MATVEC_MS", 4.57) * 1e-3
    t_tail = _env_f("CIVIWAVE_MC_T_TAIL_MS", 2.84) * 1e-3
    iters = _env_f("CIVIWAVE_MC_ITERS", 24.8)
    speedup = _env_f("CIVIWAVE_MC_CHIP_SPEEDUP", 3.4)
    t_ar = _env_f("CIVIWAVE_MC_AR_US", 15.0) * 1e-6
    t_cp = _env_f("CIVIWAVE_MC_CP_US", 5.0) * 1e-6
    # non-PCG frame envelope (predictor + RHS + update: ~4 vector passes,
    # measured inside the 345 ms step at 50.3M as step - iters*(mv+tail))
    t_envelope = _env_f("CIVIWAVE_MC_T_ENVELOPE_MS", 5.0) * 1e-3

    ss, mf = effective_scalars(1.0e-3, ray.alpha, ray.beta)

    results = []
    for n_shards in shard_counts:
        mesh = make_device_mesh(n_shards)
        s_model, s_state, s_force = shard_structured(model, state, force, mesh)
        pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))(
            s_model, ss, mf
        )
        for variant in ("classic", "fused", "pipelined"):
            step = jax.jit(
                partial(
                    newmark_step,
                    rayleigh_alpha=ray.alpha,
                    rayleigh_beta=ray.beta,
                    solver_variant=variant,
                )
            )
            t0 = time.perf_counter()
            compiled = step.lower(
                s_model, s_state, s_force, 1e-3, 2e-4, 120, preconditioner=pc
            ).compile()
            compile_s = time.perf_counter() - t0
            if n_shards > 1:
                n_ar, n_cp = per_iteration_counts(compiled.as_text())
            else:
                n_ar = n_cp = 0  # single chip: no collectives exist

            # projection at the north-star workload
            per_chip = target_dof / n_shards / measured_dof
            tail = t_tail
            if variant == "pipelined":
                # Ghysels-Vanroose: 8 axpys over 10 vectors instead of the
                # fused loop's 4 over 6 (~1.7x the vector tail, measured
                # single-chip below when hardware allows).  The one
                # all-reduce overlaps ONLY with the pc+matvec window — the
                # 8 axpys consume the alpha/beta that all-reduce produces,
                # so the tail cannot hide it.  Model: the all-reduce hides
                # behind the matvec window, the tail is additive.
                tail = t_tail * 1.7
                t_mv_shard = t_matvec * per_chip / speedup
                t_tail_shard = tail * per_chip / speedup
                t_iter = (
                    max(t_mv_shard, n_ar * t_ar)
                    + t_tail_shard
                    + n_cp * t_cp
                )
            else:
                t_compute = (t_matvec + tail) * per_chip / speedup
                t_iter = t_compute + n_ar * t_ar + n_cp * t_cp
            t_step = t_iter * iters + t_envelope * per_chip / speedup
            projected = 1.0 / t_step

            measured = None
            if backend == "tpu" and n_shards <= n_visible:
                # real chips: measure 8 steps end-to-end (host loop over
                # the compiled executable; host fetch forces completion on
                # the axon relay)
                import jax.numpy as jnp

                st = s_state
                out = compiled(
                    s_model, st, s_force, 1e-3, 2e-4, 120, preconditioner=pc
                )
                float(jnp.sum(out.state.displacement[0, :1]))  # sync
                t0 = time.perf_counter()
                st = s_state
                for _ in range(8):
                    out = compiled(
                        s_model, st, s_force, 1e-3, 2e-4, 120,
                        preconditioner=pc,
                    )
                    st = out.state
                float(jnp.sum(st.displacement[0, :1]))
                measured = 8.0 / (time.perf_counter() - t0)

            row = {
                "metric": "multichip_pcg_collectives",
                "shards": n_shards,
                "variant": variant,
                "all_reduce_per_iter": n_ar,
                "permute_per_iter": n_cp,
                "projected_steps_per_sec_10M_v5p": round(projected, 1),
                "measured_steps_per_sec": (
                    round(measured, 2) if measured is not None else None
                ),
                "backend": backend,
            }
            results.append(row)
            log(
                f"[{n_shards} shard(s), {variant}] compile {compile_s:.1f}s; "
                f"AR/iter={n_ar} CP/iter={n_cp}; projected {projected:.0f} "
                f"steps/s at 10M DOF on v5p-{max(32, n_shards)}"
                + (f"; measured {measured:.2f} steps/s" if measured else "")
            )
            print(json.dumps(row))

    # ---- 2-D (X, Y) decomposition: compile + count the 4-permute halo ----
    grids2d = []
    for spec in os.environ.get("CIVIWAVE_MC_SHARDS2D", "4x2").split(","):
        if "x" in spec:
            px, py = (int(s) for s in spec.split("x"))
            if px * py <= n_visible and px > 1 and py > 1:
                grids2d.append((px, py))
    if grids2d:
        from civiwave_tpu.parallel.sharding import make_device_mesh_2d

        pad2x = max(px for px, _ in grids2d)
        pad2y = max(py for _, py in grids2d)
        model2, force2 = build_structured_model(
            nx, ny, nz, mats[0], cfg.materials[0].density,
            traction=(0.0, 0.0, -1.0e6),
            pad_x_multiple=pad2x, pad_y_multiple=pad2y,
        )
        state2 = model2.zero_state()
        for px, py in grids2d:
            mesh2d = make_device_mesh_2d(px, py)
            s_model, s_state, s_force = shard_structured(
                model2, state2, force2, mesh2d, axis_name_y="shard_y"
            )
            if backend != "tpu":
                # the 2-D path has no XLA local form — force the ghost-Y
                # kernel through the interpreter so the compiled HLO shows
                # the production 4-permute budget (as the tests do)
                import dataclasses

                s_model = dataclasses.replace(
                    s_model, pallas_interpret=True
                )
            pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))(
                s_model, ss, mf
            )
            step = jax.jit(
                partial(
                    newmark_step,
                    rayleigh_alpha=ray.alpha,
                    rayleigh_beta=ray.beta,
                    solver_variant="fused",
                )
            )
            t0 = time.perf_counter()
            compiled = step.lower(
                s_model, s_state, s_force, 1e-3, 2e-4, 120, preconditioner=pc
            ).compile()
            compile_s = time.perf_counter() - t0
            n_ar, n_cp = per_iteration_counts(compiled.as_text())
            n_shards = px * py
            # same projection model; the 2-D halo trades the 1-D slab's
            # 2 big plane permutes for 4 smaller ones (2 rows + 2 planes)
            per_chip = target_dof / n_shards / measured_dof
            t_compute = (t_matvec + t_tail) * per_chip / speedup
            t_iter = t_compute + n_ar * t_ar + n_cp * t_cp
            t_step = t_iter * iters + t_envelope * per_chip / speedup
            projected = 1.0 / t_step
            row = {
                "metric": "multichip_pcg_collectives",
                "shards": n_shards,
                "mesh2d": f"{px}x{py}",
                "variant": "fused",
                "all_reduce_per_iter": n_ar,
                "permute_per_iter": n_cp,
                "projected_steps_per_sec_10M_v5p": round(projected, 1),
                "measured_steps_per_sec": None,
                "backend": backend,
            }
            results.append(row)
            log(
                f"[2-D {px}x{py}, fused] compile {compile_s:.1f}s; "
                f"AR/iter={n_ar} CP/iter={n_cp}; projected {projected:.0f} "
                f"steps/s at 10M DOF on v5p-{max(32, n_shards)}"
            )
            print(json.dumps(row))

    # ---- general (unstructured) path: banded halo vs pure GSPMD ---------
    # The reference's actual input format is unstructured Gmsh meshes; the
    # banded halo plan (parallel/general_halo.py, ADR-30) bounds its
    # per-iteration communication at 2 (G, 3)-row permutes.  Emit the
    # compiler-counted budget next to the GSPMD form it replaces.
    from civiwave_tpu.mesh import pack as pack_mod
    from civiwave_tpu.mesh import preprocess as pre_mod
    from civiwave_tpu.parallel.collectives import (
        pcg_body_collectives,
        summarize,
    )
    from civiwave_tpu.parallel.sharding import shard_simulation
    from civiwave_tpu.utils.synthetic import box_mesh

    gsize = os.environ.get("CIVIWAVE_MC_GENERAL_SIZE", "24,6,6")
    gx, gy, gz = (int(s) for s in gsize.split(","))
    gmesh = box_mesh(gx, gy, gz, hex_elements=True)
    gpre = pre_mod.run(gmesh, cfg)
    pad = 8 * max(shard_counts)
    gmodel, gstate, gforce = pack_mod.build_packed_model(
        gmesh, gpre, cfg, mats, pad_nodes=pad, pad_elems=pad
    )
    for n_shards in [n for n in shard_counts if n > 1]:
        mesh = make_device_mesh(n_shards)
        for halo in (True, False):
            os.environ["CIVIWAVE_GENERAL_HALO"] = "1" if halo else "0"
            s_model, s_state, s_force = shard_simulation(
                gmodel, gstate, gforce, mesh
            )
            if halo and s_model.halo_conn is None:
                log(f"[general {n_shards}] halo plan unavailable; skipping")
                continue
            pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))(
                s_model, ss, mf
            )
            step = jax.jit(
                partial(
                    newmark_step,
                    rayleigh_alpha=ray.alpha,
                    rayleigh_beta=ray.beta,
                    solver_variant="fused",
                )
            )
            t0 = time.perf_counter()
            compiled = step.lower(
                s_model, s_state, s_force, 1e-3, 2e-4, 120,
                preconditioner=pc,
            ).compile()
            compile_s = time.perf_counter() - t0
            totals = summarize(pcg_body_collectives(compiled.as_text()))
            row = {
                "metric": "multichip_general_collectives",
                "shards": n_shards,
                "path": "halo" if halo else "gspmd",
                "all_reduce_per_iter": totals.get("all-reduce", 0),
                "permute_per_iter": totals.get("collective-permute", 0),
                "all_gather_per_iter": totals.get("all-gather", 0),
                "ghost_rows": int(s_model.halo_ghost) if halo else None,
                "backend": backend,
            }
            log(
                f"[general {n_shards} shard(s), {row['path']}] "
                f"compile {compile_s:.1f}s; AR={row['all_reduce_per_iter']} "
                f"CP={row['permute_per_iter']} "
                f"AG={row['all_gather_per_iter']} per iteration"
            )
            print(json.dumps(row))
    os.environ.pop("CIVIWAVE_GENERAL_HALO", None)


if __name__ == "__main__":
    main()
