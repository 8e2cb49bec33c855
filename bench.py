"""Headline benchmark: EBE matvec throughput in GDOF/s on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.json headline — element-by-element effective-
stiffness matvec (apply_keff) throughput on a hex8 cantilever, measured as
DOFs processed per second across repeated matvecs chained inside one jitted
fori_loop (no per-iteration host dispatch).  Default mesh: 255^3 cells =
50.3M DOF — the north-star scale demonstration (BASELINE.md targets a
50M-DOF basin on v5p-32; the fused slab kernel runs it on ONE v5e) —
where per-chip throughput peaks (v5e round-4: 0.91 GDOF/s at 945k DOF,
3.0 at 4.56M, 11.2 at 50.3M).

vs_baseline: the reference publishes no measured numbers (BASELINE.md); its
spec targets 10-30 Hz interactive stepping at 50k-150k DOFs with a 120-
iteration PCG cap on an AMD iGPU (docs/spec.md:27-28), implying a best-case
matvec throughput of 150e3 * 120 * 30 = 0.54 GDOF/s.  vs_baseline is
measured GDOF/s relative to that proxy.

Size override: CIVIWAVE_BENCH_SIZE="nx,ny,nz" (hex cells).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_BASELINE_GDOFS = 0.54  # reference spec-implied best case (see module doc)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _bench_matvec(model, dof, label, inner=32):
    """Time `inner` chained matvecs; returns best GDOF/s."""
    # host scalars (np, not jnp): device-array closures would be embedded as
    # HLO constants via a device->host fetch
    stiffness_scale = np.float32(1.0)
    mass_factor = np.float32(4.0e6)  # ~ a0 for dt=1e-3 (K_eff-realistic)
    # keep iterates bounded: K entries ~ E, so rescale by 1/E each pass
    rescale = np.float32(1.0 / 2.0e11)

    @jax.jit
    def chained_matvec(m, x):
        # m passed as argument: closure-captured arrays would be embedded
        # into the HLO as constants (hundreds of MB)
        def body(_, y):
            return m.apply_keff(y, stiffness_scale, mass_factor) * rescale

        return jax.lax.fori_loop(0, inner, body, x)

    # generate x0 ON DEVICE: a host-side random vector is 201 MB at the
    # 255^3 flagship, which the axon relay moves at 0.1-2 MB/s (ADR-29/31)
    x0 = jax.random.normal(jax.random.PRNGKey(0), model.vector_shape,
                           jnp.float32)
    mid = x0.size // 2  # interior (non-Dirichlet) slice for the NaN guard

    def run_synced(x):
        """Run the chain and force completion via a host fetch of a scalar
        (block_until_ready does not reliably block on the axon relay)."""
        y = chained_matvec(model, x)
        checksum = float(jnp.sum(jnp.abs(y.ravel()[mid : mid + 64])))
        return y, checksum

    t0 = time.perf_counter()
    result, checksum = run_synced(x0)
    log(f"[{label}] compile + first run: {time.perf_counter()-t0:.1f}s")

    best = float("inf")
    for rep in range(5):
        x = x0 + np.float32(1.0e-6 * (rep + 1))
        t0 = time.perf_counter()
        result, checksum = run_synced(x)
        elapsed = time.perf_counter() - t0
        best = min(best, elapsed)
        log(
            f"[{label}] rep {rep}: {elapsed*1e3:.1f} ms for {inner} matvecs "
            f"(checksum {checksum:.3e})"
        )
    assert np.isfinite(checksum), "matvec chain produced non-finite values"
    gdofs = dof * inner / best / 1e9
    log(f"[{label}] EBE matvec: {gdofs:.3f} GDOF/s ({best/inner*1e3:.2f} ms/matvec)")
    return gdofs


def main() -> None:
    from civiwave_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    if cache_dir:
        log(f"persistent compile cache: {cache_dir}")

    from civiwave_tpu.mesh import pack, preprocess
    from civiwave_tpu.mesh.structured import build_structured_model
    from civiwave_tpu.physics import materials
    from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config

    size = os.environ.get("CIVIWAVE_BENCH_SIZE", "255,255,255")
    nx, ny, nz = (int(s) for s in size.split(","))

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]

    # structured fast path (the flagship for regular grids)
    structured, _f = build_structured_model(
        nx, ny, nz, mats[0], cfg.materials[0].density,
        traction=(0.0, 0.0, -1.0e6),
    )
    dof = structured.dof_count
    log(
        f"mesh: {nx}x{ny}x{nz} hex | nodes={structured.node_count:,} "
        f"dof={dof:,} elements={structured.element_count:,}"
    )
    if os.environ.get("CIVIWAVE_BENCH_MATVEC", "1") == "1":
        gdofs_structured = _bench_matvec(structured, dof, "structured")
    else:  # steps-only iteration mode; headline JSON still needs a value
        gdofs_structured = float("nan")

    # general unstructured path (VERDICT r3 #1: emitted every run so it can
    # never regress silently).  On the same box when its pack + gathers stay
    # tractable; above that, on a fixed 66^3-cell box (~903k DOF — the
    # README's reference-workload-class scale) so the metric line still
    # appears at the 255^3 headline size.
    gdofs_general = None
    if os.environ.get("CIVIWAVE_BENCH_GENERAL", "1") == "1":
        if dof <= 2_000_000:
            gnx, gny, gnz = nx, ny, nz
        else:
            gnx, gny, gnz = 66, 66, 66
        t0 = time.perf_counter()
        mesh = box_mesh(gnx, gny, gnz, hex_elements=True)
        pre = preprocess.run(mesh, cfg)
        model, state, _force = pack.build_packed_model(
            mesh, pre, cfg, mats, pad_nodes=1024, pad_elems=1024
        )
        gdof = model.dof_count
        log(
            f"general-path pack ({gnx}x{gny}x{gnz}, dof={gdof:,}) "
            f"built in {time.perf_counter()-t0:.1f}s"
        )
        gdofs_general = _bench_matvec(model, gdof, "general")

    # secondary metric: full Newmark-PCG stepping rate (structured path,
    # runtime tolerance, warm starts) — the BASELINE.json "steps/sec" figure.
    # Measured under both preconditioners: block-Jacobi (the reference's,
    # pcg.cpp:479-503) and the geometric multigrid V-cycle (ops/multigrid.py)
    general_steps_per_sec = None
    if os.environ.get("CIVIWAVE_BENCH_STEPS", "1") == "1":
        from functools import partial

        from civiwave_tpu.ops.multigrid import attach_multigrid
        from civiwave_tpu.solver.stepper import effective_scalars, newmark_step

        ray = materials.compute_rayleigh(cfg.damping)
        step = partial(
            newmark_step, rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta
        )
        n_steps = 8
        # prebuilt preconditioner, exactly as NewmarkStepper hoists it
        # (rebuild-on-dt-change; dt is fixed here) — ADR-17
        pc_ss, pc_mf = effective_scalars(1.0e-3, ray.alpha, ray.beta)
        build_pc = jax.jit(lambda m, a, b: m.build_preconditioner(a, b))

        @jax.jit
        def run_steps(m, s, f, pc):
            def body(i, carry):
                s, iters = carry
                out = step(m, s, f, 1.0e-3, 2.0e-4, 120, preconditioner=pc)
                return out.state, iters + out.pcg.iterations

            return jax.lax.fori_loop(
                0, n_steps, body, (s, jnp.int32(0))
            )

        def steps_checksum(s):
            u = s.displacement.ravel()
            return float(jnp.sum(jnp.abs(u[u.size // 2 : u.size // 2 + 64])))

        def bench_steps(m, f, label):
            state0 = m.zero_state()
            pc = build_pc(m, pc_ss, pc_mf)
            final_state, total_iters = run_steps(m, state0, f, pc)
            checksum = steps_checksum(final_state)
            best = float("inf")
            for _rep in range(3):  # best-of-3: the relay adds ~15% jitter
                t0 = time.perf_counter()
                final_state, total_iters = run_steps(m, state0, f, pc)
                checksum = steps_checksum(final_state)
                best = min(best, time.perf_counter() - t0)
            steps_per_sec = n_steps / best
            log(
                f"[{label}] Newmark-PCG: {steps_per_sec:.1f} steps/s "
                f"at {m.dof_count:,} DOF (avg "
                f"{int(total_iters)/n_steps:.1f} PCG iters/step, tol 2e-4, "
                f"checksum {checksum:.3e})"
            )
            return steps_per_sec

        # third metric (VERDICT r4 #3): general-path stepping rate at the
        # reference's own interactive domain — 10-30 Hz at 50-150k DOF
        # (docs/spec.md:27-28) — on a SHUFFLED-numbering unstructured mesh
        # (the real-Gmsh worst case; pack's RCM renumbering, ADR-32,
        # re-engages the banded gather windows).  34^3 hex cells = 128,625
        # DOF, top of the reference's band.
        if os.environ.get("CIVIWAVE_BENCH_GENERAL", "1") == "1":
            from civiwave_tpu.utils.synthetic import shuffle_mesh_nodes

            t0 = time.perf_counter()
            gs_mesh = shuffle_mesh_nodes(
                box_mesh(34, 34, 34, hex_elements=True), seed=5
            )
            gs_pre = preprocess.run(gs_mesh, cfg)
            gs_model, _gs_state, gs_force = pack.build_packed_model(
                gs_mesh, gs_pre, cfg, mats, pad_nodes=1024, pad_elems=1024
            )
            log(
                f"general-steps pack (34^3 shuffled, "
                f"dof={gs_model.dof_count:,}, renumbered="
                f"{gs_model.renumbered}) built in "
                f"{time.perf_counter()-t0:.1f}s"
            )
            general_steps_per_sec = bench_steps(
                gs_model, gs_force, "general/block_jacobi"
            )

        variants = [("block_jacobi", structured)]
        # MG wins below ~1M DOF and loses once the fine matvec dominates
        # the iteration (ADR-15) — only bench it where it is the right tool
        if structured.node_count <= 500_000:
            t0 = time.perf_counter()
            structured_mg = attach_multigrid(structured)
            log(
                f"multigrid hierarchy: {len(structured_mg.mg_levels)} coarse "
                f"levels, omegas "
                f"{tuple(round(w, 3) for w in structured_mg.mg_omegas)} "
                f"(built in {time.perf_counter()-t0:.1f}s)"
            )
            if structured_mg.mg_levels:
                variants.append(("multigrid", structured_mg))
        for name, m in variants:
            bench_steps(m, _f, f"structured/{name}")

    import math

    if gdofs_general is not None and math.isfinite(gdofs_structured):
        note = " (different mesh sizes)" if dof > 2_000_000 else ""
        log(
            f"structured/general throughput ratio: "
            f"{gdofs_structured / gdofs_general:.1f}x{note}"
        )
    log(f"device: {jax.devices()[0]}")

    if general_steps_per_sec is not None:
        # third metric line (VERDICT r4 #3): general-path stepping rate at
        # the reference's interactive domain; vs_baseline is relative to
        # the TOP of its 10-30 Hz target band (docs/spec.md:27-28)
        print(
            json.dumps(
                {
                    "metric": "general_steps_per_s",
                    "value": round(general_steps_per_sec, 2),
                    "unit": "steps/s",
                    "vs_baseline": round(general_steps_per_sec / 30.0, 3),
                }
            )
        )
    if gdofs_general is not None:
        # secondary metric line (VERDICT r3 #1): the general unstructured
        # path's throughput, emitted so it can never regress silently.
        # Printed BEFORE the headline so a last-line parser still reads the
        # headline metric.
        print(
            json.dumps(
                {
                    "metric": "general_matvec_throughput",
                    "value": round(gdofs_general, 4),
                    "unit": "GDOF/s",
                    "vs_baseline": round(gdofs_general / _BASELINE_GDOFS, 3),
                }
            )
        )
    print(
        json.dumps(
            {
                "metric": "ebe_matvec_throughput",
                "value": (
                    round(gdofs_structured, 4)
                    if math.isfinite(gdofs_structured)
                    else None  # steps-only iteration mode (MATVEC=0)
                ),
                "unit": "GDOF/s",
                "vs_baseline": (
                    round(gdofs_structured / _BASELINE_GDOFS, 3)
                    if math.isfinite(gdofs_structured)
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
