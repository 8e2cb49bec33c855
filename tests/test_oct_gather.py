"""Offset-pattern (oct) gather path vs the reference operator (ADR-33).

The oct plans replace 8 narrow row gathers per element/node with ONE
24-wide gathered row when the numbering is offset-regular.  A TPU
gather-rate optimization gated off on CPU; these tests force it on and
pin (a) pack-time plan invariants against the raw connectivity/CSR and
(b) exact operator agreement with the plain unwindowed forms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from civiwave_tpu.mesh import pack, preprocess
from civiwave_tpu.ops import apply_keff as ops
from civiwave_tpu.physics import materials
from civiwave_tpu.utils.synthetic import box_mesh, cantilever_config


def _model(nx, ny, nz, hex_elements, shuffled=False, **kw):
    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    mesh = box_mesh(nx, ny, nz, hex_elements=hex_elements)
    if shuffled:
        from civiwave_tpu.utils.synthetic import shuffle_mesh_nodes

        mesh = shuffle_mesh_nodes(mesh, seed=3)
    pre = preprocess.run(mesh, cfg)
    model, _state, _force = pack.build_packed_model(mesh, pre, cfg, mats, **kw)
    return model


def test_oct_x_plan_reconstructs_connectivity():
    model = _model(12, 10, 9, hex_elements=True)
    assert model.xo_hex, "x oct plan should hold for a native box"
    conn = np.asarray(model.conn_hex)
    base = np.asarray(model.oct_base_hex)
    covered = 0
    for e0, ec, lo, L, offs in model.xo_hex:
        assert e0 == covered
        covered += ec
        rows = base[e0 : e0 + ec]
        assert rows.min() >= lo and rows.max() < lo + L
        # base + per-slot offset == the packed connectivity, slot order
        # preserved (gradients stay aligned)
        rec = rows[:, None] + np.asarray(offs)[None, :]
        np.testing.assert_array_equal(rec, conn[e0 : e0 + ec])
    assert covered == model.padded_hex_count


def test_oct_assembly_plan_reconstructs_incidences():
    model = _model(9, 8, 7, hex_elements=True)
    assert model.oa_oct, "assembly oct plan should hold for a native box"
    conn = np.asarray(model.conn_hex)[: model.hex_count]
    col = np.asarray(model.oa_col)
    w = np.asarray(model.oa_w)
    # ground truth: per node the set of (element, slot) incidences
    truth = {}
    for e in range(len(conn)):
        for l in range(8):
            truth.setdefault(int(conn[e, l]), set()).add((e, l))
    covered = 0
    for n0, ncnt, e_lo, L, pattern in model.oa_oct:
        assert n0 == covered
        covered += ncnt
        for n in range(n0, min(n0 + ncnt, model.node_count)):
            a = int(col[n])
            assert e_lo <= a < e_lo + L
            got = {
                (a + de, l)
                for k, (de, l) in enumerate(pattern)
                if w[n, k] == 1.0
            }
            assert got == truth.get(n, set()), f"node {n} incidences"
    assert covered == model.padded_node_count
    # weights are exactly 0/1 and rows beyond node_count are dead
    assert set(np.unique(w)) <= {0.0, 1.0}
    assert not w[model.node_count :].any()


@pytest.mark.parametrize("hex_elements", [True, False])
def test_oct_matches_plain_operator(hex_elements, monkeypatch):
    model = _model(11, 9, 8, hex_elements=hex_elements)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(model.vector_shape).astype(np.float32))
    ss, mf = np.float32(1.3), np.float32(2.5e5)

    monkeypatch.setenv("CIVIWAVE_OCT", "0")
    monkeypatch.setenv("CIVIWAVE_GATHER_WINDOWS", "0")
    ref = np.asarray(ops.apply_keff(model, x, ss, mf))
    monkeypatch.setenv("CIVIWAVE_OCT", "1")
    got = np.asarray(ops.apply_keff(model, x, ss, mf))

    scale = np.abs(ref).max()
    # same per-incidence multiplies; only the assembly's slot-sum
    # association differs (oct sums pattern slots in einsum order)
    np.testing.assert_allclose(got, ref, atol=1e-6 * scale, rtol=1e-6)


def test_geometric_renumbering_reengages_oct():
    """A shuffled box is NOT offset-regular in file order; the geometric
    (coordinate-lex) renumbering recovers the grid structure so the oct
    plans re-engage (ADR-33) — the property bench.py's shuffled 34^3
    general-steps metric rides on."""
    model = _model(7, 6, 5, hex_elements=True, shuffled=True)
    assert model.renumbered
    assert model.xo_hex, "x oct plan should re-engage after geo renumber"
    assert model.oa_oct, "assembly oct plan should re-engage"


def test_oct_fallback_on_irregular_numbering(monkeypatch):
    """With renumbering disabled, a shuffled numbering is NOT offset-
    regular: the oct planner must bail cleanly and the operator (with
    oct forced on) must still agree with the plain path."""
    monkeypatch.setenv("CIVIWAVE_RENUMBER", "0")
    model = _model(7, 6, 5, hex_elements=True, shuffled=True)
    assert model.xo_hex == () and model.oa_oct == ()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(model.vector_shape).astype(np.float32))
    ss, mf = np.float32(1.0), np.float32(1.0e6)

    monkeypatch.setenv("CIVIWAVE_OCT", "0")
    monkeypatch.setenv("CIVIWAVE_GATHER_WINDOWS", "0")
    ref = np.asarray(ops.apply_keff(model, x, ss, mf))
    monkeypatch.setenv("CIVIWAVE_OCT", "1")
    got = np.asarray(ops.apply_keff(model, x, ss, mf))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=1e-6 * scale, rtol=1e-6)


def test_oct_assembly_offaxis_slices_zero_pad():
    """Table slices that lie partly or ENTIRELY off the element axis
    must zero-pad, not crash (hit at 106^3 where boundary-node columns
    push chunk windows past both ends).  A chunk (n0, ncnt, e_lo, L,
    pat) is equivalent to (n0, ncnt, e_lo - s, L + s + t, pat) — the
    gathered column shifts by s — so shifting the representation forces
    overhangs without changing the math."""
    import dataclasses

    import jax

    model = _model(4, 2, 2, hex_elements=True)
    assert model.oa_oct
    rng = np.random.default_rng(0)
    f = jnp.asarray(
        rng.standard_normal((24, model.padded_hex_count)).astype(np.float32)
    )
    ref = np.asarray(ops._assemble_oct(model, f))
    e_pad = model.padded_hex_count
    span = max(de for _, _, _, _, pat in model.oa_oct for de, _ in pat)
    shifted = tuple(
        # e_lo shifted far left AND L stretched far right: every slice
        # overhangs; some (de near 0 / de near span) sit fully outside
        (n0, ncnt, e_lo - (e_pad + span), L + 2 * (e_pad + span), pat)
        for n0, ncnt, e_lo, L, pat in model.oa_oct
    )
    doctored = dataclasses.replace(model, oa_oct=shifted)
    got = np.asarray(jax.jit(ops._assemble_oct)(doctored, f))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_oct_engages_inside_newmark_step(monkeypatch):
    """One implicit Newmark step with oct forced on matches the plain
    path to solver tolerance (the operators differ only in summation
    association, so the PCG trajectories track to fp precision)."""
    from functools import partial

    from civiwave_tpu.solver.stepper import newmark_step
    from civiwave_tpu.utils.synthetic import cantilever_config

    cfg = cantilever_config()
    mats = [materials.make_properties(m) for m in cfg.materials]
    mesh = box_mesh(6, 5, 4, hex_elements=True)
    pre = preprocess.run(mesh, cfg)
    model, state, force = pack.build_packed_model(mesh, pre, cfg, mats)
    ray = materials.compute_rayleigh(cfg.damping)
    step = partial(
        newmark_step, rayleigh_alpha=ray.alpha, rayleigh_beta=ray.beta
    )

    monkeypatch.setenv("CIVIWAVE_OCT", "0")
    ref = step(model, state, force, 1.0e-3, 1.0e-8, 200)
    monkeypatch.setenv("CIVIWAVE_OCT", "1")
    got = step(model, state, force, 1.0e-3, 1.0e-8, 200)
    assert bool(ref.pcg.converged) and bool(got.pcg.converged)
    r = np.asarray(ref.state.displacement)
    g = np.asarray(got.state.displacement)
    scale = np.abs(r).max()
    np.testing.assert_allclose(g, r, atol=1e-5 * scale, rtol=1e-4)
