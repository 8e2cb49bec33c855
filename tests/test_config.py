"""Config loader validation matrix.

Mirrors /root/reference/tests/config_validation_test.cpp: golden parse of the
cantilever fixture plus one test per validation rule, asserting message and
breadcrumb context (config.cpp:148-605).
"""

import os

import pytest

from civiwave_tpu.config.loader import (
    load_config_from_file,
    load_config_from_string,
    parse_config_node,
)
from civiwave_tpu.utils.errors import ConfigError
from support import make_config_dict


def test_golden_fixture_parses(data_dir):
    cfg = load_config_from_file(os.path.join(data_dir, "cantilever.yaml"))
    assert cfg.mesh_path == "tests/data/cantilever.msh"
    assert len(cfg.materials) == 1
    mat = cfg.materials[0]
    assert mat.name == "concrete"
    assert mat.youngs_modulus == pytest.approx(3.0e10)
    assert mat.poisson_ratio == pytest.approx(0.2)
    assert mat.density == pytest.approx(2500.0)
    assert cfg.assignments[0].group == "SOLID"
    assert cfg.damping.xi == pytest.approx(0.02)
    assert cfg.damping.w1 == pytest.approx(10.0)
    assert cfg.damping.w2 == pytest.approx(100.0)
    assert cfg.time.initial_dt == pytest.approx(0.01111)
    assert cfg.time.adaptive is True
    assert cfg.time.min_dt == pytest.approx(0.005)
    assert cfg.time.max_dt == pytest.approx(0.02)
    assert cfg.solver.type == "pcg"
    assert cfg.solver.preconditioner == "block_jacobi"
    assert cfg.solver.runtime_tolerance == pytest.approx(2.0e-4)
    assert cfg.solver.pause_tolerance == pytest.approx(1.0e-5)
    assert cfg.solver.max_iterations == 120
    assert cfg.precision.vector_precision == "fp32"
    assert cfg.precision.reduction_precision == "fp64"
    assert "load_curve1" in cfg.curves
    assert cfg.curves["load_curve1"].points == ((0.0, 0.0), (0.5, 0.75), (1.0, 1.0))
    assert cfg.loads.gravity == (0.0, 0.0, -9.81)
    assert len(cfg.loads.tractions) == 1
    assert cfg.loads.tractions[0].scale_curve == "load_curve1"
    assert len(cfg.dirichlet) == 1
    assert cfg.dirichlet[0].constrain_axis == (True, True, True)
    assert cfg.dirichlet[0].value == (None, None, None)
    assert cfg.output.vtu_stride == 10
    assert cfg.output.probes == (1, 2)


def test_missing_file_reports_open_error(tmp_path):
    with pytest.raises(ConfigError, match="unable to open"):
        load_config_from_file(str(tmp_path / "missing.yaml"))


def test_yaml_parse_error():
    with pytest.raises(ConfigError, match="YAML parse error"):
        load_config_from_string("materials: [unclosed")


def test_root_must_be_mapping():
    with pytest.raises(ConfigError, match="config root must be a mapping"):
        parse_config_node([1, 2, 3])


def _expect(match, **overrides):
    with pytest.raises(ConfigError, match=match) as err:
        parse_config_node(make_config_dict(**overrides))
    return err.value


def test_missing_mesh_section():
    cfg = make_config_dict()
    del cfg["mesh"]
    with pytest.raises(ConfigError, match="missing 'mesh' section"):
        parse_config_node(cfg)


def test_mesh_path_must_be_string():
    err = _expect("mesh.path must be a scalar string", mesh={"path": 42})
    assert err.context == ["mesh", "path"]


def test_materials_must_be_nonempty():
    _expect("materials must be a non-empty sequence", materials=[])


def test_material_e_positive():
    err = _expect(
        "material.E must be > 0",
        materials=[{"name": "m", "E": -1.0, "nu": 0.2, "rho": 1.0}],
    )
    assert err.context == ["materials", "[0]", "E"]


def test_material_nu_range():
    _expect(
        r"material.nu must be \(-0.999, 0.5\)",
        materials=[{"name": "m", "E": 1.0, "nu": 0.5, "rho": 1.0}],
    )


def test_material_rho_positive():
    _expect(
        "material.rho must be > 0",
        materials=[{"name": "m", "E": 1.0, "nu": 0.2, "rho": 0.0}],
    )


def test_material_names_unique():
    _expect(
        "material names must be unique",
        materials=[
            {"name": "m", "E": 1.0, "nu": 0.2, "rho": 1.0},
            {"name": "m", "E": 2.0, "nu": 0.3, "rho": 2.0},
        ],
        assignments=[{"group": "SOLID", "material": "m"}],
    )


def test_assignment_unknown_material():
    err = _expect(
        "assignment references unknown material",
        assignments=[{"group": "SOLID", "material": "nope"}],
    )
    assert err.context == ["assignments", "[0]", "material"]


def test_damping_xi_range():
    _expect(r"damping.xi must be \(0,1\)", damping={"xi": 1.5, "w1": 1.0, "w2": 2.0})


def test_damping_w1_positive():
    _expect("damping.w1 must be > 0", damping={"xi": 0.1, "w1": 0.0, "w2": 2.0})


def test_damping_w2_above_w1():
    _expect("damping.w2 must be > damping.w1", damping={"xi": 0.1, "w1": 5.0, "w2": 5.0})


def test_time_dt_positive():
    _expect("time.dt must be > 0", time={"dt": 0.0, "adaptive": False})


def test_time_min_dt_nonnegative():
    _expect(
        "time.min_dt must be >= 0",
        time={"dt": 0.01, "adaptive": False, "min_dt": -1.0},
    )


def test_time_max_dt_at_least_dt():
    _expect(
        "time.max_dt must be >= time.dt",
        time={"dt": 0.01, "adaptive": False, "max_dt": 0.001},
    )


def test_time_defaults():
    cfg = make_config_dict(time={"dt": 0.01, "adaptive": False})
    parsed = parse_config_node(cfg)
    assert parsed.time.min_dt == 0.0
    assert parsed.time.max_dt == pytest.approx(0.01)


def test_solver_max_iters_positive():
    _expect(
        "solver.max_iters must be >= 1",
        solver={
            "type": "pcg",
            "preconditioner": "bj",
            "tol_runtime": 1e-4,
            "tol_pause": 1e-5,
            "max_iters": 0,
        },
    )


def test_solver_tolerances_positive():
    _expect(
        "solver tolerances must be > 0",
        solver={
            "type": "pcg",
            "preconditioner": "bj",
            "tol_runtime": -1e-4,
            "tol_pause": 1e-5,
            "max_iters": 10,
        },
    )


def test_missing_precision():
    cfg = make_config_dict()
    del cfg["precision"]
    with pytest.raises(ConfigError, match="missing precision map"):
        parse_config_node(cfg)


def test_curve_must_be_nonempty():
    _expect("curve must be non-empty sequence", curves={"c": []})


def test_curve_point_arity():
    _expect("curve point must be sequence\\[2\\]", curves={"c": [[0.0]]})


def test_curve_times_non_decreasing():
    err = _expect(
        "curve times must be non-decreasing", curves={"c": [[1.0, 0.0], [0.5, 1.0]]}
    )
    assert err.context == ["curves", "c", "[1]"]


def test_gravity_requires_vec3():
    _expect("expected sequence\\[3\\] for vector", loads={"gravity": [0.0, 1.0]})


def test_traction_unknown_curve():
    _expect(
        "traction references unknown curve",
        loads={
            "gravity": [0, 0, 0],
            "tractions": [
                {"group": "F", "value": [0, 0, 1], "scale_curve": "nope"}
            ],
        },
    )


def test_point_load_unknown_curve():
    _expect(
        "point load references unknown curve",
        loads={
            "gravity": [0, 0, 0],
            "points": [{"group": "P", "value": [0, 0, 1], "scale_curve": "nope"}],
        },
    )


def test_tractions_must_be_sequence():
    _expect(
        "loads.tractions must be a sequence when present",
        loads={"gravity": [0, 0, 0], "tractions": {"group": "F"}},
    )


def test_dirichlet_dof_subset():
    _expect(
        r"dirichlet.dof must be subset of \{x,y,z\}",
        dirichlet={"fixes": [{"group": "F", "dof": ["w"]}]},
    )


def test_dirichlet_dof_nonempty():
    _expect(
        "dirichlet.dof must not be empty",
        dirichlet={"fixes": [{"group": "F", "dof": []}]},
    )


def test_dirichlet_value_override():
    cfg = parse_config_node(
        make_config_dict(
            dirichlet={
                "fixes": [
                    {"group": "F", "dof": ["x", "z"], "value": [1.0, None, -2.0]}
                ]
            }
        )
    )
    fix = cfg.dirichlet[0]
    assert fix.constrain_axis == (True, False, True)
    assert fix.value == (1.0, None, -2.0)


def test_vtu_stride_positive():
    _expect(
        "output.vtu_stride must be >= 1", output={"vtu_stride": 0, "probes": []}
    )


def test_missing_output():
    cfg = make_config_dict()
    del cfg["output"]
    with pytest.raises(ConfigError, match="missing output map"):
        parse_config_node(cfg)


def test_precision_values_validated(tmp_path):
    """config.cpp:339-352 — only fp32/fp64 are valid precision values."""
    import os

    src = os.path.join(os.path.dirname(__file__), "data", "cantilever.yaml")
    bad = tmp_path / "bad.yaml"
    bad.write_text(
        open(src).read().replace("reductions: fp64", "reductions: fp16")
    )
    with pytest.raises(ConfigError, match="fp32.*fp64|reductions"):
        load_config_from_file(str(bad))


def test_solver_variant_and_warm_start_policy_defaults():
    cfg = parse_config_node(make_config_dict())
    assert cfg.solver.variant == "auto"
    assert cfg.solver.warm_start_policy == "predictor"


def test_solver_variant_fused_parses():
    cfg = parse_config_node(
        make_config_dict(
            solver={
                "type": "pcg",
                "preconditioner": "bj",
                "tol_runtime": 1e-4,
                "tol_pause": 1e-5,
                "max_iters": 10,
                "variant": "fused",
                "warm_start_policy": "solution",
            }
        )
    )
    assert cfg.solver.variant == "fused"
    assert cfg.solver.warm_start_policy == "solution"


def test_solver_variant_pipelined_parses():
    cfg = parse_config_node(
        make_config_dict(
            solver={
                "type": "pcg",
                "preconditioner": "bj",
                "tol_runtime": 1e-4,
                "tol_pause": 1e-5,
                "max_iters": 10,
                "variant": "pipelined",
            }
        )
    )
    assert cfg.solver.variant == "pipelined"


def test_solver_replace_every_parses_and_defaults():
    cfg = parse_config_node(make_config_dict())
    assert cfg.solver.replace_every == 10
    cfg = parse_config_node(
        make_config_dict(
            solver={
                "type": "pcg",
                "preconditioner": "bj",
                "tol_runtime": 1e-4,
                "tol_pause": 1e-5,
                "max_iters": 10,
                "variant": "pipelined",
                "replace_every": 0,
            }
        )
    )
    assert cfg.solver.replace_every == 0


def test_solver_replace_every_validated():
    _expect(
        "expected a non-negative integer",
        solver={
            "type": "pcg",
            "preconditioner": "bj",
            "tol_runtime": 1e-4,
            "tol_pause": 1e-5,
            "max_iters": 10,
            "replace_every": -3,
        },
    )


def test_solver_variant_validated():
    _expect(
        "solver.variant must be 'auto', 'classic', 'fused' or 'pipelined'",
        solver={
            "type": "pcg",
            "preconditioner": "bj",
            "tol_runtime": 1e-4,
            "tol_pause": 1e-5,
            "max_iters": 10,
            "variant": "gmres",
        },
    )


def test_solver_warm_start_policy_validated():
    _expect(
        "solver.warm_start_policy must be 'predictor', 'solution' or",
        solver={
            "type": "pcg",
            "preconditioner": "bj",
            "tol_runtime": 1e-4,
            "tol_pause": 1e-5,
            "max_iters": 10,
            "warm_start_policy": "zero",
        },
    )
