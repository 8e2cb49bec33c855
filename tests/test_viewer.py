"""Web viewer server round-trip (ui/viewer.py).

The reference's viewer is a GLFW/Vulkan app exercised only manually; here
the interactive layer is an HTTP server over InteractiveSession, so the
full wire protocol — mesh geometry, solve round-trip with point-load
injection, reset — is testable headless (viewer.cpp:255-340 analogue).
"""

import json
import urllib.request

import numpy as np
import pytest

from civiwave_tpu.runner import build_simulation
from civiwave_tpu.ui import viewer

_YAML = """
mesh: {path: "synthetic://box/6,3,3"}
materials:
  - {name: steel, E: 2.0e11, nu: 0.3, rho: 7800.0}
assignments: [{group: SOLID, material: steel}]
damping: {xi: 0.02, w1: 10.0, w2: 100.0}
time: {dt: 0.002, adaptive: false, min_dt: 0.001, max_dt: 0.004}
solver: {type: pcg, preconditioner: block_jacobi, tol_runtime: 1.0e-6,
         tol_pause: 1.0e-8, max_iters: 300}
precision: {vectors: fp32, reductions: fp64}
loads:
  gravity: [0.0, 0.0, -9.81]
  tractions: [{group: LOAD_FACE, value: [0.0, 0.0, -2.0e5]}]
dirichlet: {fixes: [{group: FIXED, dof: [x, y, z]}]}
output: {vtu_stride: 1, probes: []}
"""


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    path = tmp_path_factory.mktemp("viewer") / "box.yaml"
    path.write_text(_YAML)
    sim = build_simulation(str(path))
    server, backend, thread = viewer.start_in_thread(sim, port=0)
    port = server.server_address[1]
    yield f"http://127.0.0.1:{port}", backend
    server.shutdown()


def test_viewer_page_and_mesh(served):
    base, backend = served
    page = urllib.request.urlopen(base + "/").read()
    assert b"webgl2" in page and b"von Mises" in page

    r = urllib.request.urlopen(base + "/mesh")
    hdr = json.loads(r.headers["X-Civiwave"])
    blob = r.read()
    n, f = hdr["nodes"], hdr["tris"]
    assert n == backend.node_count and hdr["structured"]
    assert len(blob) == n * 12 + f * 12
    tris = np.frombuffer(blob, np.int32, f * 3, offset=n * 12)
    assert tris.min() >= 0 and tris.max() < n


def test_viewer_solve_roundtrip_and_reset(served):
    base, backend = served
    n = backend.node_count
    req = urllib.request.Request(
        base + "/solve",
        data=json.dumps(
            {"enabled": True, "anchor": n - 1, "direction": [0, 0, -1],
             "magnitude": 1.0e4}
        ).encode(),
        method="POST",
    )
    r = urllib.request.urlopen(req)
    tele = json.loads(r.headers["X-Civiwave"])
    blob = r.read()
    assert tele["converged"] and tele["iterations"] > 0
    assert len(blob) == n * 12 + n * 4
    u = np.frombuffer(blob, np.float32, n * 3).reshape(n, 3)
    vm = np.frombuffer(blob, np.float32, n, offset=n * 12)
    assert np.isfinite(u).all() and np.abs(u).max() > 0.0
    assert vm.max() > 0.0

    # each solve restores the baseline first (SimulationBackend parity):
    # a zero-load solve after a loaded one must not accumulate the load
    r2 = urllib.request.urlopen(
        urllib.request.Request(
            base + "/solve", data=b'{"enabled": false}', method="POST"
        )
    )
    u2 = np.frombuffer(r2.read(), np.float32, n * 3).reshape(n, 3)
    assert np.abs(u2).max() < np.abs(u).max()

    urllib.request.urlopen(
        urllib.request.Request(base + "/reset", method="POST")
    ).read()


def test_viewer_overlay_payload(served):
    """Directional display-stress overlay (viewer.cpp:2940-2999): the solve
    response carries a third (N,) f32 array with the anticipatory stress
    field, an auto-derived falloff in the header, and directional structure
    (anchor boosted, aligned side boosted more than the opposite side)."""
    base, backend = served
    n = backend.node_count
    anchor = n - 1
    req = urllib.request.Request(
        base + "/solve",
        data=json.dumps(
            {"enabled": True, "anchor": anchor, "direction": [-1, 0, 0],
             "magnitude": 1.0e4, "overlay": True}
        ).encode(),
        method="POST",
    )
    r = urllib.request.urlopen(req)
    tele = json.loads(r.headers["X-Civiwave"])
    blob = r.read()
    assert tele["overlay"] is True
    assert 0.05 <= tele["falloff"] <= 2.0
    assert len(blob) == n * 12 + n * 4 + n * 4
    vm = np.frombuffer(blob, np.float32, n, offset=n * 12)
    display = np.frombuffer(blob, np.float32, n, offset=n * 16)
    assert np.isfinite(display).all()
    boost = display - vm
    # anchor itself gains the full reference-scale boost
    assert boost[anchor] > 0.0
    # vertices on the aligned (-x from anchor) side gain more than the
    # boost can possibly be negative nowhere
    assert boost.min() >= -1e-4 * max(1.0, float(vm.max()))
    assert tele["overlay_max"] >= tele["vm_max"]


def test_viewer_page_has_overlay_controls(served):
    base, _ = served
    page = urllib.request.urlopen(base + "/").read()
    assert b"stress overlay" in page and b"depth test" in page
    assert b"falloff" in page
