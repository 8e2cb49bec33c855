"""ctypes bridge to the native Gmsh section parser (native/gmsh_fast.cpp).

The C++ library handles the bulk $Nodes/$Elements number scanning (the IO
hot path at multi-million-node scale — pure-Python tokenizing is ~50x
slower); $PhysicalNames/$Entities stay in Python (mesh/gmsh.py).  The
library is compiled on first use with g++ and cached under ``native/build``;
if no toolchain is available the caller falls back to the pure-Python
parser transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "gmsh_fast.cpp")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libcwf_gmsh.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


class _GmshNodes(ctypes.Structure):
    _fields_ = [
        ("count", ctypes.c_int64),
        ("block_count", ctypes.c_int64),
        ("ids", ctypes.POINTER(ctypes.c_int64)),
        ("coords", ctypes.POINTER(ctypes.c_double)),
        ("blocks", ctypes.POINTER(ctypes.c_int64)),
        ("status", ctypes.c_int32),
    ]


class _GmshElements(ctypes.Structure):
    _fields_ = [
        ("block_count", ctypes.c_int64),
        ("total_count", ctypes.c_int64),
        ("blocks", ctypes.POINTER(ctypes.c_int64)),
        ("tags", ctypes.POINTER(ctypes.c_int64)),
        ("conn", ctypes.POINTER(ctypes.c_int64)),
        ("conn_len", ctypes.c_int64),
        ("processed", ctypes.c_int64),
        ("status", ctypes.c_int32),
        ("bad_type", ctypes.c_int64),
        ("bad_entity", ctypes.c_int64),
    ]


def _build_library() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native parser; None when unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not os.path.isfile(_SRC) or not _build_library():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.cwf_parse_nodes.restype = ctypes.POINTER(_GmshNodes)
        lib.cwf_parse_nodes.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.cwf_parse_elements.restype = ctypes.POINTER(_GmshElements)
        lib.cwf_parse_elements.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.cwf_free_nodes.argtypes = [ctypes.POINTER(_GmshNodes)]
        lib.cwf_free_elements.argtypes = [ctypes.POINTER(_GmshElements)]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def parse_nodes_section(body: bytes):
    """Parse a $Nodes body; returns (ids, coords, blocks) numpy arrays.

    blocks: (B, 4) int64 rows of (entity_dim, entity_tag, first, count).
    Raises ValueError with the reference's message on count mismatch.
    """
    lib = load_library()
    assert lib is not None
    handle = lib.cwf_parse_nodes(body, len(body))
    try:
        data = handle.contents
        if data.status == -15:
            raise ValueError("node count mismatch")
        if data.status != 0:
            raise ValueError(f"malformed $Nodes section (code {data.status})")
        n = data.count
        ids = np.ctypeslib.as_array(data.ids, shape=(n,)).copy()
        coords = np.ctypeslib.as_array(data.coords, shape=(n, 3)).copy()
        blocks = np.ctypeslib.as_array(
            data.blocks, shape=(data.block_count, 4)
        ).copy()
        return ids, coords, blocks
    finally:
        lib.cwf_free_nodes(handle)


def parse_elements_section(body: bytes):
    """Parse an $Elements body; returns (blocks, tags, conn) numpy arrays.

    blocks: (B, 5) int64 rows of (dim, entity_tag, element_type, first,
    count) for kept (dim 2/3) blocks; conn is the ragged concatenated
    connectivity.  Raises ValueError mirroring the reference's messages.
    """
    lib = load_library()
    assert lib is not None
    handle = lib.cwf_parse_elements(body, len(body))
    try:
        data = handle.contents
        if data.status == -1:
            raise ValueError(
                f"unsupported Gmsh element type {data.bad_type}"
                f"|entityTag={data.bad_entity}"
            )
        if data.status == -24:
            raise ValueError("element count mismatch")
        if data.status != 0:
            raise ValueError(f"malformed $Elements section (code {data.status})")
        blocks = np.ctypeslib.as_array(
            data.blocks, shape=(data.block_count, 5)
        ).copy()
        tags = np.ctypeslib.as_array(data.tags, shape=(data.total_count,)).copy()
        conn = np.ctypeslib.as_array(data.conn, shape=(data.conn_len,)).copy()
        return blocks, tags, conn
    finally:
        lib.cwf_free_elements(handle)
