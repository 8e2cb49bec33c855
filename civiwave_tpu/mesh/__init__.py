"""Mesh subsystem: Gmsh parsing, preprocessing, packing, structured grids.

Public loader API (reference mesh.hpp:148 / mesh.cpp:434,447):
``load_gmsh_file(path)`` and ``load_gmsh_from_string(contents)``.
"""

from .gmsh import load_gmsh_file, load_gmsh_from_string
from .model import Mesh

__all__ = ["load_gmsh_file", "load_gmsh_from_string", "Mesh"]
