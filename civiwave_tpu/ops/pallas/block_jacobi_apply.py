"""Pallas TPU kernel: class-block Jacobi apply for homogeneous grids.

On a homogeneous uniform grid the 3x3 node block of the assembled K_eff
diagonal depends only on the node's per-axis boundary class (low face /
interior / high face): at most 27 distinct inverse blocks exist, so the
per-node symmetric-packed table (6, X, Y, Z) — 402 MB at 50.3M DOF, the
largest non-matvec HBM stream of every PCG iteration — carries ~27 unique
values.  The XLA applies cannot exploit that: the 3-component output stack
splits into three fusions that each re-read all of ``r`` (measured 2.33 ms
full-table at 50.3M DOF on v5e; a broadcast-expanded XLA form measured
2.64 ms — re-reading r three times costs more than the table it saves).

This kernel streams the residual ONCE in (3, B, Y, Z) slabs of B planes
(one plane per grid step measured 1.98 ms — per-step pipeline latency
dominated the trivial compute; B=8 slabs amortize it).  Per slab it
applies the x-interior class scalars everywhere (15 FMAs/point), then
overwrites the y/z boundary rows/cols/corners — O(perimeter) slices, the
ADR-21 boundary treatment — and finally recomputes the two global x-face
planes under ``pl.when`` with their own class scalars.  The x-face plane
indices arrive as SMEM scalars, mirroring the fused stencil kernel.

Reference analogue: pcg_precondition.slang reads per-node BlockInverse
rows; at <=150k DOF the table fits cache and deduplication was never
worth it.  Used on the TPU backend for LARGE unsharded f32 grids only
(same policy as the fused stencil kernel); CPU tests run interpret mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(x_planes: int) -> int:
    for b in (8, 4, 2):
        if x_planes % b == 0:
            return b
    return 1


def _make_kernel(block: int, y: int, z: int, ny: int, nz: int):
    def kernel(tab_ref, xlo_ref, xhi_ref, r_ref, bc_ref, out_ref):
        # tab_ref: (1, 3, 54) SMEM — [x-class, (m * 3 + a) * 3 + b] scalar
        # bundles for x-class low/interior/high; a/b are y/z classes
        i = pl.program_id(0)
        r = r_ref[...]  # (3, B, y, z)
        free = 1.0 - bc_ref[...].astype(jnp.float32)

        def t(cls, m, a, b):
            return tab_ref[0, cls, (m * 3 + a) * 3 + b]

        def apply_block(cls, a, b, rb, fb):
            c00, c11, c22, c01, c02, c12 = (
                t(cls, m, a, b) for m in range(6)
            )
            r0, r1, r2 = rb[0], rb[1], rb[2]
            out = jnp.stack(
                [
                    c00 * r0 + c01 * r1 + c02 * r2,
                    c01 * r0 + c11 * r1 + c12 * r2,
                    c02 * r0 + c12 * r1 + c22 * r2,
                ]
            )
            # select, not multiply: free * out yields -0.0 on constrained
            # components where the XLA applies' where() yields +0.0
            return jnp.where(fb != 0.0, out, 0.0)

        def paint(cls, sel):
            """Write one class pattern through ``sel`` — sel slices the
            (3, planes..., y, z) views down to the target sub-block."""
            rs, fs = sel(r), sel(free)
            store = sel(out_ref, store=True)
            store[0](apply_block(cls, 1, 1, rs, fs))
            for a, rpos in ((0, 0), (2, ny)):
                rr = rs[:, ..., rpos : rpos + 1, :]
                ff = fs[:, ..., rpos : rpos + 1, :]
                store[1](rpos, apply_block(cls, a, 1, rr, ff))
            for b, cpos in ((0, 0), (2, nz)):
                rr = rs[:, ..., :, cpos : cpos + 1]
                ff = fs[:, ..., :, cpos : cpos + 1]
                store[2](cpos, apply_block(cls, 1, b, rr, ff))
            for a, rpos in ((0, 0), (2, ny)):
                for b, cpos in ((0, 0), (2, nz)):
                    rr = rs[:, ..., rpos : rpos + 1, cpos : cpos + 1]
                    ff = fs[:, ..., rpos : rpos + 1, cpos : cpos + 1]
                    store[3](rpos, cpos, apply_block(cls, a, b, rr, ff))

        def slab_sel(v, store=False):
            if not store:
                return v  # (3, B, y, z)

            def full(val):
                out_ref[...] = val

            def row(rpos, val):
                out_ref[:, :, rpos : rpos + 1, :] = val

            def col(cpos, val):
                out_ref[:, :, :, cpos : cpos + 1] = val

            def corner(rpos, cpos, val):
                out_ref[:, :, rpos : rpos + 1, cpos : cpos + 1] = val

            return (full, row, col, corner)

        # whole slab with x-interior scalars (wrong only on x-face planes,
        # repainted below; dead x pads keep interior values — bc-zeroed)
        paint(1, slab_sel)

        # x-face planes: repaint plane j with its own class scalars
        for j in range(block):
            for cls, ref in ((0, xlo_ref), (2, xhi_ref)):

                @pl.when(i * block + j == ref[0, 0])
                def _(j=j, cls=cls):
                    def plane_sel(v, store=False, j=j):
                        if not store:
                            return v[:, j]  # (3, y, z)

                        def full(val):
                            out_ref[:, j] = val

                        def row(rpos, val):
                            out_ref[:, j, rpos : rpos + 1, :] = val

                        def col(cpos, val):
                            out_ref[:, j, :, cpos : cpos + 1] = val

                        def corner(rpos, cpos, val):
                            out_ref[
                                :, j, rpos : rpos + 1, cpos : cpos + 1
                            ] = val

                        return (full, row, col, corner)

                    paint(cls, plane_sel)

    return kernel


def apply_block_jacobi_pallas(
    model, table: jax.Array, residual: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """z = M^-1 r from the (6, 3, 3, 3) class table; one pass over the
    residual in B-plane slabs.

    ``table`` is indexed [component, x-class, y-class, z-class] with packed
    components [00, 11, 22, 01, 02, 12].  Dead x pad planes keep interior
    scalars — their output is bc-zeroed, any finite value works.
    """
    x_planes, y, z = model.grid_shape
    block = _pick_block(x_planes)
    # (1, 3, 54) scalar bundles per x-class (y/z class resolved in-kernel)
    tab = jnp.transpose(table, (1, 0, 2, 3)).reshape(1, 3, 54)
    bc8 = model.bc_mask.astype(jnp.int8)
    kernel = _make_kernel(block, y, z, model.ny, model.nz)
    vec_spec = pl.BlockSpec(
        (3, block, y, z),
        lambda i: (i * 0, i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    xlo = jnp.zeros((1, 1), jnp.int32)
    xhi = jnp.full((1, 1), model.nx, jnp.int32)
    smem = pl.BlockSpec(
        (1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(x_planes // block,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, 54),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.SMEM,
            ),
            smem,
            smem,
            vec_spec,
            vec_spec,
        ],
        out_specs=vec_spec,
        out_shape=jax.ShapeDtypeStruct(residual.shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=20 * residual.size,
            bytes_accessed=2 * residual.size * 4 + residual.size,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # 3 slab streams (r, bc, out) double-buffered at B=8 planes
            # exceed the 16 MB default scoped-vmem cap at 256^2 planes
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(tab, xlo, xhi, residual, bc8)
    return out
