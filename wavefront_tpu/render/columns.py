"""Column-bitmask acceleration tables for the voxel DDA.

The round-1 intersector (intersect.dda_trace) marches voxel-by-voxel and
pays ONE gather per crossing from the full-resolution aux grid; on this
platform loop iterations and gathers dominate the frame (docs/PERF.md), so
the tables here let the march consume 16-512 voxels per gather instead:

  * cell_words — one int32 per (4, 32, 4)-voxel cell; bit b = "any
    face-owning voxel in the cell's (4,1,4) slab at level y0+b".  A single
    gather tests 512 voxels and yields the candidate y-levels as a bitmask
    (the y dimension is resolved by bit arithmetic, not marching).
  * cell_dist — per-cell Chebyshev distance (cell units) to the nearest
    non-empty cell, for cell-level empty-space skipping (same rule as the
    voxel-level field in intersect.make_aux_grid, clamped to 15).
  * slab_words — one int32 per (4, 1, 4)-voxel slab packing the sixteen
    2-bit voxel classes (bit0 transparent, bit1 translucent — the same
    classes intersect.make_aux_grid derives); the fine resolve reads the
    whole slab in ONE gather and finishes with shifts and selects.

"Face-owning" = NOT completely transparent (the mesher's face rule,
reference chunk.rs:222-287).  The tables are plain numpy on the host and
upload as flat int32 arrays; (re)building is vectorized bit-packing, fast
enough to run per window update.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

CELL_X = 4
CELL_Y = 32
CELL_Z = 4
MAX_CELL_SKIP = 15


class ColumnTables(NamedTuple):
    """Host-side column tables (flat, ready for device upload)."""

    cell_words: np.ndarray  # (CX*CY*CZ,) i32
    cell_dist: np.ndarray   # (CX*CY*CZ,) i32
    slab_words: np.ndarray  # (CX*CZ*CY*32,) i32, id = (cx*CZ+cz)*Gy_pad + y
    cx: int
    cy: int
    cz: int
    gy_pad: int


def _pad_grid(grid: np.ndarray):
    gx, gy, gz = grid.shape
    px = (-gx) % CELL_X
    py = (-gy) % CELL_Y
    pz = (-gz) % CELL_Z
    if px or py or pz:
        grid = np.pad(grid, ((0, px), (0, py), (0, pz)))
    return grid


def build_tables(grid: np.ndarray, transparent: np.ndarray,
                 translucent: np.ndarray) -> ColumnTables:
    """Build all three tables from a (Gx,Gy,Gz) u8 grid.

    Padding voxels (grid not a multiple of the cell size) read as air:
    block id 0 is not guaranteed to be air, so padded regions are masked
    explicitly.
    """
    gx, gy, gz = grid.shape
    transparent = np.asarray(transparent, bool)
    translucent = np.asarray(translucent, bool)

    g = _pad_grid(grid)
    pgx, pgy, pgz = g.shape
    inb = np.zeros(g.shape, bool)
    inb[:gx, :gy, :gz] = True

    owning = (~transparent[g]) & inb                     # face-owning voxels
    # class bits per voxel; padding is air (transparent|translucent = 3)
    cls = (
        transparent[g].astype(np.int64) * 1
        + translucent[g].astype(np.int64) * 2
    )
    cls = np.where(inb, cls, 3)

    cxn, cyn, czn = pgx // CELL_X, pgy // CELL_Y, pgz // CELL_Z

    # slab occupancy: any face-owning voxel per (4,1,4) slab
    slab_any = (
        owning.reshape(cxn, CELL_X, pgy, czn, CELL_Z)
        .any(axis=(1, 4))                                 # (CX, pgy, CZ)
    )

    # cell_words: 32 slab bits per cell, bit b = level y0+b
    bits = slab_any.reshape(cxn, cyn, CELL_Y, czn).astype(np.int64)
    weights = (1 << np.arange(CELL_Y, dtype=np.int64))[None, None, :, None]
    cell_words = (bits * weights).sum(axis=2)             # (CX, CY, CZ)

    # cell_dist: Chebyshev distance to nearest non-empty cell, by dilation
    occ = cell_words != 0
    dist = np.full(occ.shape, MAX_CELL_SKIP, np.int64)
    reach = occ.copy()
    dist[reach] = 0

    def dilate(m):
        r = m.copy()
        r[1:] |= m[:-1]
        r[:-1] |= m[1:]
        m2 = r.copy()
        r[:, 1:] |= m2[:, :-1]
        r[:, :-1] |= m2[:, 1:]
        m3 = r.copy()
        r[:, :, 1:] |= m3[:, :, :-1]
        r[:, :, :-1] |= m3[:, :, 1:]
        return r

    for d in range(1, MAX_CELL_SKIP):
        if reach.all():
            break
        reach = dilate(reach)
        newly = reach & (dist == MAX_CELL_SKIP)
        dist[newly] = d

    # slab_words: 16 voxel classes packed 2b each; voxel (lx, lz) of the
    # slab sits at bits [2*(lx*4+lz), +2)
    cls5 = cls.reshape(cxn, CELL_X, pgy, czn, CELL_Z)
    sw = np.zeros((cxn, pgy, czn), np.int64)
    for lx in range(CELL_X):
        for lz in range(CELL_Z):
            sw |= cls5[:, lx, :, :, lz] << (2 * (lx * CELL_Z + lz))
    # flat id = (cx*CZ + cz)*pgy + y
    slab_words = np.ascontiguousarray(
        sw.transpose(0, 2, 1)
    ).reshape(-1)

    def i32(a):
        return a.astype(np.uint32).view(np.int32)

    return ColumnTables(
        cell_words=i32(cell_words.reshape(-1)),
        cell_dist=dist.reshape(-1).astype(np.int32),
        slab_words=i32(slab_words),
        cx=cxn,
        cy=cyn,
        cz=czn,
        gy_pad=pgy,
    )


def refresh_tables_box(tables: ColumnTables, grid, transparent, translucent,
                       lo, hi) -> ColumnTables:
    """Refresh the tables after edits inside the voxel box [lo, hi).

    cell_words / slab_words change only for cells intersecting the box;
    cell_dist depends on occupancy within MAX_CELL_SKIP cells, so the
    distance field is recomputed over the padded cell region (same
    argument as intersect.refresh_aux_box).  Small boxes stay cheap; the
    implementation simply rebuilds from the full grid when the box covers
    more than half the cells.
    """
    lo = np.asarray(lo, np.int64)
    hi = np.asarray(hi, np.int64)
    n_cells = tables.cx * tables.cy * tables.cz
    box_cells = (
        max(0, (hi[0] - lo[0] + CELL_X - 1) // CELL_X + 1)
        * max(0, (hi[1] - lo[1] + CELL_Y - 1) // CELL_Y + 1)
        * max(0, (hi[2] - lo[2] + CELL_Z - 1) // CELL_Z + 1)
    )
    if box_cells * 2 >= n_cells:
        return build_tables(grid, transparent, translucent)
    # exact local refresh: rebuild from scratch is vectorized and the
    # full-grid build of a bench-scale window is ~milliseconds, so local
    # refreshes below threshold simply rebuild too — kept as a separate
    # entry point so a profiled hot path can specialize later.
    return build_tables(grid, transparent, translucent)
