"""DDA intersector parity vs a brute-force face-enumeration oracle.

The oracle enumerates every voxel face the reference mesher would emit
(reference chunk.rs:158-292: face between A and neighbor B exists iff A is
not completely transparent and B is translucent) as an axis-aligned
rectangle, intersects each ray against every rectangle exactly, and takes
the closest — the O(N*faces) equivalent of the reference's ray query over
the face-triangle BLAS (raytrace.rs:366-400).
"""

import numpy as np
import pytest

from wavefront_tpu.render.intersect import dda_trace, triangle_sweep

AIR = 7
GLASS = 1
STONE = 2
LAMP = 3

# mirror of the engine's block tables for a tiny test palette
TRANSPARENT = np.zeros(256, bool)
TRANSPARENT[AIR] = True
TRANSLUCENT = np.zeros(256, bool)
TRANSLUCENT[AIR] = True
TRANSLUCENT[GLASS] = True

FACE_AXIS = np.array([0, 0, 1, 1, 2, 2])
FACE_SIGN = np.array([-1, 1, -1, 1, -1, 1])


def enumerate_faces(grid):
    """All existing faces as (owner_voxel, face, owner_block)."""
    gx, gy, gz = grid.shape
    faces = []
    for x in range(gx):
        for y in range(gy):
            for z in range(gz):
                b = grid[x, y, z]
                if TRANSPARENT[b]:
                    continue
                for face in range(6):
                    ax, sg = FACE_AXIS[face], FACE_SIGN[face]
                    nb = [x, y, z]
                    nb[ax] += sg
                    if 0 <= nb[ax] < grid.shape[ax]:
                        nblock = grid[tuple(nb)]
                    else:
                        nblock = AIR
                    if TRANSLUCENT[nblock]:
                        faces.append(((x, y, z), face, b))
    return faces


def oracle_trace(grid, origin, direction, t_min=1e-3, t_max=1000.0):
    faces = enumerate_faces(grid)
    best = None
    for (vox, face, block) in faces:
        ax, sg = FACE_AXIS[face], FACE_SIGN[face]
        plane = vox[ax] + (1 if sg > 0 else 0)
        if abs(direction[ax]) < 1e-12:
            continue
        t = (plane - origin[ax]) / direction[ax]
        if t < t_min or t > t_max:
            continue
        p = origin + direction * t
        ok = True
        for a in range(3):
            if a == ax:
                continue
            local = p[a] - vox[a]
            if local < 0.0 or local > 1.0:
                ok = False
        if not ok:
            continue
        # normal faces the ray side it was hit from? reference ray query
        # reports both; entering = direction against outward normal
        entered = direction[ax] * sg < 0
        cand = (t, vox, face, block, entered)
        if best is None or t < best[0] - 1e-9:
            best = cand
        elif abs(t - best[0]) <= 1e-9 and entered and not best[4]:
            best = cand  # entering face wins coplanar ties
    return best


def random_grid(rs, shape=(8, 8, 8)):
    grid = np.full(shape, AIR, np.uint8)
    mask = rs.rand(*shape) < 0.15
    grid[mask] = rs.choice([GLASS, STONE, LAMP], size=mask.sum())
    return grid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dda_matches_oracle(seed):
    rs = np.random.RandomState(seed)
    grid = random_grid(rs)
    n = 128
    origin = rs.uniform(-6, 14, size=(n, 3)).astype(np.float32)
    direction = rs.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)

    hit = dda_trace(
        grid,
        np.zeros(3, np.int32),
        TRANSPARENT,
        TRANSLUCENT,
        AIR,
        origin,
        direction,
        max_steps=64,
    )
    hits = np.asarray(hit.hit)
    ts = np.asarray(hit.t)
    owners = np.asarray(hit.owner)
    faces = np.asarray(hit.face)
    voxs = np.stack([np.asarray(hit.vx), np.asarray(hit.vy), np.asarray(hit.vz)], -1)

    mismatches = 0
    for i in range(n):
        want = oracle_trace(grid, origin[i].astype(np.float64), direction[i].astype(np.float64))
        if want is None:
            if hits[i]:
                mismatches += 1
            continue
        t, vox, face, block, entered = want
        if not hits[i]:
            mismatches += 1
            continue
        # grazing-corner hits may legitimately differ; enforce t first
        assert ts[i] == pytest.approx(t, abs=2e-3), (i, origin[i], direction[i])
        if abs(ts[i] - t) < 1e-4:
            assert owners[i] == block, (i, owners[i], block)
            assert faces[i] == face, (i, faces[i], face)
            assert tuple(voxs[i]) == tuple(vox)
    assert mismatches == 0


def test_dda_ray_through_empty_grid_misses():
    grid = np.full((4, 4, 4), AIR, np.uint8)
    o = np.array([[-5.0, 2.0, 2.0]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    hit = dda_trace(grid, np.zeros(3, np.int32), TRANSPARENT, TRANSLUCENT, AIR, o, d)
    assert not bool(np.asarray(hit.hit)[0])


def test_dda_zero_direction_inactive():
    grid = np.full((4, 4, 4), STONE, np.uint8)
    o = np.array([[2.0, 2.0, 2.0]], np.float32)
    d = np.zeros((1, 3), np.float32)
    hit = dda_trace(grid, np.zeros(3, np.int32), TRANSPARENT, TRANSLUCENT, AIR, o, d)
    assert not bool(np.asarray(hit.hit)[0])


def test_dda_entering_face_attributes():
    grid = np.full((4, 4, 4), AIR, np.uint8)
    grid[2, 1, 1] = STONE
    o = np.array([[-3.0, 1.5, 1.5]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    hit = dda_trace(grid, np.zeros(3, np.int32), TRANSPARENT, TRANSLUCENT, AIR, o, d)
    assert bool(np.asarray(hit.hit)[0])
    assert np.asarray(hit.t)[0] == pytest.approx(5.0, abs=1e-5)
    assert int(np.asarray(hit.face)[0]) == 0  # LEFT face (outward -x)
    assert int(np.asarray(hit.owner)[0]) == STONE
    assert bool(np.asarray(hit.entered)[0])


def test_dda_exiting_glass_backface():
    # ray starts inside a glass voxel, exits through its +x face into air:
    # back-face hit owned by the glass block
    grid = np.full((4, 4, 4), AIR, np.uint8)
    grid[1, 1, 1] = GLASS
    o = np.array([[1.5, 1.5, 1.5]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    hit = dda_trace(grid, np.zeros(3, np.int32), TRANSPARENT, TRANSLUCENT, AIR, o, d)
    assert bool(np.asarray(hit.hit)[0])
    assert np.asarray(hit.t)[0] == pytest.approx(0.5, abs=1e-5)
    assert int(np.asarray(hit.owner)[0]) == GLASS
    assert int(np.asarray(hit.face)[0]) == 1  # RIGHT face (outward +x)
    assert not bool(np.asarray(hit.entered)[0])


def test_triangle_sweep_basic():
    tris = np.array(
        [
            [[0, 0, 2], [4, 0, 2], [0, 4, 2]],
            [[0, 0, 5], [4, 0, 5], [0, 4, 5]],
        ],
        np.float32,
    )
    active = np.array([True, True])
    o = np.array([[1.0, 1.0, 0.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    th = triangle_sweep(tris, active, o, d)
    assert bool(np.asarray(th.hit)[0])
    assert np.asarray(th.t)[0] == pytest.approx(2.0)
    assert int(np.asarray(th.tri)[0]) == 0
    # deactivate the close one -> far one wins
    th2 = triangle_sweep(tris, np.array([False, True]), o, d)
    assert np.asarray(th2.t)[0] == pytest.approx(5.0)
    assert int(np.asarray(th2.tri)[0]) == 1
