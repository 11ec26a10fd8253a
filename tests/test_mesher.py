"""Mesher tests: face culling + winding + DDA cross-check
(reference chunk.rs:158-292)."""

import numpy as np
import pytest

from wavefront_tpu.world.blocks import BlockRegistry
from wavefront_tpu.world.mesher import gen_hitbox, gen_mesh, visible_faces

ASSETS = "assets"


@pytest.fixture(scope="module")
def registry():
    return BlockRegistry.load(ASSETS)


def test_single_block_has_six_faces(registry):
    grid = np.full((4, 4, 4), registry.air, np.uint8)
    grid[1, 1, 1] = registry.block_idx("stone")
    voxels, faces, blocks = visible_faces(grid, registry)
    assert len(faces) == 6
    assert sorted(faces.tolist()) == [0, 1, 2, 3, 4, 5]
    verts, uv, tex = gen_mesh(grid, registry)
    assert verts.shape == (12, 3, 3)
    # texture slots follow block*6+face (block.rs:116-119)
    stone = registry.block_idx("stone")
    assert set(tex.tolist()) == {stone * 6 + f for f in range(6)}


def test_interior_faces_culled(registry):
    grid = np.full((4, 4, 4), registry.block_idx("stone"), np.uint8)
    voxels, faces, blocks = visible_faces(grid, registry)
    # only the outer shell faces (grid borders read air): 6 sides x 16
    assert len(faces) == 6 * 16


def test_glass_neighbor_keeps_faces(registry):
    grid = np.full((3, 1, 1), registry.air, np.uint8)
    grid[0] = registry.block_idx("stone")
    grid[1] = registry.block_idx("glass")
    voxels, faces, blocks = visible_faces(grid, registry)
    # stone has a face toward glass (glass translucent) and glass has faces
    # toward both stone... no: glass faces exist toward translucent nbrs only
    # stone: 6 faces (toward glass + 5 air borders)
    stone_faces = (blocks == registry.block_idx("stone")).sum()
    assert stone_faces == 6


def test_outward_normals(registry):
    grid = np.full((3, 3, 3), registry.air, np.uint8)
    grid[1, 1, 1] = registry.block_idx("stone")
    verts, uv, tex = gen_mesh(grid, registry)
    center = np.array([1.5, 1.5, 1.5])
    for t in range(len(verts)):
        v0, v1, v2 = verts[t]
        n = np.cross(v1 - v0, v2 - v0)
        outward = (v0 + v1 + v2) / 3 - center
        assert np.dot(n, outward) > 0, f"tri {t} winding not outward"


def test_mesh_consistent_with_dda(registry):
    """Every DDA hit face must exist in the mesh and vice versa."""
    from wavefront_tpu.render.intersect import dda_trace

    rs = np.random.RandomState(3)
    grid = np.full((8, 8, 8), registry.air, np.uint8)
    m = rs.rand(8, 8, 8) < 0.1
    grid[m] = registry.block_idx("stone")
    voxels, faces, blocks = visible_faces(grid, registry)
    mesh_set = {(tuple(v), int(f)) for v, f in zip(voxels, faces)}

    nb = registry.num_blocks
    transp = np.zeros(256, bool)
    transl = np.zeros(256, bool)
    transp[: nb + 1] = registry.transparent
    transl[: nb + 1] = registry.translucent
    transp[nb + 1:] = True
    transl[nb + 1:] = True

    n = 200
    o = rs.uniform(-4, 12, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = dda_trace(grid, np.zeros(3, np.int32), transp, transl, 255, o, d,
                    max_steps=64)
    hits = np.asarray(hit.hit)
    for i in np.where(hits)[0]:
        key = (
            (int(np.asarray(hit.vx)[i]), int(np.asarray(hit.vy)[i]),
             int(np.asarray(hit.vz)[i])),
            int(np.asarray(hit.face)[i]),
        )
        assert key in mesh_set, f"DDA hit face {key} missing from mesh"


def test_gen_hitbox(registry):
    grid = np.full((4, 4, 4), registry.air, np.uint8)
    assert gen_hitbox(grid, registry) is None
    grid[1, 2, 3] = registry.block_idx("stone")
    boxes = gen_hitbox(grid, registry)
    assert boxes.shape == (1, 3)
    np.testing.assert_allclose(boxes[0], [1.5, 2.5, 3.5])
