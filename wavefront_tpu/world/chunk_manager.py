"""Chunk streaming manager.

Reference: src/game_system/chunk_manager.rs.  Keeps a load window of chunks
around the ego (load radius 6, evict radius 8, chunk_manager.rs:29-37),
generates chunk data asynchronously on a worker pool (the reference uses a
15-thread pool + mpsc events, chunk_manager.rs:53-56), and applies
WorldSetBlock edits.

TPU-first divergence: instead of meshing each chunk into a triangle entity
with its own BLAS (chunk_manager.rs:215-253), generated chunks are written
into the scene's single dense voxel window — the DDA needs no meshing, so
"mesh generation" disappears and a chunk becomes renderable the moment its
block data lands in the device grid.  The device window is a fixed
per-axis (2*w+1)-chunk box recentered on the ego chunk (by default the
reference-scale load_radius in x,z with a shallow y), updated incrementally
on recenter (device roll + entered-slab uploads, scene.update_grid).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Tuple

import numpy as np

from wavefront_tpu.core.config import WorldSettings
from wavefront_tpu.render.scene import VoxelScene
from wavefront_tpu.world import chunk as chunk_mod
from wavefront_tpu.world.blocks import BlockRegistry
from wavefront_tpu.world.game_world import Manager, UpdateData, WorldSetBlock
from wavefront_tpu.world.worldgen import WorldGenerator

_FACE_OFFSET = {
    0: (-1, 0, 0), 1: (1, 0, 0), 2: (0, -1, 0),
    3: (0, 1, 0), 4: (0, 0, -1), 5: (0, 0, 1),
}


class ChunkQuerier:
    """Read API over loaded chunks (reference chunk_manager.rs:446-472)."""

    def __init__(self, manager: "ChunkManager"):
        self._m = manager

    def get_block(self, global_coords) -> Optional[int]:
        return self._m.get_block(global_coords)

    def trace_to_solid(self, origin, direction, radius: float):
        return self._m.trace_to_solid(origin, direction, radius)


class ChunkManager(Manager):
    def __init__(
        self,
        settings: WorldSettings,
        registry: BlockRegistry,
        scene: VoxelScene,
        window_chunks=None,
        workers: int = 15,  # reference game_world.rs:166
        synchronous: bool = False,
    ):
        self.settings = settings
        self.registry = registry
        self.scene = scene
        # device-window half-extent per axis, in chunks.  None derives the
        # reference-scale window from WorldSettings.load_radius
        # (chunk_manager.rs:29-37): load_radius x,z and a shallow y (the
        # worldgen is surface terrain; a full cubic radius-6 window would
        # be 13^3 chunks of mostly sky/stone for no image difference).
        if window_chunks is None:
            window_chunks = (settings.load_radius, 1, settings.load_radius)
        if isinstance(window_chunks, int):
            window_chunks = (window_chunks,) * 3
        self.window_chunks = tuple(int(w) for w in window_chunks)
        self.generator = WorldGenerator(settings, registry)
        self.chunks: Dict[Tuple[int, int, int], np.ndarray] = {}
        self.edited: set = set()  # chunks diverged from worldgen (persistence)
        self.center_chunk = (0, 0, 0)
        self.synchronous = synchronous
        self._pool = None if synchronous else ThreadPoolExecutor(max_workers=workers)
        self._pending: Dict[Tuple[int, int, int], object] = {}
        self._window_dirty = True
        self._landed: set = set()  # chunks whose data arrived since rebuild
        self.querier = ChunkQuerier(self)

    # ---- block access ----

    def get_block(self, global_coords) -> Optional[int]:
        g = np.asarray(global_coords, np.int64)
        c, b = chunk_mod.global_to_chunk_coords(g, self.settings.chunk_size)
        data = self.chunks.get(tuple(int(x) for x in c))
        if data is None:
            return None
        return int(data[tuple(b)])

    def set_block(self, global_coords, block_id: int) -> None:
        """reference chunk_manager.rs:331-392 (sans remeshing)."""
        g = np.asarray(global_coords, np.int64)
        c, b = chunk_mod.global_to_chunk_coords(g, self.settings.chunk_size)
        key = tuple(int(x) for x in c)
        data = self.chunks.get(key)
        if data is None:
            return
        data = data.copy()
        data[tuple(b)] = block_id
        self.chunks[key] = data
        self.edited.add(key)
        # mirror into the device window (incremental single-voxel store)
        self.scene.set_block(g, block_id)

    # ---- CPU picking ray (reference chunk_manager.rs:394-443) ----

    def trace_to_solid(self, origin, direction, radius: float):
        """0.01-step ray march to the first solid block; returns
        (block_coords, entry_face) or None."""
        step = 0.01
        direction = np.asarray(direction, np.float64)
        direction = direction / np.linalg.norm(direction) * step
        origin = np.asarray(origin, np.float64)
        loc = origin.copy()
        quant = chunk_mod.floor_coords(loc)
        max_iters = int(radius / step) + 2
        solid = self.registry.solid
        for _ in range(max_iters):
            prev_quant = quant
            while np.array_equal(quant, chunk_mod.floor_coords(loc)):
                loc = loc + direction
                if ((loc - origin) ** 2).sum() > radius * radius:
                    return None
            quant = chunk_mod.floor_coords(loc)
            block = self.get_block(quant)
            if block is None:
                return None
            if block < len(solid) and solid[block]:
                delta = quant - chunk_mod.floor_coords(loc - direction)
                if delta[0] == -1:
                    face = 1  # entered through its RIGHT face
                elif delta[0] == 1:
                    face = 0
                elif delta[1] == -1:
                    face = 3
                elif delta[1] == 1:
                    face = 2
                elif delta[2] == -1:
                    face = 5
                else:
                    face = 4
                return tuple(int(x) for x in quant), face
        return None

    # ---- streaming ----

    def _window_keys(self, center):
        wx, wy, wz = self.window_chunks
        cx, cy, cz = center
        return [
            (cx + dx, cy + dy, cz + dz)
            for dx in range(-wx, wx + 1)
            for dy in range(-wy, wy + 1)
            for dz in range(-wz, wz + 1)
        ]

    def _request_chunk(self, key) -> None:
        if key in self.chunks or key in self._pending:
            return
        if self.synchronous:
            self.chunks[key] = self.generator.generate_chunk(key)
            self._window_dirty = True
            self._landed.add(key)
        else:
            self._pending[key] = self._pool.submit(self.generator.generate_chunk, key)

    def _drain_pending(self) -> None:
        done = [k for k, f in self._pending.items() if f.done()]
        for k in done:
            self.chunks[k] = self._pending.pop(k).result()
            self._window_dirty = True
            self._landed.add(k)

    def _evict(self) -> None:
        # edited chunks are kept (divergence from the reference, which drops
        # edits on eviction, chunk_manager.rs:175-181 — kept here so
        # checkpoint/resume and round-trips preserve player edits)
        r = self.settings.evict_radius
        cx, cy, cz = self.center_chunk
        for k in list(self.chunks.keys()):
            if k in self.edited:
                continue
            if max(abs(k[0] - cx), abs(k[1] - cy), abs(k[2] - cz)) > r:
                del self.chunks[k]

    def _rebuild_window(self) -> None:
        """Assemble the device voxel window from loaded chunks.

        Incremental: the scene reuses the overlap with the previous window
        (device roll + slab uploads + local aux refresh) and recomputes
        only entered slabs and chunks whose data landed since the last
        rebuild (scene.update_grid) — the DDA analog of the reference
        re-meshing only changed chunks (chunk_manager.rs:165-315)."""
        cs = self.settings.chunk_size
        wx, wy, wz = self.window_chunks
        span = (2 * wx + 1, 2 * wy + 1, 2 * wz + 1)
        grid = np.full(
            (span[0] * cs, span[1] * cs, span[2] * cs),
            self.registry.air,
            np.uint8,
        )
        cx, cy, cz = self.center_chunk
        for (kx, ky, kz), data in self.chunks.items():
            ix, iy, iz = kx - cx + wx, ky - cy + wy, kz - cz + wz
            if 0 <= ix < span[0] and 0 <= iy < span[1] and 0 <= iz < span[2]:
                grid[
                    ix * cs : (ix + 1) * cs,
                    iy * cs : (iy + 1) * cs,
                    iz * cs : (iz + 1) * cs,
                ] = data
        origin = ((cx - wx) * cs, (cy - wy) * cs, (cz - wz) * cs)
        changed = [
            (
                np.array(k, np.int64) * cs,
                (np.array(k, np.int64) + 1) * cs,
            )
            for k in self._landed
        ]
        self.scene.update_grid(grid, origin, changed=changed)
        self._landed.clear()
        self._window_dirty = False

    def update(self, data: UpdateData) -> list:
        """reference chunk_manager.rs:504-546."""
        for ch in data.world_changes:
            if isinstance(ch, WorldSetBlock):
                self.set_block(ch.global_coords, ch.block_id)

        ego = data.entities.get(data.ego_entity_id)
        if ego is not None:
            pos = ego.isometry[:, 3]
            c, _ = chunk_mod.global_to_chunk_coords(
                chunk_mod.floor_coords(pos), self.settings.chunk_size
            )
            center = tuple(int(x) for x in c)
            if center != self.center_chunk:
                self.center_chunk = center
                self._window_dirty = True

        for key in self._window_keys(self.center_chunk):
            self._request_chunk(key)
        if not self.synchronous:
            self._drain_pending()
        self._evict()

        if self._window_dirty:
            self._rebuild_window()
        return []
