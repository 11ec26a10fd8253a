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
from wavefront_tpu.render.renderer import Renderer, render_frame
from wavefront_tpu.render.scene import VoxelScene

PIXEL_AXIS = "pixels"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the pixel axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (PIXEL_AXIS,))


def render_frame_sharded(
    scene,
    eye,
    front,
    right,
    up,
    frame_count,
    *,
    settings: RenderSettings,
    nee_type: int,
    sort_type: int,
    debug_view: int,
    mesh: Mesh,
):
    """render_frame with ray arrays sharded over the mesh's pixel axis.

    Implemented by constraining the raygen outputs; GSPMD then propagates the
    sharding through the whole bounce scan (all per-ray ops are elementwise
    or per-ray gathers from replicated scene arrays).
    """
    ray_sharding = NamedSharding(mesh, P(PIXEL_AXIS))

    # Re-run the bounce pipeline with the raygen outputs constrained to the
    # pixel sharding; GSPMD propagates the placement through every per-ray
    # op (the sort-based slot permutation is intentionally omitted here —
    # a global sort would shuffle rays across chips for no image change).
    from wavefront_tpu.render.renderer import _shade  # reuse internals
    from wavefront_tpu.render.wavefront import (
        accumulate_radiance,
        nee_pdf_sweep,
        postprocess,
        raygen,
    )
    from wavefront_tpu.core.rng import murmur3_combine

    w, h = settings.render_width, settings.render_height
    b_total = settings.num_bounces
    origin, direction, ray_id = raygen(eye, front, right, up, w, h)
    origin = jax.lax.with_sharding_constraint(origin, ray_sharding)
    direction = jax.lax.with_sharding_constraint(direction, ray_sharding)
    ray_id = jax.lax.with_sharding_constraint(ray_id, ray_sharding)
    frame_count = jnp.asarray(frame_count, jnp.uint32)

    def bounce_body(carry, b):
        o, d, rid = carry
        inv_seed = frame_count * jnp.uint32(b_total) + b.astype(jnp.uint32)
        seed = murmur3_combine(inv_seed, rid)
        (new_o, new_d, normal, emis, refl, mis, bsdf_pdf, dense_probs,
         _hits) = _shade(
            scene, settings, nee_type, b, o, d, seed
        )
        nee_pdf = (
            nee_pdf_sweep(
                scene.lights, new_o, normal, new_d, mis,
                settings.max_bvh_depth, dense_probs=dense_probs,
            )
            if nee_type != 0
            else jnp.zeros(o.shape[0], jnp.float32)
        )
        valid = jnp.any(new_d != 0.0, axis=-1)
        outs = (emis, refl, mis, bsdf_pdf, nee_pdf, valid)
        return (new_o, new_d, rid), outs

    (_, _, _), outs = jax.lax.scan(
        bounce_body, (origin, direction, ray_id), jnp.arange(b_total, dtype=jnp.int32)
    )
    emis, refl, mis, bsdf_pdf, nee_pdf, valid = outs
    radiance0 = accumulate_radiance(emis, refl, mis, bsdf_pdf, nee_pdf, valid)
    debug = jnp.zeros((w * h, 3), jnp.float32)
    img = postprocess(
        radiance0, debug, settings.width, settings.height, settings.scale, debug_view
    )
    return img


class DistributedRenderer:
    """Renderer running one frame SPMD over a device mesh."""

    def __init__(self, settings: RenderSettings, mesh: Mesh):
        self.settings = settings
        self.mesh = mesh
        self._cache = {}

    def _fn(self, nee_type: int, sort_type: int, debug_view: int):
        key = (nee_type, sort_type, debug_view)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                functools.partial(
                    render_frame_sharded,
                    settings=self.settings,
                    nee_type=nee_type,
                    sort_type=sort_type,
                    debug_view=debug_view,
                    mesh=self.mesh,
                )
            )
        return self._cache[key]

    def render(self, scene, camera, prefs: Optional[RenderingPreferences] = None,
               frame_count: int = 0):
        prefs = prefs or RenderingPreferences()
        arrays = scene.get_arrays() if isinstance(scene, VoxelScene) else scene
        fn = self._fn(int(prefs.nee_type), int(prefs.sort_type), int(prefs.debug_view))
        img = fn(
            arrays,
            jnp.asarray(camera.eye, jnp.float32),
            jnp.asarray(camera.front, jnp.float32),
            jnp.asarray(camera.right, jnp.float32),
            jnp.asarray(camera.up, jnp.float32),
            np.uint32(frame_count),
        )
        return np.asarray(jax.device_get(img))
