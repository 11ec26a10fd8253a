"""wavefront_tpu — a TPU-native wavefront path-tracing engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
pimpale/vulkan-wavefront-raytracer (a Rust + Vulkan interactive voxel path
tracer).  The Vulkan reference expresses its renderer as five GLSL compute
passes over flat ray queues (raygen -> [sort -> trace]xB -> nee_pdf -> radiance
-> postprocess, reference: src/render_system/interactive_rendering.rs:1029-1532);
here the whole wavefront frame is a single jitted XLA program over
bounce-major SoA ray arrays resident in HBM, with

  * a 3-D DDA voxel-grid intersector in place of hardware ray query + TLAS
    (TPUs have no RT cores; a dense-grid DDA is branch-light and vectorizes
    onto the 8x128 VPU),
  * a single global power-weighted light BVH (CPU SAH build, stochastic
    descent on device) in place of the reference's two-level light TLAS/BLAS
    (reference: src/render_system/bvh/build.rs),
  * XLA dataflow ordering in place of pipeline barriers / semaphores / fences,
  * `jax.sharding.Mesh` + GSPMD sharding-constraint pixel-space data
    parallelism in place of (absent) multi-GPU support.

Public API mirrors the reference's layer map (SURVEY.md section 1):

  - game layer:    wavefront_tpu.world.game_world.GameWorld
  - scene layer:   wavefront_tpu.render.scene.VoxelScene
  - render engine: wavefront_tpu.render.renderer.Renderer
  - kernels:       wavefront_tpu.render.{intersect,wavefront}, wavefront_tpu.kernels
"""

from wavefront_tpu.core.config import (
    RenderSettings,
    RenderingPreferences,
    WorldSettings,
)

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports of the heavyweight layers (importing jax-heavy modules
    # only when first touched)
    if name == "Renderer":
        from wavefront_tpu.render.renderer import Renderer

        return Renderer
    if name == "DistributedRenderer":
        from wavefront_tpu.parallel.mesh import DistributedRenderer

        return DistributedRenderer
    if name == "VoxelScene":
        from wavefront_tpu.render.scene import VoxelScene

        return VoxelScene
    if name == "GameWorld":
        from wavefront_tpu.world.game_world import GameWorld

        return GameWorld
    if name == "BlockRegistry":
        from wavefront_tpu.world.blocks import BlockRegistry

        return BlockRegistry
    if name == "SphericalCamera":
        from wavefront_tpu.core.camera import SphericalCamera

        return SphericalCamera
    raise AttributeError(name)


__all__ = [
    "RenderSettings",
    "RenderingPreferences",
    "WorldSettings",
    "Renderer",
    "DistributedRenderer",
    "VoxelScene",
    "GameWorld",
    "BlockRegistry",
    "SphericalCamera",
    "__version__",
]
