"""Render engine: voxel scene, DDA intersector, wavefront pipeline, renderer."""
