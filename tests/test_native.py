"""Native (C++) worldgen parity with the NumPy implementation."""

import subprocess
import os

import numpy as np
import pytest

from wavefront_tpu.core.config import WorldSettings
from wavefront_tpu.world import worldgen
from wavefront_tpu.world.blocks import BlockRegistry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    subprocess.run(["make", "-C", os.path.join(ROOT, "native")], check=True,
                   capture_output=True)
    lib = worldgen._load_native()
    if lib is None:
        pytest.skip("native worldgen not available")
    return lib


def test_native_chunk_matches_numpy(native_lib, monkeypatch):
    registry = BlockRegistry.load("assets")
    gen = worldgen.WorldGenerator(WorldSettings(), registry)
    monkeypatch.setattr(worldgen, "_NATIVE", native_lib)
    for pos in [(0, 0, 0), (-1, 0, 2), (3, -2, 1)]:
        native = gen.generate_chunk(pos)
        want = gen._generate_chunk_numpy(pos)
        np.testing.assert_array_equal(native, want)


def test_native_is_faster(native_lib, monkeypatch):
    import time

    registry = BlockRegistry.load("assets")
    gen = worldgen.WorldGenerator(WorldSettings(), registry)

    monkeypatch.setattr(worldgen, "_NATIVE", native_lib)
    t0 = time.perf_counter()
    for i in range(3):
        gen.generate_chunk((i, 0, 0))
    t_native = time.perf_counter() - t0

    monkeypatch.setattr(worldgen, "_NATIVE", None)
    t0 = time.perf_counter()
    for i in range(3):
        gen.generate_chunk((i, 0, 0))
    t_numpy = time.perf_counter() - t0
    # informational bound: native should not be drastically slower
    assert t_native < t_numpy * 5
