"""Generate the stored-oracle golden image for the BASELINE config-1 gate.

BASELINE.md row 1: single 16^3 voxel chunk, static camera, 256x256, 1
bounce, CPU-oracle parity gate.  The scalar oracle at 256x256 takes minutes,
so its output is generated here once and stored as tests/golden/
config1_256.npz; tests/test_golden.py::test_golden_config1_baseline_res
compares the device renderer against it cheaply on every run.

Regenerate with `python tools/gen_golden.py` WHENEVER RNG draw order,
sampling logic, or epsilons change (CLAUDE.md gotchas) — the stored golden
pins the current documented semantics.  Rows are parallelized over
processes (the oracle is pure per pixel).
"""

import multiprocessing as mp
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

WIDTH = HEIGHT = 256
BOUNCES = 1
NEE_TYPE = 1
FRAME = 0


def _setup():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from test_golden import camera_pose, make_grid

    from wavefront_tpu.core.config import RenderSettings
    from wavefront_tpu.render import lights as lights_mod
    from wavefront_tpu.render.oracle import OracleRenderer
    from wavefront_tpu.world.blocks import BlockRegistry

    registry = BlockRegistry.load(os.path.join(REPO, "assets"))
    grid = make_grid(registry)
    settings = RenderSettings(
        width=WIDTH, height=HEIGHT, num_bounces=BOUNCES, max_trace_steps=96
    )
    ls = lights_mod.build_from_grid(grid, np.zeros(3), registry, 256)
    oracle = OracleRenderer(settings, registry, grid, (0, 0, 0), ls)
    return oracle, camera_pose()


def _render_rows(args):
    """Render a horizontal band [y0, y1) of the frame."""
    y0, y1 = args
    oracle, basis = _setup()
    # the oracle renders full frames; carve a band by faking the height and
    # shifting v, which must reproduce the full-frame uv mapping exactly:
    # v = 2*py/h - 1 with py in [y0, y1)
    s = oracle.s
    w, h = s.render_width, s.render_height
    aspect = w / h
    import numpy as np

    from wavefront_tpu.render.oracle import _combine

    band = np.zeros((y1 - y0, w, 3), np.float32)
    eye = np.asarray(basis.eye, np.float64)
    right = np.asarray(basis.right, np.float64)
    up = np.asarray(basis.up, np.float64)
    front = np.asarray(basis.front, np.float64)
    for py in range(y0, y1):
        for px in range(w):
            u = 2.0 * px / w - 1.0
            v = 2.0 * py / h - 1.0
            d = u * right * aspect + v * up + front
            d = d / np.linalg.norm(d)
            o = eye.copy()
            rid = py * w + px
            emis, refl, mis, bsdf, nee, valid = [], [], [], [], [], []
            for b in range(s.num_bounces):
                inv_seed = (FRAME * s.num_bounces + b) & 0xFFFFFFFF
                seed = _combine(inv_seed, rid)
                o, d, normal, e, r, m, bp = oracle._shade(
                    o, d, seed, b, NEE_TYPE
                )
                np_pdf = (
                    oracle._nee_pdf(o, normal, d, m) if NEE_TYPE != 0 else 0.0
                )
                emis.append(e)
                refl.append(r)
                mis.append(m)
                bsdf.append(bp)
                nee.append(np_pdf)
                valid.append(0.0 if np.all(d == 0) else 1.0)
            radiance = np.zeros(3)
            for b in range(s.num_bounces - 1, -1, -1):
                q = nee[b] * mis[b] + (1.0 - mis[b]) * bsdf[b]
                wgt = bsdf[b] / q if q != 0 else np.nan
                radiance = emis[b] + refl[b] * radiance * wgt * valid[b]
            band[py - y0, px] = radiance
    return y0, band


def main():
    out = os.path.join(REPO, "tests", "golden", "config1_256.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    nproc = min(mp.cpu_count(), 16)
    bands = [(y, min(y + HEIGHT // nproc + 1, HEIGHT))
             for y in range(0, HEIGHT, HEIGHT // nproc + 1)]
    img = np.zeros((HEIGHT, WIDTH, 3), np.float32)
    with mp.Pool(nproc) as pool:
        for y0, band in pool.imap_unordered(_render_rows, bands):
            img[y0 : y0 + band.shape[0]] = band
            print(f"rows {y0}..{y0+band.shape[0]} done", flush=True)
    np.savez_compressed(
        out,
        image=img,
        meta=np.array(
            [WIDTH, HEIGHT, BOUNCES, NEE_TYPE, FRAME], np.int64
        ),
    )
    print(f"wrote {out} (mean {img.mean():.5f})")


if __name__ == "__main__":
    main()
