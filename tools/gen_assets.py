"""Generate the default asset pack: blocks.json + 16x16 PNG textures.

The reference ships hand-made PNGs under assets/ with the schema defined in
src/game_system/block.rs:32-58 (per block, per face: reflectivity /
emissivity / metallicity texture paths).  This engine keeps the schema
byte-compatible but generates its own textures procedurally (deterministic,
seeded) so the repository is self-contained.

Run:  python tools/gen_assets.py [assets_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

S = 16
FACES = ["left", "right", "down", "up", "back", "front"]


def save(path: str, rgba: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = Image.fromarray(np.clip(rgba * 255.0, 0, 255).astype(np.uint8), "RGBA")
    img.save(path)


def flat(rgb, alpha=1.0) -> np.ndarray:
    a = np.empty((S, S, 4), np.float32)
    a[..., :3] = rgb
    a[..., 3] = alpha
    return a


def speckle(rs, base, amount=0.08, alpha=1.0) -> np.ndarray:
    n = rs.uniform(-amount, amount, size=(S, S, 1))
    a = flat(base, alpha)
    a[..., :3] = np.clip(a[..., :3] + n, 0.0, 1.0)
    return a


def bordered(inner, border, alpha_inner=1.0, alpha_border=1.0) -> np.ndarray:
    a = flat(inner, alpha_inner)
    a[0, :, :3] = border
    a[-1, :, :3] = border
    a[:, 0, :3] = border
    a[:, -1, :3] = border
    a[0, :, 3] = alpha_border
    a[-1, :, 3] = alpha_border
    a[:, 0, 3] = alpha_border
    a[:, -1, 3] = alpha_border
    return a


def main(root: str) -> None:
    rs = np.random.RandomState(2026)

    save(os.path.join(root, "black.png"), flat([0.0, 0.0, 0.0]))
    save(os.path.join(root, "white.png"), flat([1.0, 1.0, 1.0]))

    grass_top = speckle(rs, [0.13, 0.55, 0.13])
    grass_side = speckle(rs, [0.45, 0.33, 0.18])
    grass_side[:5, :, :3] = grass_top[:5, :, :3]  # grassy fringe on top rows
    soil = speckle(rs, [0.42, 0.30, 0.17])
    stone = speckle(rs, [0.48, 0.48, 0.50], amount=0.06)
    lamp_reflect = flat([0.85, 0.82, 0.70])
    lamp_emit = flat([1.0, 0.95, 0.80])
    glass = bordered([0.85, 0.93, 0.95], [0.75, 0.85, 0.88],
                     alpha_inner=0.1, alpha_border=1.0)

    # texturetest: distinct hue per face for orientation debugging
    hues = {
        "left": [1.0, 0.2, 0.2],
        "right": [0.2, 1.0, 0.2],
        "down": [0.2, 0.2, 1.0],
        "up": [1.0, 1.0, 0.2],
        "back": [1.0, 0.2, 1.0],
        "front": [0.2, 1.0, 1.0],
    }

    per_face_textures = {}

    def tex(name, face, kind, img):
        rel = f"./blocks/{name}/{face}.{kind}.png"
        save(os.path.join(root, rel[2:]), img)
        return rel

    def block(name, solid, translucent, luminescent, face_imgs):
        faces = {}
        for face in FACES:
            refl, emit, metal = face_imgs(face)
            entry = {}
            entry["reflectivity"] = (
                tex(name, face, "reflectivity", refl) if isinstance(refl, np.ndarray) else refl
            )
            entry["emissivity"] = (
                tex(name, face, "emissivity", emit) if isinstance(emit, np.ndarray) else emit
            )
            entry["metallicity"] = (
                tex(name, face, "metallicity", metal) if isinstance(metal, np.ndarray) else metal
            )
            faces[face] = entry
        d = {"solid": solid, "translucent": translucent, "luminescent": luminescent}
        d.update(faces)
        return d

    blocks = {
        "texturetest": block(
            "texturetest", True, True, False,
            lambda f: (flat(hues[f]), "./black.png", "./black.png"),
        ),
        "grass": block(
            "grass", True, False, False,
            lambda f: (
                grass_top if f == "up" else (soil if f == "down" else grass_side),
                "./black.png", "./black.png",
            ),
        ),
        "soil": block(
            "soil", True, False, False,
            lambda f: (soil, "./black.png", "./black.png"),
        ),
        "stone": block(
            "stone", True, False, False,
            lambda f: (stone, "./black.png", "./black.png"),
        ),
        "lamp": block(
            "lamp", True, False, True,
            lambda f: (lamp_reflect, lamp_emit, "./black.png"),
        ),
        "glass": block(
            "glass", True, True, False,
            lambda f: (glass, "./black.png", "./black.png"),
        ),
        "mirror": block(
            "mirror", True, False, False,
            lambda f: ("./white.png", "./black.png", "./white.png"),
        ),
    }

    with open(os.path.join(root, "blocks.json"), "w") as f:
        json.dump({"blocks": blocks}, f, indent=4)
    print(f"wrote assets to {root}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"))
