"""Screenshot output (reference interactive_rendering.rs:1676-1714 +
game_world.rs:303-339: copy to host, clamp, auto-numbered PNG)."""

from __future__ import annotations

import os

import numpy as np


def to_srgb_bytes(img: np.ndarray) -> np.ndarray:
    """HDR float image -> clamped 8-bit (the reference's swapchain is UNORM:
    values clamp at 1.0 on store; no tone mapping, postprocess.rs:66)."""
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(to_srgb_bytes(img), "RGB").save(path)


def next_screenshot_path(directory: str = "screenshots") -> str:
    """Auto-numbering scheme of the reference (game_world.rs:310-327)."""
    os.makedirs(directory, exist_ok=True)
    next_idx = 0
    for name in os.listdir(directory):
        stem, ext = os.path.splitext(name)
        if ext.lower() == ".png":
            stem = stem.removeprefix("screenshot")
            if stem.isdigit():
                next_idx = max(next_idx, int(stem) + 1)
    return os.path.join(directory, f"{next_idx}.png")
