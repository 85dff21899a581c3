"""Image output helpers (PNG encode of RGBA u8 frames).

The reference encodes PNGs with the Rust ``image`` crate
(src/lib.rs:330-333, src/terrain/mod.rs:487-490). Here the native
vulkan-forge core (see vulkan_forge._native) encodes PNGs in C++ when
available, with a Pillow fallback; either way output is a deterministic
function of the pixel bytes.
"""
from __future__ import annotations

import numpy as np


def save_png_rgba(path: str, img: np.ndarray) -> None:
    """Write an (H, W, 4) uint8 RGBA array as a PNG file."""
    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim != 3 or img.shape[2] != 4:
        raise RuntimeError("Invalid image buffer")
    try:
        from ._native import png_encode_rgba
        data = png_encode_rgba(img)
        if data is not None:
            with open(path, "wb") as f:
                f.write(data)
            return
    except Exception:
        pass
    from PIL import Image
    Image.fromarray(img, "RGBA").save(path)
