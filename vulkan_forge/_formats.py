"""Color transfer functions and u8 packing.

The reference renders into Rgba8UnormSrgb targets: fragment shaders output
linear color and the hardware applies the piecewise sRGB encode on store; the
colormap LUT texture is decoded sRGB->linear on sample. This module is the
single source of truth for those curves, in both NumPy (host/goldens) and
jax.numpy (device) flavors.

Curves are the exact 2.4-gamma piecewise sRGB transfer (the same math the
reference uses on the CPU in src/colormap/mod.rs:59-79), with u8 quantization
``floor(x*255 + 0.5)`` matching the reference's ``(x*255.0 + 0.5) as u8``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def srgb_decode_np(c: np.ndarray) -> np.ndarray:
    """sRGB-encoded [0,1] -> linear [0,1] (float32, exact piecewise curve)."""
    c = np.asarray(c, dtype=np.float32)
    lo = c / np.float32(12.92)
    hi = ((c + np.float32(0.055)) / np.float32(1.055)) ** np.float32(2.4)
    return np.where(c <= np.float32(0.04045), lo, hi).astype(np.float32)


def srgb_encode_np(c: np.ndarray) -> np.ndarray:
    """Linear [0,1] -> sRGB-encoded [0,1] (float32)."""
    c = np.clip(np.asarray(c, dtype=np.float32), 0.0, 1.0)
    lo = c * np.float32(12.92)
    hi = np.float32(1.055) * (c ** np.float32(1.0 / 2.4)) - np.float32(0.055)
    return np.where(c <= np.float32(0.0031308), lo, hi).astype(np.float32)


def to_u8_np(x: np.ndarray) -> np.ndarray:
    """[0,1] float -> u8 with round-half-up (floor(x*255+0.5))."""
    x = np.clip(np.asarray(x, dtype=np.float32), 0.0, 1.0)
    return np.floor(x * np.float32(255.0) + np.float32(0.5)).astype(np.uint8)


def srgb_encode_u8_np(linear: np.ndarray) -> np.ndarray:
    return to_u8_np(srgb_encode_np(linear))


def srgb_decode(c):
    """jnp: sRGB-encoded [0,1] -> linear [0,1]."""
    c = jnp.asarray(c, dtype=jnp.float32)
    lo = c / 12.92
    hi = ((c + 0.055) / 1.055) ** 2.4
    return jnp.where(c <= 0.04045, lo, hi)


def srgb_encode(c):
    """jnp: linear [0,1] -> sRGB-encoded [0,1]."""
    c = jnp.clip(jnp.asarray(c, dtype=jnp.float32), 0.0, 1.0)
    lo = c * 12.92
    # Guard pow against 0^negative-exponent intermediates under autodiff/XLA.
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def to_u8(x):
    """jnp: [0,1] float -> u8 with round-half-up."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.floor(x * 255.0 + 0.5).astype(jnp.uint8)


def pack_rgba_u32(r, g, b, a):
    """Pack four [0,1] float channels into little-endian RGBA u32 words.

    A (H,W) uint32 image viewed as bytes is exactly the (H,W,4) u8 RGBA
    layout the reference returns (src/lib.rs:305-308), so the device writes
    one aligned 32-bit lane per pixel instead of four 8-bit stores.
    """
    ri = jnp.floor(jnp.clip(r, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint32)
    gi = jnp.floor(jnp.clip(g, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint32)
    bi = jnp.floor(jnp.clip(b, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint32)
    ai = jnp.floor(jnp.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint32)
    return ri | (gi << 8) | (bi << 16) | (ai << 24)


def u32_image_to_rgba_u8(img_u32: np.ndarray) -> np.ndarray:
    """(H,W) uint32 -> (H,W,4) uint8 view copy (little-endian RGBA)."""
    img_u32 = np.ascontiguousarray(np.asarray(img_u32, dtype=np.uint32))
    return img_u32.view(np.uint8).reshape(*img_u32.shape, 4)
