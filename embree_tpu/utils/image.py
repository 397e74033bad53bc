"""Image I/O + comparison.

Role parity with the reference image layer (tutorials/common/image/: PPM/PFM
/TGA/EXR load+store; compareToReferenceImage tutorial.cpp:646-658). EXR is
replaced by float-native .pfm / .npz (no tinyexr in this stack); PNG via PIL
for human viewing.
"""
from __future__ import annotations

import numpy as np


def save_ppm(path: str, img):
    """img: (H, W, 3) float [0,1] or uint8."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0, 1) * 255 + 0.5).astype(np.uint8)
    h, w = a.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(a[..., :3].tobytes())


def load_ppm(path: str):
    with open(path, "rb") as f:
        magic = f.readline().strip()
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        f.readline()
        data = np.frombuffer(f.read(), np.uint8)
    if magic == b"P6":
        return data.reshape(h, w, 3)
    return data.reshape(h, w)


def save_pfm(path: str, img):
    """Float image (H, W, 3) -> PFM (the float-native golden format)."""
    a = np.asarray(img, np.float32)
    h, w = a.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.0\n" % (w, h))
        f.write(a[::-1].tobytes())  # PFM is bottom-up


def load_pfm(path: str):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    return data.reshape(h, w, 3)[::-1].copy()


def save_png(path: str, img):
    from PIL import Image
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0, 1) * 255 + 0.5).astype(np.uint8)
    Image.fromarray(a).save(path)


def compare_images(img, ref, threshold: float = 0.1) -> int:
    """Count 'completely wrong' pixels (reference comparison semantics,
    tutorial.cpp:646-658: error ~ number of pixels differing beyond a
    tolerance; CTest passes when below a per-test pixel budget)."""
    a = np.asarray(img, np.float32)
    b = np.asarray(ref, np.float32)
    if a.dtype == np.uint8 or a.max() > 1.5:
        a = a / 255.0
    if b.dtype == np.uint8 or b.max() > 1.5:
        b = b / 255.0
    err = np.abs(a - b).max(axis=-1)
    return int((err > threshold).sum())
