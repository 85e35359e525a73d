"""Image I/O with the reference's iio semantics.

``iio_read_image_float_split`` returns planar float32 channels with values in
the file's native range (0..255 for 8-bit PNG); we reproduce that with PIL /
imageio. ``rgb_to_gray`` matches ``energy_model.cpp:45-54`` /
``global_faldoi.cpp:1820-1827`` (ITU-R 601 luma, computed in float64 then
stored as float32, exactly like the C double-promoted expression).
"""

from __future__ import annotations

import numpy as np

try:  # imageio is in the base image; PIL is its backend
    import imageio.v3 as iio
except Exception:  # pragma: no cover
    iio = None
from PIL import Image


def read_image_split(path: str) -> np.ndarray:
    """Read an image as float32 planar channels, shape (pd, h, w)."""
    if path.endswith(".flo"):
        from faldoi_tpu.io.flo import read_flo

        f = read_flo(path)
        return np.ascontiguousarray(f.transpose(2, 0, 1)).astype(np.float32)
    if path.endswith((".tif", ".tiff")) and iio is not None:
        arr = np.asarray(iio.imread(path)).astype(np.float32)
    else:
        arr = np.asarray(Image.open(path)).astype(np.float32)
    if arr.ndim == 2:
        return arr[None]
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def read_image_gray(path: str) -> np.ndarray:
    """Read an image and collapse to grayscale (h, w) with ITU-R 601 luma."""
    planes = read_image_split(path)
    if planes.shape[0] == 1:
        return planes[0]
    return rgb_to_gray(planes)


def rgb_to_gray(planes: np.ndarray) -> np.ndarray:
    """(pd, h, w) planar RGB(A) -> (h, w) gray. Matches energy_model.cpp:45-54.

    The C code computes ``.299*r + .587*g + .114*b`` with double literals, so
    the accumulation happens in float64 before the float32 store; we do the
    same to stay bit-close.
    """
    r = planes[0].astype(np.float64)
    g = planes[1].astype(np.float64)
    b = planes[2].astype(np.float64)
    return (0.299 * r + 0.587 * g + 0.114 * b).astype(np.float32)


def save_image_float(path: str, img: np.ndarray) -> None:
    """Save a float image (single channel TIFF, used for the energy map)."""
    img = np.asarray(img, dtype=np.float32)
    if iio is not None and path.endswith((".tif", ".tiff")):
        iio.imwrite(path, img)
    elif path.endswith(".flo"):
        raise ValueError("use write_flo for .flo files")
    else:
        Image.fromarray(img).save(path)


def save_image_int(path: str, img: np.ndarray) -> None:
    """Save an int image (occlusion masks as PNG; matches iio_save_image_int)."""
    arr = np.asarray(img)
    arr = arr.astype(np.uint8) if arr.max(initial=0) <= 255 else arr.astype(np.int32)
    Image.fromarray(arr).save(path)
