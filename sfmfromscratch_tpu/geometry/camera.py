"""Camera models: intrinsics, projection, reprojection metrics.

Covers the reference's CameraPose projection helpers and EXIF-based intrinsics
construction (SFM.py:307-402). EXIF decoding is host-side I/O and stays in
Python/PIL; everything numeric is jnp and batched.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfmfromscratch_tpu.ops.lie import so3_exp


class SensorType(enum.Enum):
    """Physical camera sensor formats (reference SFM.py:10-19)."""

    MEDIUM_FORMAT = 1
    FULL_FRAME = 2
    CROP_FRAME = 3
    MICRO_FOUR_THIRD = 4
    ONE_INCH = 5
    SMARTPHONE = 6


# (width_mm, height_mm) per sensor format (reference SFM.py:344-364).
SENSOR_DIMS_MM = {
    SensorType.MEDIUM_FORMAT: (53.0, 40.20),
    SensorType.FULL_FRAME: (35.0, 24.0),
    SensorType.CROP_FRAME: (23.6, 15.60),
    SensorType.MICRO_FOUR_THIRD: (17.0, 13.0),
    SensorType.ONE_INCH: (12.80, 9.60),
    SensorType.SMARTPHONE: (6.17, 4.55),
}


def focal_length_from_exif(exif_data) -> Optional[float]:
    """Extract the focal length in mm from an EXIF tag dict, handling both the
    rational-tuple form (num, den) older PIL versions return and the
    IFDRational/float form modern Pillow returns (reference SFM.py:326-342).
    Returns None when no FocalLength tag is present.
    """
    from PIL.ExifTags import TAGS

    for tag_id, value in exif_data.items():
        if TAGS.get(tag_id, tag_id) == "FocalLength":
            return value[0] / value[1] if isinstance(value, tuple) else float(value)
    return None


def intrinsics_from_exif(image_path: str, sensor_type: SensorType) -> np.ndarray:
    """Build the 3x3 intrinsic matrix K from a photo's EXIF focal length and the
    physical sensor size (reference SFM.py:311-374). Host-side (PIL).

    Raises if the file has no EXIF focal length, matching reference behavior
    (SFM.py:336-342).
    """
    from PIL import Image

    with Image.open(image_path) as image:
        width, height = image.size
        exif_data = image._getexif()

    if not exif_data:
        raise ValueError(f"No EXIF data in {image_path}; cannot derive intrinsics")

    focal_length = focal_length_from_exif(exif_data)
    if focal_length is None:
        raise ValueError(f"No EXIF focal length in {image_path}; cannot derive intrinsics")

    sensor_w, sensor_h = SENSOR_DIMS_MM[sensor_type]
    fx = focal_length * width / sensor_w
    fy = focal_length * height / sensor_h
    return np.array(
        [[fx, 0.0, width / 2.0], [0.0, fy, height / 2.0], [0.0, 0.0, 1.0]], dtype=np.float64
    )


def projection_matrix(R: jax.Array, t: jax.Array, K: jax.Array) -> jax.Array:
    """P = K [R | t] for (..., 3, 3) R, (..., 3) t, (..., 3, 3) K
    (reference SFM.py:307-309)."""
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


def project_points(
    points_3d: jax.Array, rvec: jax.Array, t: jax.Array, K: jax.Array
) -> jax.Array:
    """Project (..., N, 3) world points through camera (rvec axis-angle, t, K).

    Replaces reference ``CameraPose.project_point`` (SFM.py:384-392), which
    accepts Rodrigues 3-vectors; batched over points and cameras.
    """
    R = so3_exp(rvec)
    cam = points_3d @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    pix = cam @ jnp.swapaxes(K, -1, -2)
    z = pix[..., 2:3]
    return pix[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)


def project_homogeneous(points_3d: jax.Array, P: jax.Array) -> jax.Array:
    """Project (..., N, 3) points with a (..., 3, 4) projection matrix."""
    Xh = jnp.concatenate([points_3d, jnp.ones_like(points_3d[..., :1])], axis=-1)
    pix = Xh @ jnp.swapaxes(P, -1, -2)
    z = pix[..., 2:3]
    return pix[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)


def reprojection_errors(
    points_3d: jax.Array,
    points_2d: jax.Array,
    rvec: jax.Array,
    t: jax.Array,
    K: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-point pixel errors and their masked mean
    (reference SFM.py:394-402, Runner.py:311-334)."""
    proj = project_points(points_3d, rvec, t, K)
    err = jnp.linalg.norm(proj - points_2d, axis=-1)
    if mask is None:
        return err, jnp.mean(err)
    m = mask.astype(err.dtype)
    mean = jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
    return err, mean


def two_view_reprojection_error(
    p3d: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    P1: jax.Array,
    P2: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean of the per-point average error across the two views
    (reference Util.py:65-82 ``print_reprojection_error``)."""
    e1 = jnp.linalg.norm(project_homogeneous(p3d, P1) - p1, axis=-1)
    e2 = jnp.linalg.norm(project_homogeneous(p3d, P2) - p2, axis=-1)
    per_point = 0.5 * (e1 + e2)
    if mask is None:
        return jnp.mean(per_point)
    m = mask.astype(per_point.dtype)
    return jnp.sum(per_point * m) / jnp.maximum(jnp.sum(m), 1.0)
