"""Geometry: affine crop algebra, camera intrinsics updates, pose/rotation math,
and epipolar geometry. Pure jax.numpy (jit-safe) with numpy host twins where
the reference does host-side math.

Reference parity: utils/data_utils.py (crop/K update), utils/base_utils.py
(projection, pose algebra), src/utils/metrics.py (pose errors).
"""

from pope_tpu.geometry.affine import (
    get_affine_transform,
    get_affine_transform_np,
    warp_affine,
    get_image_crop_resize,
    get_K_crop_resize,
    compact_box,
    clamped_scale_box,
)
from pope_tpu.geometry.pose import (
    project_points,
    pose_inverse,
    pose_compose,
    relative_pose,
    rotation_angle_deg,
    translation_angle_deg,
    relative_pose_error,
    geodesic_distance,
    quat_to_matrix,
    o6d_to_matrix,
    matrix_to_quat,
    skew,
)
from pope_tpu.geometry.epipolar import (
    compute_symmetric_epipolar_errors,
    essential_from_Rt,
    sampson_distance,
    symmetric_epipolar_distance,
    triangulate_midpoint,
)
