"""Pose solving: batched essential-matrix RANSAC with cheirality-based pose
recovery, fully on-chip (replaces the reference's cv2.findEssentialMat /
cv2.recoverPose host round-trip, src/utils/metrics.py:69-94)."""

from pope_tpu.solver.ransac import RansacResult, estimate_pose_ransac, recover_pose_from_E
from pope_tpu.solver.umeyama import umeyama_alignment, kabsch
