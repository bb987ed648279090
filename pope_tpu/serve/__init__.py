"""Serving surfaces: the reference's browser mask demo (TPU-native) plus an
online continuous-batching pose service the reference lacks."""

from pope_tpu.serve.pose_service import PoseService, make_pose_server
from pope_tpu.serve.web_demo import WebDemo, make_demo_server, run_demo_server

__all__ = [
    "PoseService",
    "make_pose_server",
    "WebDemo",
    "make_demo_server",
    "run_demo_server",
]
