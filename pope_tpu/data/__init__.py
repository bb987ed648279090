"""Input pipeline: threaded host-side prefetch with device double-buffering
(replaces the reference's CUDA-stream data_prefetcher, pose/pose_utils.py:
99-155) and the native IO runtime bindings."""

from pope_tpu.data.loader import DevicePrefetcher, ThreadedLoader
