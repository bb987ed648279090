"""pope_tpu — TPU-native promptable object pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of karltan0328/POPE
(zero-shot 6-DoF object pose estimation from a single reference image):

- ``pope_tpu.geometry``  — affine crop/intrinsics algebra, pose/rotation math,
  epipolar geometry (reference: utils/data_utils.py, utils/base_utils.py).
- ``pope_tpu.ops``       — Pallas TPU kernels + XLA ops: flash/linear attention,
  dual-softmax correlation, NMS, image warps/resizes.
- ``pope_tpu.models``    — flax model families: LoFTR-style matcher, DINOv2 ViT,
  SAM (encoder/prompt/decoder + automatic mask generation), pose regressors.
- ``pope_tpu.solver``    — batched on-chip RANSAC essential-matrix solver +
  pose recovery (reference: src/utils/metrics.py:estimate_pose).
- ``pope_tpu.pipeline``  — the composed segment→retrieve→match→solve program
  (reference: pope_model_api.py + eval_*_json.py drivers).
- ``pope_tpu.parallel``  — device mesh / sharding helpers (pjit-based).
- ``pope_tpu.eval``      — manifest-driven evaluators and metric aggregation.

Everything compute-heavy runs inside ``jax.jit`` with static shapes; variable-
size quantities (mask counts, match counts) are fixed-capacity masked tensors.
"""

__version__ = "0.1.0"
