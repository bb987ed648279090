"""The composed POPE pipeline: segment -> retrieve -> match -> solve.

Reference behavior: pope_model_api.py (model registry/loading, crop tool,
box-IoU recall) + the eval driver loop (eval_linemod_json.py:41-188).
"""

from pope_tpu.pipeline.api import PopeModels, load_models
from pope_tpu.pipeline.pose_pipeline import (
    PairResult,
    PipelineExecutor,
    retrieve_top_k,
    match_and_score,
    estimate_pair,
)
