"""Deployment/serving: StableHLO export artifacts and the shape-bucketed
AOT serving session (no reference equivalent — required by the TPU
compilation model; see export.py / session.py docstrings)."""

from michigan_tpu.serving.export import export_inference, load_exported
from michigan_tpu.serving.session import InferenceSession

__all__ = ["export_inference", "load_exported", "InferenceSession"]
