"""Checkpoint / lineage / metrics for resumable pipelines."""

from .checkpoint import StageRunner, stage_fingerprint

__all__ = ["StageRunner", "stage_fingerprint"]
