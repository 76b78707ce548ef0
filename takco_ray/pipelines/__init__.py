"""End-to-end pipelines."""

from .er import ERConfig, er_pipeline

__all__ = ["ERConfig", "er_pipeline"]
