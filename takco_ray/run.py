"""CLI: run a TOML-configured pipeline — ``python -m takco_ray.run cfg.toml``.

Mirrors the reference's config-driven entry point (``takco run -C config
pipeline.toml``, ``takco/__main__.py:87-191`` + ``takco/__init__.py:604-742``)
with the same shape: a ``[pipeline]`` table naming stages and kwargs, a
workdir for per-stage checkpoints, and skip-on-valid-cache resume. On a real
cluster the identical invocation runs under ``ray job submit -- python -m
takco_ray.run cfg.toml``.

Example config::

    corpus = "/data/files"          # parquet dir of (repo,path,commit,lang,content)
    workdir = "/data/ckpt"          # optional: enables resume
    output = "/data/clusters"       # labels parquet dir

    [er]                            # ERConfig overrides
    threshold = 0.65
    num_bands = 16

This script OWNS the Ray session only when run as __main__ (guarded init).
"""

from __future__ import annotations

import json
import sys
import tomllib


def run_config(path: str) -> dict:
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    if "stage" in cfg:
        # generic [[stage]] pipeline (registry.py): compose dedup / textstats
        # / ANN / ER stages from config with per-stage checkpoints
        from .pipelines.registry import run_pipeline

        return run_pipeline(cfg)["metrics"]
    from .pipelines.er import ERConfig, er_pipeline

    er_kwargs = cfg.get("er", {})
    if "scorer_concurrency" in er_kwargs and isinstance(
        er_kwargs["scorer_concurrency"], list
    ):
        er_kwargs["scorer_concurrency"] = tuple(er_kwargs["scorer_concurrency"])
    result = er_pipeline(
        cfg["corpus"],
        ERConfig(**er_kwargs),
        checkpoint_root=cfg.get("workdir"),
    )
    out = cfg.get("output")
    if out:
        # overwrite: a resumed run must REPLACE the label output, not append
        # a second copy next to the previous run's files
        result["labels"].write_parquet(out, mode="overwrite")
    return result["metrics"]


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        metrics = run_config(sys.argv[1])
        print(json.dumps(metrics, indent=2, sort_keys=True, default=str))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
