"""Layered run configuration (SURVEY §2.1 S9).

The reference loads ``config/{environment}.yaml`` then overlays environment
variables (main.py:12 via its utils package).  Engine equivalent: YAML file →
env-var overlay (env wins), returned as a flat dict feeding
:class:`engine.pipeline.PipelineConfig` and the Spark conf.
"""

from __future__ import annotations

import os

__all__ = ["load_config"]


def load_config(
    yaml_path: str | None = None,
    *,
    env_prefix: str = "ENGINE_",
    defaults: dict | None = None,
) -> dict:
    """defaults < YAML < environment (highest).  Env keys are matched by
    stripping ``env_prefix`` and lowercasing (ENGINE_BATCH_SIZE → batch_size);
    numeric strings are coerced."""
    cfg: dict = dict(defaults or {})
    if yaml_path and os.path.exists(yaml_path):
        try:
            import yaml  # gated: not guaranteed in every image

            with open(yaml_path, encoding="utf-8") as f:
                loaded = yaml.safe_load(f) or {}
            if not isinstance(loaded, dict):
                raise ValueError(f"{yaml_path} must contain a mapping")
            cfg.update(loaded)
        except ImportError:  # pragma: no cover
            pass
    for key, val in os.environ.items():
        if key.startswith(env_prefix):
            name = key[len(env_prefix) :].lower()
            if val.isdigit():
                cfg[name] = int(val)
            else:
                try:
                    cfg[name] = float(val)
                except ValueError:
                    cfg[name] = val
    return cfg
