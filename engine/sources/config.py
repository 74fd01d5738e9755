"""Layered run configuration (SURVEY §2.1 S9).

The reference loads ``config/{environment}.yaml`` then overlays environment
variables (main.py:12 via its utils package).  Its YAML carries two
sections — ``PLAINTEXT_VARIABLES`` and ``ENCRYPTED_VARIABLES``
(config/devel.yaml:2-33), the latter KMS-decrypted at load time.  Engine
equivalent: YAML file (flat, or the two-section layout) → decrypt hook for
the encrypted section (boto3 KMS in production, any injected callable in
tests) → env-var overlay (env wins), returned as a flat dict feeding
:class:`engine.pipeline.PipelineConfig` and the Spark conf.
"""

from __future__ import annotations

import os
from typing import Callable

__all__ = ["load_config", "kms_decryptor"]


def kms_decryptor(region: str):  # pragma: no cover - needs boto3 + AWS
    """Production decrypt hook: base64 ciphertext → KMS Decrypt → utf-8
    plaintext (the reference's config loader semantics).  Import-gated:
    construct only where boto3 exists."""
    import base64

    import boto3

    client = boto3.client("kms", region_name=region)

    def decrypt(ciphertext_b64: str) -> str:
        blob = base64.b64decode(ciphertext_b64)
        return client.decrypt(CiphertextBlob=blob)["Plaintext"].decode("utf-8")

    return decrypt


def _coerce(val):
    if isinstance(val, str):
        if val.isdigit():
            return int(val)
        try:
            return float(val)
        except ValueError:
            return val
    return val


def load_config(
    yaml_path: str | None = None,
    *,
    env_prefix: str = "ENGINE_",
    defaults: dict | None = None,
    decrypt: Callable[[str], str] | None = None,
) -> dict:
    """defaults < YAML < environment (highest).  Env keys are matched by
    stripping ``env_prefix`` and lowercasing (ENGINE_BATCH_SIZE → batch_size);
    numeric strings are coerced.

    A YAML containing ``PLAINTEXT_VARIABLES`` / ``ENCRYPTED_VARIABLES``
    sections is treated as the reference layout: plaintext merges directly;
    every encrypted value is passed through ``decrypt`` (raises ValueError
    when the section is present but no decryptor was injected — secrets must
    never flow through as ciphertext).  A flat YAML mapping keeps the
    original behavior."""
    cfg: dict = dict(defaults or {})
    if yaml_path and os.path.exists(yaml_path):
        # the except gates ONLY the yaml import — a decrypt hook that lazily
        # imports boto3 must fail loudly, never be swallowed into a config
        # with silently-missing secrets
        try:
            import yaml  # gated: not guaranteed in every image
        except ImportError:  # pragma: no cover
            yaml = None
        if yaml is not None:
            with open(yaml_path, encoding="utf-8") as f:
                loaded = yaml.safe_load(f) or {}
            if not isinstance(loaded, dict):
                raise ValueError(f"{yaml_path} must contain a mapping")
            if "PLAINTEXT_VARIABLES" in loaded or "ENCRYPTED_VARIABLES" in loaded:
                plain = loaded.get("PLAINTEXT_VARIABLES") or {}
                enc = loaded.get("ENCRYPTED_VARIABLES") or {}
                if not isinstance(plain, dict) or not isinstance(enc, dict):
                    raise ValueError(
                        f"{yaml_path}: PLAINTEXT/ENCRYPTED_VARIABLES must be mappings"
                    )
                # mixed layouts keep their other top-level keys (flat merge)
                cfg.update(
                    {
                        k: v
                        for k, v in loaded.items()
                        if k not in ("PLAINTEXT_VARIABLES", "ENCRYPTED_VARIABLES")
                    }
                )
                cfg.update(plain)
                if enc:
                    if decrypt is None:
                        raise ValueError(
                            f"{yaml_path} has ENCRYPTED_VARIABLES but no decrypt "
                            "hook was provided (pass decrypt=kms_decryptor(region) "
                            "or an injected callable)"
                        )
                    for key, ciphertext in enc.items():
                        cfg[key] = decrypt(ciphertext)
            else:
                cfg.update(loaded)
    for key, val in os.environ.items():
        if key.startswith(env_prefix):
            name = key[len(env_prefix) :].lower()
            cfg[name] = _coerce(val)
    return cfg
