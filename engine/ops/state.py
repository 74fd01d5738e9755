"""Watermark / offset state store (SURVEY §2.1 S4, §2.9 ST2).

The reference checkpoints a 3-field JSON watermark dict to S3 between batches
(lib/pipeline_controller.py:437-468).  The engine keeps the same contract —
a tiny JSON document, written atomically after each committed batch — behind
a storage interface:

- :class:`LocalJsonStateStore` — file:// (tests, local runs);
- :class:`S3JsonStateStore`    — boto3-backed, same key layout as the
  reference (gated behind an import-try; not exercised in the harness).

In full Structured Streaming mode the Spark checkpoint dir subsumes this
(offsets/commits); this store exists for the batch-incremental
(``Trigger.AvailableNow``-style) runner in :mod:`engine.pipeline`, whose
at-least-once + downstream-dedup semantics mirror the reference (ST2/ST4).
"""

from __future__ import annotations

import json
import os
import tempfile

from engine.schemas import POLLER_STATE_DEFAULTS

__all__ = ["LocalJsonStateStore", "S3JsonStateStore", "default_state"]


def default_state() -> dict:
    """Initial watermark when no checkpoint exists
    (lib/pipeline_controller.py:445-450)."""
    return dict(POLLER_STATE_DEFAULTS)


class LocalJsonStateStore:
    """Atomic JSON state file on a local/NFS path."""

    def __init__(self, path: str):
        self.path = path

    def get(self) -> dict:
        if not os.path.exists(self.path):
            return default_state()
        with open(self.path, encoding="utf-8") as f:
            return json.load(f)

    def set(self, state: dict) -> None:
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(state, f, sort_keys=True)
            os.replace(tmp, self.path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


class S3JsonStateStore:  # pragma: no cover - needs AWS creds/network
    """Same contract on S3 (reference S3Client JSON cache)."""

    def __init__(self, bucket: str, key: str):
        import boto3

        self.bucket, self.key = bucket, key
        self._s3 = boto3.client("s3")

    def get(self) -> dict:
        from botocore.exceptions import ClientError

        try:
            obj = self._s3.get_object(Bucket=self.bucket, Key=self.key)
            return json.loads(obj["Body"].read())
        except ClientError as e:
            if e.response["Error"]["Code"] in ("NoSuchKey", "404"):
                return default_state()
            raise

    def set(self, state: dict) -> None:
        self._s3.put_object(
            Bucket=self.bucket,
            Key=self.key,
            Body=json.dumps(state, sort_keys=True).encode("utf-8"),
        )
