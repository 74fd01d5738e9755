"""Avro schema-registry fetch + startup compatibility guard (SURVEY §1.3).

The reference fetches its sink schema from a registry URL when the
controller is constructed (lib/pipeline_controller.py:59, the
``PATRON_INFO_SCHEMA_URL`` env var) — so a drifted contract fails the run
at STARTUP, before any batch is scanned, encoded, or half-emitted.  Engine
equivalent: :func:`fetch_avro_schema` (transport-injected, like every other
external call in this engine) + :func:`check_schema_compat`, which verifies
the registry schema field-by-field against the declared Spark StructType
and raises :class:`SchemaDriftError` naming every mismatch.

``engine.app.make_avro_kinesis_sink`` runs the guard when given a
``schema_source`` — construction-time, mirroring the reference's
constructor fetch.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)

__all__ = ["SchemaDriftError", "fetch_avro_schema", "check_schema_compat"]


class SchemaDriftError(ValueError):
    """Registry schema and declared sink StructType disagree."""


def _default_transport(url: str) -> str:  # pragma: no cover - network
    from urllib.request import urlopen

    with urlopen(url, timeout=10) as resp:
        return resp.read().decode("utf-8")


def fetch_avro_schema(
    url: str, *, transport: Callable[[str], str] | None = None
) -> dict:
    """Fetch and parse the registry's Avro schema.

    ``transport`` is the injected fetcher (tests pass a stub; production
    uses the urllib default).  Accepts either a raw Avro record schema or
    the conventional registry envelope ``{"data": {"schema": "<json>"}}``
    where the schema itself is a JSON-encoded string (the shape the
    reference's utils client unwraps).
    """
    body = (transport or _default_transport)(url)
    doc = json.loads(body)
    if isinstance(doc, dict) and "data" in doc and isinstance(doc["data"], dict):
        inner = doc["data"].get("schema")
        if inner is None:
            raise SchemaDriftError(f"registry envelope from {url} has no data.schema")
        doc = json.loads(inner) if isinstance(inner, str) else inner
    if not isinstance(doc, dict) or doc.get("type") != "record":
        raise SchemaDriftError(f"registry response from {url} is not an Avro record schema")
    return doc


#: Spark type → acceptable Avro primitive names (widening int→long and
#: float→double is wire-compatible for this encoder; narrowing is not).
_COMPAT: dict[type[DataType], tuple[str, ...]] = {
    StringType: ("string",),
    LongType: ("long",),
    IntegerType: ("int", "long"),
    DoubleType: ("double",),
    FloatType: ("float", "double"),
    BooleanType: ("boolean",),
    BinaryType: ("bytes",),
}


def _branches(avro_type: Any) -> tuple[set[str], bool]:
    """(non-null primitive branches, nullable?) of a field type."""
    if isinstance(avro_type, list):
        names = {t if isinstance(t, str) else str(t) for t in avro_type}
        return names - {"null"}, "null" in names
    return {avro_type if isinstance(avro_type, str) else str(avro_type)}, False


def check_schema_compat(avro_schema: dict, struct: StructType) -> None:
    """Startup guard: every declared StructType field must exist in the
    registry schema with a compatible primitive type, in the same order
    (Avro binary has no field tags — order IS the wire format), and the
    registry must not carry extra fields the engine would fail to encode.
    Raises :class:`SchemaDriftError` listing ALL problems at once."""
    fields = avro_schema.get("fields")
    if not isinstance(fields, list):
        raise SchemaDriftError("avro schema has no fields list")
    reg = [(f.get("name"), f.get("type")) for f in fields]
    problems: list[str] = []
    reg_names = [n for n, _ in reg]
    decl_names = [f.name for f in struct.fields]
    for name in decl_names:
        if name not in reg_names:
            problems.append(f"declared field {name!r} missing from registry schema")
    for name in reg_names:
        if name not in decl_names:
            problems.append(f"registry field {name!r} not in declared sink schema")
    shared = [n for n in decl_names if n in reg_names]
    if [n for n in reg_names if n in decl_names] != shared:
        problems.append(
            f"field order differs: declared {decl_names} vs registry {reg_names}"
        )
    reg_types = dict(reg)
    for f in struct.fields:
        if f.name not in reg_types:
            continue
        branches, nullable = _branches(reg_types[f.name])
        allowed = _COMPAT.get(type(f.dataType))
        if allowed is None:
            problems.append(
                f"field {f.name!r}: engine type {f.dataType.simpleString()} "
                "has no Avro mapping"
            )
            continue
        if not branches <= set(allowed):
            problems.append(
                f"field {f.name!r}: registry type {sorted(branches)} "
                f"incompatible with declared {f.dataType.simpleString()}"
            )
        if f.nullable and not nullable:
            problems.append(
                f"field {f.name!r}: declared nullable but registry union has no null"
            )
    if problems:
        raise SchemaDriftError(
            "sink schema drift (registry vs declared):\n  - " + "\n  - ".join(problems)
        )
