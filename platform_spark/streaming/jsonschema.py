"""JSON-Schema → topic schema inference (S8 companion).

The reference's Iceberg sink derives its per-topic columns from a
JSON-Schema document fetched from a registry (iceberg-processor
internal/sink/iceberg.go:714-828): `properties` supplies the column names,
each property's `type` (a string, or a list whose first non-"null" entry
wins — jsonSchemaType, iceberg.go:763-777) maps via
integer→long / number→double / boolean / string (mapJSONType,
iceberg.go:779-791), unknown types are skipped, `required` marks
non-nullable columns, and the result is sorted by name
(columnsFromSchemaBytes, iceberg.go:793-828).

This module reproduces that contract Spark-side and extends it with the
two temporal types the reference's Iceberg layer itself supports
(icebergTypeForColumn, iceberg.go:830-852): a string property with
`"format": "date-time"` maps to timestamp and `"format": "date"` to date.

Three consumers:
- `struct_from_json_schema` → a Spark `StructType` (the Iceberg/parquet
  table shape, nullable = not required);
- `topic_config_from_json_schema` → a `TopicConfig` whose schema-on-read
  columns extract `$.{name}` from `_value` (so DESCRIBE and KAFSQL see the
  registry-declared columns);
- `load_registry_schema` → the file-based analogue of
  columnsFromRegistry's `{base_url}/{topic}.json` fetch.

Evolution composes with `iceberg.evolution_violations`: re-deriving from a
changed schema doc and diffing against the live table enforces the same
widening-only contract (added columns OK, narrowing rejected).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from platform_spark.topics import SchemaColumn, TopicConfig

#: JSON-Schema primitive → engine schema-type (mapJSONType iceberg.go:779)
_JSON_TYPE_MAP = {
    "integer": "long",
    "number": "double",
    "boolean": "boolean",
    "string": "string",
}

#: string-format refinements (icebergTypeForColumn supports timestamp/date)
_STRING_FORMAT_MAP = {
    "date-time": "timestamp",
    "date": "date",
}

#: engine schema-type → Spark type (struct_from_json_schema)
_SPARK_TYPES = {
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}


def _json_schema_type(raw: object) -> str:
    """The effective `type` of one property: a plain string, or the first
    non-"null" entry of a type list (jsonSchemaType, iceberg.go:763-777)."""
    if not isinstance(raw, dict):
        return ""
    t = raw.get("type")
    if isinstance(t, str):
        return t
    if isinstance(t, list):
        for entry in t:
            if isinstance(entry, str) and entry != "null":
                return entry
    return ""


def columns_from_json_schema(doc: dict | str) -> list[tuple[str, str, bool]]:
    """[(name, engine_type, required)] sorted by name; unmappable
    properties are skipped (columnsFromSchemaBytes, iceberg.go:793-828)."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    props = doc.get("properties")
    if not isinstance(props, dict):
        props = {}
    required = {n for n in doc.get("required", []) if isinstance(n, str)}
    out: list[tuple[str, str, bool]] = []
    for name, raw in props.items():
        jt = _json_schema_type(raw).lower()
        mapped = _JSON_TYPE_MAP.get(jt)
        if mapped == "string":
            fmt = raw.get("format") if isinstance(raw, dict) else None
            mapped = _STRING_FORMAT_MAP.get(fmt, "string")
        if mapped is None:
            continue
        out.append((name, mapped, name in required))
    out.sort(key=lambda c: c[0])
    return out


def struct_from_json_schema(doc: dict | str) -> T.StructType:
    """The derived table shape: one field per mapped property, nullable
    unless listed in `required`."""
    return T.StructType(
        [
            T.StructField(name, _SPARK_TYPES[typ], nullable=not req)
            for name, typ, req in columns_from_json_schema(doc)
        ]
    )


def topic_config_from_json_schema(topic: str, doc: dict | str) -> TopicConfig:
    """A TopicConfig whose schema-on-read columns extract `$.{name}` from
    the JSON `_value` — the registry-declared shape becomes queryable
    through DESCRIBE and KAFSQL exactly like a YAML-declared one.

    `date` columns extract as timestamp (SchemaColumn's cast surface) —
    the date-ness lives in the derived StructType for the sink side.

    Property names that are not dot-path-safe identifiers (e.g.
    `"order-id"`) are SKIPPED here, same stance as unmappable types — the
    engine's JSON dot-path subset can't address them. They still appear in
    `struct_from_json_schema` (StructType allows any name).
    """
    import re

    ident = re.compile(r"^[A-Za-z0-9_]+$")
    cols = []
    for name, typ, _req in columns_from_json_schema(doc):
        if not ident.match(name):
            continue
        cols.append(
            SchemaColumn(
                name=name,
                type="timestamp" if typ == "date" else typ,
                path=f"$.{name}",
            )
        )
    return TopicConfig(topic, tuple(cols))


def load_registry_schema(base_dir: str, topic: str) -> dict:
    """File-registry analogue of columnsFromRegistry (iceberg.go:727-761):
    the schema doc for a topic lives at `{base_dir}/{topic}.json`. Raises
    FileNotFoundError / ValueError loudly — the reference also fails the
    sink rather than guessing a schema."""
    path = os.path.join(base_dir, f"{topic}.json")
    with open(path) as f:
        doc = json.load(f)
    if not columns_from_json_schema(doc):
        raise ValueError(f"no columns resolved from schema doc for topic {topic!r}")
    return doc
