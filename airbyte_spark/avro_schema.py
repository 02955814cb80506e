"""StructType -> Avro schema conversion (K6).

The reference converts each stream's JSON schema to an Avro schema when
writing Avro/Parquet object-store destinations
(``base-java-s3/.../avro/JsonToAvroSchemaConverter.java``): every field
becomes a ``["null", type]`` union (:228-307), date/time/timestamp map to
Avro logical types (:229-241), record/field names are standardized to
Avro's identifier alphabet with the original->standardized mapping kept
(:135-180), and the Airbyte meta fields are prepended — ``_airbyte_ab_id``
as a uuid-logical string and ``_airbyte_emitted_at`` as
timestamp-millis (AvroConstants / getAvroSchema :114-166).

Here the typed StructType IS the stream schema (catalog.json_type_to_spark
already applied the JSON-schema rules), so this converter maps Spark types
to Avro. Output is a plain JSON-able dict — no avro library needed to
emit; Spark's own ``to_avro/from_avro`` (spark-avro) or any Avro writer
can consume it as-is.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import types as T

AVRO_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _standardize(name: str) -> str:
    """Avro identifier alphabet (JsonToAvroSchemaConverter:135-141):
    illegal characters fold to '_', a leading digit gains a '_' prefix."""
    std = re.sub(r"[^A-Za-z0-9_]", "_", name)
    if re.match(r"^[0-9]", std):
        std = "_" + std
    return std


def _scalar(dtype: T.DataType) -> object:
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dtype, T.LongType):
        return "long"
    if isinstance(dtype, T.FloatType):
        return "float"
    if isinstance(dtype, T.DoubleType):
        return "double"
    if isinstance(dtype, T.BinaryType):
        return "bytes"
    if isinstance(dtype, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dtype, T.TimestampType):
        # reference emits timestamp-micros for date-time fields (:230-240)
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dtype, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dtype, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dtype.precision,
            "scale": dtype.scale,
        }
    return None


class AvroSchemaConverter:
    """Tracks the original->standardized name mapping across one conversion
    (getStandardizedNames, JsonToAvroSchemaConverter:106-108)."""

    def __init__(self) -> None:
        self.standardized_names: dict[str, str] = {}

    def _name(self, raw: str) -> str:
        std = _standardize(raw)
        if std != raw:
            self.standardized_names[raw] = std
        return std

    def _field_type(self, dtype: T.DataType, path: str) -> object:
        scalar = _scalar(dtype)
        if scalar is not None:
            return scalar
        if isinstance(dtype, T.ArrayType):
            # array items are themselves nullable unions (:254-277)
            return {
                "type": "array",
                "items": ["null", self._field_type(dtype.elementType, path + "_items")],
            }
        if isinstance(dtype, T.StructType):
            return self._record(dtype, path)
        if isinstance(dtype, T.MapType):
            if not isinstance(dtype.valueType, T.StringType):
                raise ValueError(f"unsupported avro map value type at {path}")
            return {"type": "map", "values": ["null", "string"]}
        raise ValueError(f"unsupported avro conversion for {dtype} at {path}")

    def _record(self, struct: T.StructType, name: str,
                namespace: Optional[str] = None) -> dict:
        fields = []
        for f in struct.fields:
            fields.append(
                {
                    "name": self._name(f.name),
                    # every field nullable, null FIRST so the default
                    # applies (:228 union convention)
                    "type": ["null", self._field_type(f.dataType, f"{name}_{_standardize(f.name)}")],
                    "default": None,
                }
            )
        rec: dict = {"type": "record", "name": self._name(name), "fields": fields}
        if namespace:
            rec["namespace"] = _standardize(namespace)
        return rec


def struct_to_avro_schema(
    struct: T.StructType,
    name: str,
    namespace: Optional[str] = None,
    add_airbyte_fields: bool = True,
) -> tuple[dict, dict[str, str]]:
    """Convert a stream's StructType to an Avro record schema.

    Returns ``(schema_dict, standardized_names)`` — the second element is
    the original->standardized rename map the reference logs and keeps for
    writers (:106-108, :135-180). With ``add_airbyte_fields`` the Airbyte
    meta columns are PREPENDED exactly as getAvroSchema does (:142-157):
    ``_airbyte_ab_id`` (uuid string) and ``_airbyte_emitted_at``
    (timestamp-millis).
    """
    conv = AvroSchemaConverter()
    rec = conv._record(struct, name, namespace)
    if add_airbyte_fields:
        meta = [
            {
                "name": "_airbyte_ab_id",
                "type": {"type": "string", "logicalType": "uuid"},
            },
            {
                "name": "_airbyte_emitted_at",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
        ]
        rec["fields"] = meta + rec["fields"]
    return rec, conv.standardized_names
