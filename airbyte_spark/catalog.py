"""Stream catalog, type rules, and schema diff.

Re-expresses (from scratch, Spark-first) the reference's catalog layer:

* ``ConfiguredStream`` ≈ Airbyte's ``ConfiguredAirbyteStream``
  (airbyte_protocol.yaml:342-381): stream name, Spark schema, primary-key
  paths, cursor field, sync mode, destination sync mode.
* JSON-schema -> Spark type rules mirror the predicates in the reference's
  ``base-normalization/normalization/transform_catalog/utils.py`` (is_string:19,
  is_number:59, is_big_integer:66, is_long:70, is_boolean:84, is_date:38,
  is_datetime:23-36) — see ``json_type_to_spark``.
* ``diff_schemas`` ≈ ``CatalogHelpers.getStreamDiff`` / ``getFieldDiff``
  (airbyte-protocol/.../CatalogHelpers.java:353-474): add / remove /
  update-type field transforms; renames surface as remove+add unless an
  explicit rename hint pairs them (the reference behaves the same way:
  CatalogHelpers.java:407-415).
* Breaking-change guard ≈ ``CatalogHelpers.transformBreaksConnection``
  (CatalogHelpers.java:455-474): removing or retyping the cursor or a PK
  member raises.

Schemas carry stable per-field ``uid``s (Iceberg-style field ids) so the lake
layer can map old data files onto an evolved schema without rewriting them.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Type rules
# ---------------------------------------------------------------------------

#: Widening priority, mirroring the union-type resolution comment in the
#: reference's stream_processor.py:514 / utils.py:60-89:
#: boolean < integer < number < string (wider scope wins).
_WIDEN_ORDER = [
    T.BooleanType(),
    T.IntegerType(),
    T.LongType(),
    T.DecimalType(38, 0),
    T.DoubleType(),
    T.StringType(),
]


def json_type_to_spark(js: dict) -> T.DataType:
    """Map a JSON-schema property to a Spark type (reference utils.py rules)."""
    jtypes = js.get("type", "string")
    if isinstance(jtypes, str):
        jtypes = [jtypes]
    jtypes = [t for t in jtypes if t != "null"] or ["string"]
    airbyte_type = js.get("airbyte_type")
    fmt = js.get("format")
    jt = jtypes[0] if len(jtypes) == 1 else _widest_json(jtypes)
    if jt == "string":
        if fmt == "date":
            return T.DateType()
        if fmt == "date-time":
            if airbyte_type == "timestamp_without_timezone":
                return T.TimestampNTZType()
            return T.TimestampType()
        return T.StringType()  # includes time-with/without-tz (no Spark time type)
    if jt == "integer":
        if airbyte_type == "big_integer":
            return T.DecimalType(38, 0)
        return T.LongType()
    if jt == "number":
        if airbyte_type == "integer":
            return T.LongType()
        if airbyte_type == "big_integer":
            return T.DecimalType(38, 0)
        return T.DoubleType()
    if jt == "boolean":
        return T.BooleanType()
    if jt == "object":
        props = js.get("properties", {})
        return T.StructType(
            [T.StructField(k, json_type_to_spark(v), True) for k, v in props.items()]
        )
    if jt == "array":
        items = js.get("items", {"type": "string"})
        if isinstance(items, list):
            items = items[0] if items else {"type": "string"}
        return T.ArrayType(json_type_to_spark(items), True)
    return T.StringType()


def _widest_json(jtypes: list[str]) -> str:
    order = ["boolean", "integer", "number", "string"]
    best = None
    for t in jtypes:
        if t in order and (best is None or order.index(t) > order.index(best)):
            best = t
    # a union of only non-scalar members (e.g. ['object','array']) falls
    # back to string like any other unknown type — NOT boolean, which
    # would fail to hold any actual value
    return best or "string"


def is_widening(old: T.DataType, new: T.DataType) -> bool:
    """True when ``old -> new`` moves up the reference's wider-scope
    lattice (int32->int64, long->double, anything->string). NOTE: not
    every step is lossless — see :func:`is_lossless_widening`."""
    if old == new:
        return False
    try:
        io, in_ = _widen_index(old), _widen_index(new)
    except ValueError:
        return False
    return in_ > io


#: lattice steps that LOSE information: doubles hold 53 mantissa bits, so
#: long / decimal(38,0) values beyond 2^53 collapse onto the same double
_LOSSY_STEPS = {
    (T.LongType(), T.DoubleType()),
    (T.DecimalType(38, 0), T.DoubleType()),
}


def is_lossless_widening(old: T.DataType, new: T.DataType) -> bool:
    """A widen that preserves every representable value — the bar a
    primary-key / cursor type change must clear (two distinct 64-bit ids
    >= 2^53 compare EQUAL as doubles, collapsing merge/dedup keys)."""
    return is_widening(old, new) and (old, new) not in _LOSSY_STEPS


def _widen_index(dt: T.DataType) -> int:
    for i, t in enumerate(_WIDEN_ORDER):
        if dt == t:
            return i
    raise ValueError(f"not in widening lattice: {dt}")


# ---------------------------------------------------------------------------
# Catalog dataclasses
# ---------------------------------------------------------------------------

SYNC_MODES = ("full_refresh", "incremental")
DEST_SYNC_MODES = ("append", "overwrite", "append_dedup")


@dataclass
class FieldSpec:
    """A catalog field with a stable uid (Iceberg-style field id)."""

    uid: int
    name: str
    dtype: T.DataType

    def to_json(self) -> dict:
        return {"uid": self.uid, "name": self.name, "type": self.dtype.json()}

    @staticmethod
    def from_json(d: dict) -> "FieldSpec":
        return FieldSpec(d["uid"], d["name"], _parse_dt(d["type"]))


def _parse_dt(j: str) -> T.DataType:
    # DataType.json() == json.dumps(jsonValue()); the inverse is
    # _parse_datatype_json_value on the parsed value.
    return T._parse_datatype_json_value(json.loads(j))


@dataclass
class TableSchema:
    """Versioned schema: ordered fields with uids."""

    fields: list[FieldSpec]
    schema_id: int = 0

    def to_struct(self) -> T.StructType:
        return T.StructType([T.StructField(f.name, f.dtype, True) for f in self.fields])

    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def by_uid(self) -> dict[int, FieldSpec]:
        return {f.uid: f for f in self.fields}

    def by_name(self) -> dict[str, FieldSpec]:
        return {f.name: f for f in self.fields}

    def max_uid(self) -> int:
        return max((f.uid for f in self.fields), default=0)

    def to_json(self) -> dict:
        return {"schema_id": self.schema_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(d: dict) -> "TableSchema":
        return TableSchema(
            [FieldSpec.from_json(f) for f in d["fields"]], schema_id=d["schema_id"]
        )

    @staticmethod
    def from_struct(st: T.StructType, schema_id: int = 0) -> "TableSchema":
        return TableSchema(
            [FieldSpec(i + 1, f.name, f.dataType) for i, f in enumerate(st.fields)],
            schema_id=schema_id,
        )


@dataclass
class ConfiguredStream:
    """≈ ConfiguredAirbyteStream (airbyte_protocol.yaml:342-381)."""

    name: str
    schema: TableSchema
    primary_key: list[str] = field(default_factory=list)
    cursor_field: Optional[str] = None
    sync_mode: str = "incremental"
    destination_sync_mode: str = "append_dedup"
    namespace: Optional[str] = None

    def __post_init__(self) -> None:
        if self.sync_mode not in SYNC_MODES:
            raise ValueError(f"sync_mode must be one of {SYNC_MODES}")
        if self.destination_sync_mode not in DEST_SYNC_MODES:
            raise ValueError(f"destination_sync_mode must be one of {DEST_SYNC_MODES}")


# ---------------------------------------------------------------------------
# Schema diff (≈ CatalogHelpers.getFieldDiff) and evolution planning
# ---------------------------------------------------------------------------


@dataclass
class FieldTransform:
    kind: str  # "add" | "remove" | "widen" | "rename" | "incompatible"
    name: str
    new_name: Optional[str] = None
    old_type: Optional[T.DataType] = None
    new_type: Optional[T.DataType] = None


class BreakingChangeError(ValueError):
    """Raised when a diff removes/retypes the cursor or a PK member
    (≈ CatalogHelpers.transformBreaksConnection, CatalogHelpers.java:455-474)."""


def diff_schemas(
    old: TableSchema,
    new_struct: T.StructType,
    primary_key: list[str] = (),
    cursor_field: Optional[str] = None,
    rename_hints: Optional[dict[str, str]] = None,
) -> list[FieldTransform]:
    """Diff ``old`` against a desired struct; returns ordered transforms.

    Mirrors CatalogHelpers.java:388-428: per-field add / remove / update-type.
    A (remove X, add Y) pair listed in ``rename_hints`` ({old: new}) collapses
    into a single rename transform (the reference leaves them as remove+add;
    we support both behaviours — hints are opt-in).
    """
    rename_hints = rename_hints or {}
    old_by_name = old.by_name()
    new_names = {f.name for f in new_struct.fields}
    transforms: list[FieldTransform] = []

    protected = set(primary_key) | ({cursor_field} if cursor_field else set())

    for f in new_struct.fields:
        if f.name not in old_by_name:
            src = next((o for o, n in rename_hints.items() if n == f.name), None)
            if src is not None and src in old_by_name and src not in new_names:
                if src in protected:
                    # covers the incompatible-rename form too: a pk/cursor
                    # field changing name (and possibly type) is breaking
                    raise BreakingChangeError(
                        f"rename of pk/cursor field '{src}' breaks the stream"
                    )
                ofs = old_by_name[src]
                if ofs.dtype != f.dataType and not is_widening(ofs.dtype, f.dataType):
                    transforms.append(
                        FieldTransform("incompatible", src, f.name, ofs.dtype, f.dataType)
                    )
                else:
                    transforms.append(
                        FieldTransform("rename", src, f.name, ofs.dtype, f.dataType)
                    )
            else:
                transforms.append(FieldTransform("add", f.name, new_type=f.dataType))
        else:
            ofs = old_by_name[f.name]
            if ofs.dtype != f.dataType:
                widen = is_widening(ofs.dtype, f.dataType)
                # LOSSLESS widens of pk/cursor are fine (FIXTURES.md E3
                # widens the pk member turn_idx); anything lossy on them
                # breaks — including lattice steps like long->double that
                # collapse distinct ids beyond 2^53 onto one key
                if f.name in protected and not is_lossless_widening(
                    ofs.dtype, f.dataType
                ):
                    raise BreakingChangeError(
                        f"type change of pk/cursor field '{f.name}' "
                        f"({ofs.dtype.simpleString()} -> {f.dataType.simpleString()}) "
                        "breaks the stream"
                    )
                kind = "widen" if widen else "incompatible"
                transforms.append(
                    FieldTransform(kind, f.name, old_type=ofs.dtype, new_type=f.dataType)
                )

    # sources consumed by a hint — as a clean rename OR an incompatible
    # rename (kind='incompatible' with a new_name) — must not ALSO emit a
    # phantom remove (which would wrongly raise for pk fields and report
    # the column as dropped to diff consumers)
    renamed_srcs = {
        t.name
        for t in transforms
        if t.kind == "rename"
        or (t.kind == "incompatible" and t.new_name is not None)
    }
    for f in old.fields:
        if f.name not in new_names and f.name not in renamed_srcs:
            if f.name in protected:
                raise BreakingChangeError(
                    f"removal of pk/cursor field '{f.name}' breaks the stream"
                )
            transforms.append(FieldTransform("remove", f.name, old_type=f.dtype))
    return transforms


def apply_transforms(old: TableSchema, transforms: list[FieldTransform]) -> TableSchema:
    """Produce the evolved TableSchema: renames/widens keep the field uid
    (so old data files remain readable), adds mint new uids, removes drop
    the field from the current schema (old files still carry the data;
    readers simply stop projecting it)."""
    incompat = [t for t in transforms if t.kind == "incompatible"]
    if incompat:
        t = incompat[0]
        raise ValueError(
            f"incompatible type change for '{t.name}': "
            f"{t.old_type.simpleString()} -> {t.new_type.simpleString()}"
        )
    fields = [FieldSpec(f.uid, f.name, f.dtype) for f in old.fields]
    next_uid = old.max_uid() + 1
    by_name = {f.name: f for f in fields}
    for t in transforms:
        if t.kind == "add":
            fields.append(FieldSpec(next_uid, t.name, t.new_type))
            next_uid += 1
        elif t.kind == "widen":
            by_name[t.name].dtype = t.new_type
        elif t.kind == "rename":
            fs = by_name.pop(t.name)
            fs.name = t.new_name
            if t.new_type is not None:
                fs.dtype = t.new_type
            by_name[t.new_name] = fs
        elif t.kind == "remove":
            fields = [f for f in fields if f.name != t.name]
            by_name.pop(t.name, None)
    return TableSchema(fields, schema_id=old.schema_id + 1)
