from pyspark.sql import types as T

import pytest

from airbyte_spark.catalog import (
    BreakingChangeError,
    TableSchema,
    apply_transforms,
    diff_schemas,
    is_widening,
    json_type_to_spark,
)


def test_json_type_rules():
    # mirrors reference utils.py predicates
    assert json_type_to_spark({"type": "string"}) == T.StringType()
    assert json_type_to_spark({"type": "number"}) == T.DoubleType()
    assert json_type_to_spark({"type": "integer"}) == T.LongType()
    assert json_type_to_spark(
        {"type": "number", "airbyte_type": "integer"}
    ) == T.LongType()
    assert json_type_to_spark(
        {"type": "integer", "airbyte_type": "big_integer"}
    ) == T.DecimalType(38, 0)
    assert json_type_to_spark({"type": "boolean"}) == T.BooleanType()
    assert json_type_to_spark({"type": "string", "format": "date"}) == T.DateType()
    assert (
        json_type_to_spark({"type": "string", "format": "date-time"})
        == T.TimestampType()
    )
    assert json_type_to_spark(
        {
            "type": "string",
            "format": "date-time",
            "airbyte_type": "timestamp_without_timezone",
        }
    ) == T.TimestampNTZType()
    # union widening: boolean < integer < number < string
    assert json_type_to_spark({"type": ["null", "integer", "number"]}) == T.DoubleType()
    assert json_type_to_spark({"type": ["boolean", "string"]}) == T.StringType()
    # nested
    st = json_type_to_spark(
        {"type": "object", "properties": {"a": {"type": "integer"}}}
    )
    assert st == T.StructType([T.StructField("a", T.LongType(), True)])
    at = json_type_to_spark({"type": "array", "items": {"type": "number"}})
    assert at == T.ArrayType(T.DoubleType(), True)


def test_widening_lattice():
    assert is_widening(T.IntegerType(), T.LongType())
    assert is_widening(T.LongType(), T.DoubleType())
    assert is_widening(T.LongType(), T.StringType())
    assert not is_widening(T.LongType(), T.IntegerType())
    assert not is_widening(T.StringType(), T.LongType())


def _base_schema():
    return TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("tool", T.StringType()),
            ]
        )
    )


def test_diff_add_widen_rename_remove():
    old = _base_schema()
    new = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),  # widen
            T.StructField("tool_name", T.StringType()),  # rename (hinted)
            T.StructField("tool_version", T.StringType()),  # add
        ]
    )
    ts = diff_schemas(
        old, new, primary_key=["conv_id"], rename_hints={"tool": "tool_name"}
    )
    kinds = {(t.kind, t.name) for t in ts}
    assert ("widen", "turn_idx") in kinds
    assert ("rename", "tool") in kinds
    assert ("add", "tool_version") in kinds

    evolved = apply_transforms(old, ts)
    assert evolved.schema_id == 1
    by_name = evolved.by_name()
    # uids stable across rename/widen; add mints a fresh uid
    assert by_name["tool_name"].uid == old.by_name()["tool"].uid
    assert by_name["turn_idx"].uid == old.by_name()["turn_idx"].uid
    assert by_name["turn_idx"].dtype == T.LongType()
    assert by_name["tool_version"].uid == old.max_uid() + 1


def test_rename_without_hint_is_remove_plus_add():
    # the reference's behaviour: CatalogHelpers.java:407-415
    old = _base_schema()
    new = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("tool_name", T.StringType()),
        ]
    )
    ts = diff_schemas(old, new)
    kinds = sorted((t.kind, t.name) for t in ts)
    assert kinds == [("add", "tool_name"), ("remove", "tool")]


def test_breaking_changes_rejected():
    old = _base_schema()
    # removing a PK member breaks (CatalogHelpers.java:455-474)
    new = T.StructType([T.StructField("conv_id", T.StringType())])
    with pytest.raises(BreakingChangeError):
        diff_schemas(old, new, primary_key=["conv_id", "turn_idx"])
    # losslessly widening the cursor is allowed (FIXTURES.md E3)
    new2 = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),
            T.StructField("tool", T.StringType()),
        ]
    )
    ts = diff_schemas(old, new2, primary_key=["conv_id"], cursor_field="turn_idx")
    assert [(t.kind, t.name) for t in ts] == [("widen", "turn_idx")]
    # a LOSSY retype of a pk member breaks
    new3 = T.StructType(
        [
            T.StructField("conv_id", T.LongType()),  # string -> long: lossy
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("tool", T.StringType()),
        ]
    )
    with pytest.raises(BreakingChangeError):
        diff_schemas(old, new3, primary_key=["conv_id"])


def test_schema_json_roundtrip():
    old = _base_schema()
    rt = TableSchema.from_json(old.to_json())
    assert rt.to_struct() == old.to_struct()
    assert [f.uid for f in rt.fields] == [f.uid for f in old.fields]


def test_lossy_widen_of_pk_rejected():
    """long->double and decimal(38,0)->double are lattice widens but LOSSY
    (doubles hold 53 mantissa bits — distinct ids >= 2^53 collapse onto one
    key); a pk/cursor type change must clear the LOSSLESS bar."""
    from airbyte_spark.catalog import is_lossless_widening

    assert is_lossless_widening(T.IntegerType(), T.LongType())
    assert is_lossless_widening(T.IntegerType(), T.DoubleType())  # 2^31 < 2^53
    assert not is_lossless_widening(T.LongType(), T.DoubleType())
    assert not is_lossless_widening(T.DecimalType(38, 0), T.DoubleType())

    old = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.LongType()),
            ]
        )
    )
    target = T.StructType(
        [
            T.StructField("id", T.DoubleType()),
            T.StructField("v", T.LongType()),
        ]
    )
    with pytest.raises(BreakingChangeError):
        diff_schemas(old, target, primary_key=["id"])
    # the same lossy widen on a NON-key field is still allowed (type-compat
    # evolution), reported as a widen
    target2 = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    (t,) = diff_schemas(old, target2, primary_key=["id"])
    assert t.kind == "widen" and t.name == "v"


def test_container_union_falls_back_to_string():
    """A JSON type union of only non-scalar members maps to StringType
    (the unknown-type fallback), never BooleanType."""
    assert json_type_to_spark({"type": ["object", "array"]}) == T.StringType()
    assert json_type_to_spark({"type": ["null", "integer"]}) == T.LongType()


def test_incompatible_rename_consumes_source():
    """A hinted rename with an incompatible type change must emit ONE
    incompatible transform — not also a phantom remove of the source (and,
    for pk sources, it must raise like any other pk rename)."""
    old = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("a", T.DoubleType()),
            ]
        )
    )
    target = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("b", T.LongType()),  # a -> b, double -> long (lossy)
        ]
    )
    ts = diff_schemas(old, target, primary_key=["k"], rename_hints={"a": "b"})
    assert [t.kind for t in ts] == ["incompatible"]
    assert ts[0].name == "a" and ts[0].new_name == "b"

    with pytest.raises(BreakingChangeError):
        diff_schemas(
            old, T.StructType(
                [
                    T.StructField("k2", T.LongType()),
                    T.StructField("a", T.DoubleType()),
                ]
            ),
            primary_key=["k"], rename_hints={"k": "k2"},
        )
