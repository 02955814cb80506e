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
