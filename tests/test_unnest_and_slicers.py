"""P8 recursive unnest (reference find_children_streams /
test_nested_streams semantics) and the S9 list/substream slicers."""

import hashlib

from pyspark.sql import functions as F

from airbyte_spark.operators.unnest import unnest_children
from airbyte_spark.sources.declarative import (
    list_sliced_read,
    substream_sliced_read,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_unnest_children_walks_two_level_tree(spark):
    """Array of structs containing arrays (the reference's nested-streams
    catalog shape): the full child-table tree is emitted, struct fields
    flatten, consumed arrays are dropped, and pks chain hashid -> pos."""
    rows = [
        (1, [([ "a", "b"], 0), (["c"], 1)]),
        (2, [([], 0)]),
        (3, []),
    ]
    df = spark.createDataFrame(
        [(d, [{"words": w, "s_idx": i} for (w, i) in arr]) for d, arr in rows],
        "doc_id long, sents array<struct<words:array<string>, s_idx:int>>",
    )
    tables = unnest_children(df, ["doc_id"], stream_name="doc")
    assert set(tables) == {"doc_sents", "doc_sents_words"}

    child = tables["doc_sents"]
    # struct flattened into columns; the nested array became its own table
    assert set(child.columns) == {"_doc_hashid", "pos", "s_idx"}
    got = {(r._doc_hashid, r.pos, r.s_idx) for r in child.collect()}
    h1, h2 = _md5("1"), _md5("2")
    assert got == {(h1, 0, 0), (h1, 1, 1), (h2, 0, 0)}  # doc 3: no rows

    grand = tables["doc_sents_words"]
    assert set(grand.columns) == {"_doc_sents_hashid", "pos", "element"}
    got2 = {(r._doc_sents_hashid, r.pos, r.element) for r in grand.collect()}
    assert got2 == {
        (_md5(f"{h1}-0"), 0, "a"),
        (_md5(f"{h1}-0"), 1, "b"),
        (_md5(f"{h1}-1"), 0, "c"),
    }
    # referential integrity: every grandchild links to an existing child pk
    child_keys = {_md5(f"{h}-{p}") for (h, p, _) in got}
    assert {x[0] for x in got2} <= child_keys


def test_unnest_children_three_levels_and_scalar_arrays(spark):
    """Depth is unbounded (objects-in-arrays-in-objects): a 3-deep nest of
    plain arrays produces the full chain with one table per level."""
    df = spark.createDataFrame(
        [(7, [[["x", "y"]], [["z"]]])],
        "k long, outer array<array<array<string>>>",
    )
    tables = unnest_children(df, ["k"], stream_name="t")
    assert set(tables) == {
        "t_outer", "t_outer_element", "t_outer_element_element"
    }
    leaf = tables["t_outer_element_element"]
    vals = sorted(r.element for r in leaf.collect())
    assert vals == ["x", "y", "z"]
    # chained pk: md5(md5(md5(k)-pos)-pos)
    h = _md5(_md5(_md5("7") + "-0") + "-0")
    assert {r._t_outer_element_hashid for r in leaf.collect()} >= {h}


def test_unnest_children_struct_field_collisions(spark):
    """A struct element field named `pos` (or shadowing the parent hashid
    column) must not silently duplicate the pk columns: it is renamed with
    a `_` prefix until unique, and the recursive pk chain stays intact
    (round-3 advisor fix, reference name-collision resolution)."""
    df = spark.createDataFrame(
        [(1, [{"pos": "P", "_pos": "Q", "v": 5}])],
        "k long, items array<struct<pos:string,_pos:string,v:long>>",
    )
    tables = unnest_children(df, ["k"], stream_name="s")
    child = tables["s_items"]
    # no duplicate names; `pos` stays the explode index (long), the struct's
    # own `pos` lands as `__pos` (since `_pos` is a real field)
    assert len(child.columns) == len(set(child.columns))
    assert set(child.columns) == {"_s_hashid", "pos", "__pos", "_pos", "v"}
    row = child.collect()[0]
    assert (row["pos"], row["__pos"], row["_pos"], row["v"]) == (0, "P", "Q", 5)
    assert row._s_hashid == _md5("1")

    # collision two levels deep: grandchild hashid chains off the RENAMED
    # columns without ambiguity
    df2 = spark.createDataFrame(
        [(2, [{"pos": "X", "inner": [10, 20]}])],
        "k long, items array<struct<pos:string,inner:array<long>>>",
    )
    t2 = unnest_children(df2, ["k"], stream_name="s")
    assert set(t2) == {"s_items", "s_items_inner"}
    leaf = sorted(t2["s_items_inner"].collect(), key=lambda r: r.pos)
    assert [r.element for r in leaf] == [10, 20]
    h = _md5(_md5("2") + "-0")
    assert {r._s_items_hashid for r in leaf} == {h}


def test_list_slicer_pushes_predicate(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "click"), (2, "view"), (3, "error"), (4, "click")],
        "id long, event_type string",
    )
    df.write.parquet(str(tmp_path / "e"))
    e = spark.read.parquet(str(tmp_path / "e"))
    sliced = list_sliced_read(e, "event_type", ["click", "view"])
    got = sorted((r.id, r.slice_value) for r in sliced.collect())
    assert got == [(1, "click"), (2, "view"), (4, "click")]
    # the IN-predicate reaches the parquet scan, not a post-filter only
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "In(event_type" in plan


def test_substream_slicer_broadcasts_parent_keys(spark):
    parent = spark.createDataFrame(
        [(10, "F"), (11, "O"), (12, "F")], "okey long, status string"
    ).filter(F.col("status") == "F")
    child = spark.createDataFrame(
        [(10, 1.0), (10, 2.0), (11, 3.0), (12, 4.0), (99, 5.0)],
        "fk long, amount double",
    )
    sliced = substream_sliced_read(child, parent, "okey", "fk")
    got = sorted((r.parent_slice, r.amount) for r in sliced.collect())
    assert got == [(10, 1.0), (10, 2.0), (12, 4.0)]  # 11 filtered, 99 orphan
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # child side stays map-only


def test_unnest_array_rejects_colliding_keep_cols(spark):
    """A kept/carried column named like posexplode's outputs ('pos', the
    element alias) or the hashid must fail fast with the actionable name
    instead of an AMBIGUOUS_REFERENCE downstream."""
    import pytest
    from pyspark.sql import functions as F

    from airbyte_spark.operators.unnest import unnest_array

    df = spark.createDataFrame(
        [("k1", 3, ["a", "b"])], "id string, pos long, tags array<string>"
    )
    with pytest.raises(ValueError, match="pos"):
        unnest_array(df, F.col("tags"), ["id"], keep_cols=["pos"])


def test_datetime_slicer_sub_day_granularity(spark):
    """Hourly slices must stay distinct (a to_date wrap collapsed all 24
    hourly slices of a day into one label)."""
    import datetime

    from airbyte_spark.sources.declarative import sliced_read

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 30)),
        (2, datetime.datetime(2024, 1, 1, 5, 10)),
        (3, datetime.datetime(2024, 1, 1, 5, 40)),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz")
    out = sliced_read(df, "ts", granularity="hour")
    slices = {r["id"]: r["slice_start"] for r in out.collect()}
    assert slices[2] == slices[3] and slices[1] != slices[2]
    # day granularity keeps the DATE-typed label
    out_d = sliced_read(df, "ts", granularity="day")
    assert dict(out_d.dtypes)["slice_start"] == "date"


def test_extract_json_fields_empty_keep_projects_only_extracted(spark):
    from airbyte_spark.sources.declarative import extract_json_fields

    df = spark.createDataFrame([('{"a": 1}', "noise")], "payload string, junk string")
    out = extract_json_fields(df, "payload", {"a": "$.a"}, keep=[])
    assert out.columns == ["a"]


def test_with_salt_deterministic_without_cursor_columns(spark):
    """The salt fallback must be a pure function of row content so a
    replayed batch partitions (and on ties, picks) identically —
    monotonically_increasing_id depends on task layout."""
    from airbyte_spark.operators.skew import with_salt

    df = spark.createDataFrame(
        [(i, f"v{i % 7}") for i in range(50)], "k long, v string"
    )
    a = {(r["k"], r["v"]): r["_salt"] for r in with_salt(df, 8).collect()}
    b = {
        (r["k"], r["v"]): r["_salt"]
        for r in with_salt(df.repartition(13), 8).collect()
    }
    assert a == b  # same rows -> same salts, whatever the partition layout
