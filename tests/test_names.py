"""Identifier canonicalization + collision registry (P6).

Expected values mirror the reference's unit tests
(unit_tests/test_destination_name_transformer.py: standard-naming and
Postgres middle-truncation tables) — behavioral parity, own implementation.
"""

import pytest
from pyspark.sql import functions as F

from airbyte_spark.functions.names import (
    NameRegistry,
    canonicalize_identifier,
    canonicalize_identifier_udf,
    resolve_collisions,
    standard_name,
    truncate_middle,
)


@pytest.mark.parametrize(
    "raw, expected",
    [
        ("__identifier_name", "__identifier_name"),
        ("IDENTIFIER_NAME", "IDENTIFIER_NAME"),
        ("123identifier_name", "123identifier_name"),
        (",identifier+name", "_identifier_name"),
        ("identifiêr name", "identifier_name"),
        ("a_unicode_name_文", "a_unicode_name__"),
        ("identifier__name__", "identifier__name__"),
        ("identifier-name.weee", "identifier_name_weee"),
        ('"identifier name"', "_identifier_name_"),
        ("identifier name", "identifier_name"),
        ("identifier%", "identifier_"),
        ("`identifier`", "_identifier_"),
    ],
)
def test_standard_name(raw, expected):
    assert standard_name(raw) == expected


@pytest.mark.parametrize(
    "raw, expected",
    [
        # below / at / over the Postgres-43 limit (reference truncation table)
        ("Aaaa_Bbbb_Cccc_Dddd_Eeee_Ffff_Gggg_Hhhh", "Aaaa_Bbbb_Cccc_Dddd_Eeee_Ffff_Gggg_Hhhh"),
        ("Aaaa_Bbbb_Cccc_Dddd_Eeee_Ffff_Gggg_Hhhh_Iii", "Aaaa_Bbbb_Cccc_Dddd_Eeee_Ffff_Gggg_Hhhh_Iii"),
        ("Aaaa_Bbbb_Cccc_Dddd_Eeee_Ffff_Gggg_Hhhh_Iiii", "Aaaa_Bbbb_Cccc_Dddd___e_Ffff_Gggg_Hhhh_Iiii"),
        (
            "Aaaa_Bbbb_Cccc_Dddd_Eeee_a_very_long_name_Ffff_Gggg_Hhhh_Iiii",
            "Aaaa_Bbbb_Cccc_Dddd___e_Ffff_Gggg_Hhhh_Iiii",
        ),
        (
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ_abcdefghijklmnopqrstuvwxyz_0123456789",
            "ABCDEFGHIJKLMNOPQRST__qrstuvwxyz_0123456789",
        ),
    ],
)
def test_truncate_middle_postgres_limit(raw, expected):
    assert truncate_middle(raw, 43) == expected


def test_canonicalize_full_chain():
    assert canonicalize_identifier("  Récord Tÿpe #1 ") == "record_type__1"
    # leading digit guard
    assert canonicalize_identifier("123 go") == "_123_go"
    # upper-casing family (Snowflake-style)
    assert canonicalize_identifier("Hello World", casing="upper") == "HELLO_WORLD"


def test_registry_collisions_and_idempotence():
    reg = NameRegistry()
    assert reg.register("Field") == "field"
    assert reg.register("field") == "field_1"  # case-insensitive collision
    assert reg.register("FIELD") == "field_2"
    assert reg.register("Field") == "field"  # idempotent re-register
    assert reg.register("fiéld") == "field_3"  # accent-folded collision
    assert reg.mapping()["FIELD"] == "field_2"


def test_bulk_resolve_matches_registry(spark):
    raws = ["User Name", "user_name", "USER  NAME", "other"]
    reg = NameRegistry()
    expected = [reg.register(r) for r in raws]

    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(raws)], ["ord", "raw_name"]
    ).withColumn("canon", canonicalize_identifier_udf()(F.col("raw_name")))
    out = {
        r.raw_name: r.resolved
        for r in resolve_collisions(df, "canon", "ord").collect()
    }
    assert [out[r] for r in raws] == expected


def test_resolve_collisions_generated_suffix_vs_existing_name(spark):
    """A generated _n suffix colliding with a PRE-EXISTING canonical name
    (['a','a','a_1'] -> 'a_1' twice) must re-resolve to a unique set, like
    NameRegistry's retry loop."""
    from airbyte_spark.functions.names import resolve_collisions

    df = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a_1", 2)], "canon string, ord long"
    )
    out = resolve_collisions(df, "canon", "ord")
    names = sorted(r["resolved"] for r in out.collect())
    assert len(set(names)) == 3
    assert names == ["a", "a_1", "a_1_1"]
