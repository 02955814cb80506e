"""P8 — nested-object/array unnesting into child tables.

Re-expresses the reference's recursive child StreamProcessors
(stream_processor.py:347-384 find_children_streams, :1451-1470
unnesting_*, macros/cross_db_utils/array.sql `cross_join_unnest`):
an array column becomes a child table whose primary key is the parent's
surrogate hash id (P7) plus the element position.

Spark-first: ``posexplode`` is the lateral unnest; the child table is just
another DataFrame. No recursion machinery needed — callers compose
``unnest_array`` per nested level.

Scale: explode is a map-side operator (no shuffle); the child table
inherits the parent's partitioning, so a follow-up join back to the parent
on the hashid is co-partitioned if both are bucketed by the same key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import surrogate_hash_id


def unnest_array(
    parent: DataFrame,
    array_col: Column,
    parent_pk: Sequence[str],
    element_alias: str = "element",
    keep_cols: Optional[Sequence[str]] = None,
    hashid_col: str = "_parent_hashid",
) -> DataFrame:
    """Explode `array_col` into a child table keyed by (parent hashid, pos).

    Mirrors the reference's child-table contract: child pk = parent hash id
    (md5 over the parent's pks, stream_processor.py:667-696) + element index.
    """
    withid = surrogate_hash_id(parent, parent_pk, hashid_col)
    keep = list(keep_cols or parent_pk)
    return withid.select(
        F.col(hashid_col),
        *keep,
        F.posexplode(array_col).alias("pos", element_alias),
    ).withColumn("pos", F.col("pos").cast("long"))


def unnest_json_array(
    parent: DataFrame,
    json_col: str,
    json_path: str,
    element_type: str,
    parent_pk: Sequence[str],
    element_alias: str = "element",
) -> DataFrame:
    """Unnest an array buried inside a JSON-blob column (ab1-model shape):
    from_json the path, then explode. element_type is a DDL string like
    'string' or 'struct<a:int,b:string>'."""
    arr = F.from_json(
        F.get_json_object(F.col(json_col), json_path), f"array<{element_type}>"
    )
    return unnest_array(parent, arr, parent_pk, element_alias=element_alias)
