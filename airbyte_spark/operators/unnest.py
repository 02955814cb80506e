"""P8 — nested-object/array unnesting into child tables.

Re-expresses the reference's recursive child StreamProcessors
(stream_processor.py:347-384 find_children_streams, :1451-1470
unnesting_*, macros/cross_db_utils/array.sql `cross_join_unnest`):
an array column becomes a child table whose primary key is the parent's
surrogate hash id (P7) plus the element position.

Spark-first: ``posexplode`` is the lateral unnest; the child table is just
another DataFrame. ``unnest_array`` is one level; ``unnest_children`` is
the catalog-driven recursion — it walks the whole nested schema the way
``find_children_streams`` walks the JSON-schema tree and emits the
complete child-table set, however deep (objects-in-arrays-in-objects).

Scale: explode is a map-side operator (no shuffle); the child table
inherits the parent's partitioning, so a follow-up join back to the parent
on the hashid is co-partitioned if both are bucketed by the same key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    # keep_cols=[] means "keep nothing" (the recursive walk relies on it:
    # a level-2 parent pk contains `pos`, which would collide with
    # posexplode's own `pos` output) — only None defaults to parent_pk
    keep = list(parent_pk if keep_cols is None else keep_cols)
    clash = {c for c in keep if c in ("pos", element_alias, hashid_col)}
    if clash:
        # a kept/carried column named like posexplode's outputs (or the
        # hashid) would emit duplicate columns and fail downstream with
        # AMBIGUOUS_REFERENCE — fail fast with the actionable name instead
        raise ValueError(
            f"keep/carry column(s) {sorted(clash)} collide with the child-"
            f"table columns ('pos', {element_alias!r}, {hashid_col!r}); "
            "rename the source column or pass a different alias"
        )
    return withid.select(
        F.col(hashid_col),
        *keep,
        F.posexplode(array_col).alias("pos", element_alias),
    ).withColumn("pos", F.col("pos").cast("long"))


def unnest_children(
    parent: DataFrame,
    parent_pk: Sequence[str],
    stream_name: str = "root",
    carry_cols: Sequence[str] = (),
) -> dict[str, DataFrame]:
    """Catalog-driven RECURSIVE unnest — the reference's
    ``find_children_streams`` analog (stream_processor.py:347-384): walk
    the parent's schema tree and emit one child table per nested array at
    ANY depth, named ``<parent_stream>_<field>``.

    Contract per level (mirrors the reference's child-stream pk chain):

    * child pk = ``(_<parent_stream>_hashid, pos)`` where the hashid is
      the parent's surrogate key (md5 over ITS pk — stream_processor.py:
      667-696), so grandchild hashids chain: ``md5(child_hashid || '-' ||
      pos)``.
    * struct elements flatten into child columns (the reference's json
      re-extract); array elements recurse into their own child tables;
      a consumed array column is dropped from the table that carried it.
    * ``carry_cols`` (e.g. the CDC cursor) are copied onto every child at
      every depth — they ride along for sink-side merge ordering and never
      join the pk chain.

    Every level is a ``posexplode`` — map-side, no shuffle; the whole
    child-table tree materializes from ONE scan of the parent per branch.
    """
    return unnest_children_with_specs(
        parent, parent_pk, stream_name, carry_cols
    )[0]


def unnest_children_with_specs(
    parent: DataFrame,
    parent_pk: Sequence[str],
    stream_name: str = "root",
    carry_cols: Sequence[str] = (),
) -> tuple[dict[str, DataFrame], list[dict]]:
    """``unnest_children`` plus the stream catalog: one spec per child
    stream, in parent-before-child order —
    ``{"name", "parent", "hashid_col", "pk"}`` where ``hashid_col`` is the
    parent-link column inside the child and ``pk = [hashid_col, "pos"]``.
    The sink side (lake.children) drives per-child LakeTable bootstrap and
    cascading merge off these specs."""
    out: dict[str, DataFrame] = {}
    specs: list[dict] = []
    hashid_col = f"_{stream_name}_hashid"
    carry = [c for c in carry_cols if c in parent.columns]
    for f in parent.schema.fields:
        if not isinstance(f.dataType, T.ArrayType) or f.name in carry:
            continue
        child_name = f"{stream_name}_{f.name}"
        child = unnest_array(
            parent,
            F.col(f.name),
            parent_pk,
            element_alias="element",
            keep_cols=carry,
            hashid_col=hashid_col,
        )
        if isinstance(f.dataType.elementType, T.StructType):
            # flatten struct fields, resolving collisions with the pk /
            # carried columns the way the reference resolves json-name
            # collisions (stream_processor.py name conflicts): a struct
            # field named `pos` (or shadowing the hashid or a carried
            # column) is prefixed with `_` until unique, so the recursive
            # pk chain never goes ambiguous
            elem_fields = f.dataType.elementType.fields
            reserved = {hashid_col, "pos", *carry}
            taken = reserved | {g.name for g in elem_fields}
            cols = [F.col(hashid_col), F.col("pos")] + [F.col(c) for c in carry]
            for g in elem_fields:
                safe = g.name
                if safe in reserved:
                    while safe in taken:
                        safe = "_" + safe
                    taken.add(safe)
                cols.append(F.col("element").getField(g.name).alias(safe))
            child = child.select(*cols)
        out[child_name] = child
        specs.append(
            {
                "name": child_name,
                "parent": stream_name,
                "hashid_col": hashid_col,
                "pk": [hashid_col, "pos"],
            }
        )
        # recurse: the child's pk is (hashid, pos) — exactly what the
        # grandchild's hashid must hash
        sub_out, sub_specs = unnest_children_with_specs(
            child, [hashid_col, "pos"], child_name, carry
        )
        out.update(sub_out)
        specs.extend(sub_specs)
        arr_cols = [
            g.name for g in child.schema.fields
            if isinstance(g.dataType, T.ArrayType) and g.name not in carry
        ]
        if arr_cols:  # consumed by recursion: drop from the emitted child
            out[child_name] = child.drop(*arr_cols)
    return out, specs


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
