"""Conversation-level views of the turn-keyed transcript table — the
payload-specific layer (BASELINE input_hint: multi-turn conversation
transcripts keyed by conv_id + turn_idx).

``assemble_conversations`` materializes the north rule's core invariant —
per-turn text under STABLE TURN ORDERING — as a first-class operator: each
conversation's turns sorted by turn_idx and joined into one transcript
document (the form an LLM training pipeline actually consumes).

Scale shape: ONE hash aggregation. ``collect_list`` partial-aggregates
map-side, ``sort_array`` orders each already-grouped array locally —
no window sort, no secondary shuffle. A conversation is bounded by its
turn count (thousands, not billions), so per-group arrays stay small even
when the table has 10^9 conversations; the shuffle carries one row per
(conv_id, mapper).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assemble_conversations(df: DataFrame, sep: str = "\n") -> DataFrame:
    """(conv_id, n_turns, transcript): turns sorted by turn_idx, rendered
    as ``role: text`` lines. Input is the final (SCD1) transcript table."""
    turn = F.struct(F.col("turn_idx"), F.col("role"), F.col("text"))
    agg = df.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(turn)).alias("_turns")
    )

    def line(t: Column) -> Column:
        return F.concat_ws(
            ": ", F.coalesce(t["role"], F.lit("")), F.coalesce(t["text"], F.lit(""))
        )

    return agg.select(
        "conv_id",
        F.size("_turns").cast("long").alias("n_turns"),
        F.concat_ws(sep, F.transform("_turns", line)).alias("transcript"),
    )
