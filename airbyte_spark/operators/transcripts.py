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


def validate_dialog_format(df: DataFrame) -> DataFrame:
    """Dialog-format quality report per conversation — the transcript
    payload's analog of the document-level quality filters: before a
    conversation enters a training mix, the pipeline checks its STRUCTURE
    (SFT/RLHF loaders reject malformed dialogs; better to score and drop
    here than to crash a trainer).

    Output (conv_id, n_turns, n_roles, n_role_repeats, n_ts_regressions,
    n_empty_turns, well_formed):

    * ``n_role_repeats`` — adjacent turns (by turn_idx order) with the
      same role: a broken alternation ("user, user") usually means a lost
      turn or a split message.
    * ``n_ts_regressions`` — adjacent turns whose timestamp goes BACK in
      time: ingest reordering the transcript contract says cannot happen
      (stable turn ordering is the north rule's core invariant).
    * ``n_empty_turns`` — null/blank text turns.
    * ``well_formed`` — 1 iff all three counters are 0.

    Scale shape: the SAME one-hash-aggregate plan as
    ``assemble_conversations`` (collect_list partial-aggregates map-side,
    sort_array orders each bounded per-conversation array locally, the
    adjacency scans are per-row array folds) — no window function, no
    second shuffle, no per-turn join. At 10^9 conversations the shuffle
    carries one row per (conv_id, mapper)."""
    turn = F.struct(
        F.col("turn_idx"),
        F.col("role"),
        F.col("text"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    agg = df.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(turn)).alias("_turns")
    )

    def _adjacent(cmp) -> Column:
        # count of adjacent pairs where cmp holds: zip the array against
        # its own 1-shifted slice. slice lengths clamp at 0, so a 1-turn
        # conversation yields two empty slices (no guard needed — unlike
        # a sequence(2, n) index walk, which descends for n = 1 and
        # element_at's out of bounds under ANSI)
        n = F.size("_turns")
        win = F.greatest(n - F.lit(1), F.lit(0))
        pairs = F.zip_with(
            F.slice("_turns", 1, win),
            F.slice("_turns", 2, win),
            lambda a, b: cmp(a, b),
        )
        return F.size(F.filter(pairs, lambda x: x)).cast("long")

    role_rep = _adjacent(
        lambda a, b: a["role"].isNotNull() & (a["role"] == b["role"])
    )
    ts_reg = _adjacent(
        lambda a, b: a["ts"].isNotNull() & b["ts"].isNotNull() & (b["ts"] < a["ts"])
    )
    empty = F.size(
        F.filter(
            "_turns",
            lambda t: t["text"].isNull() | (F.trim(t["text"]) == ""),
        )
    ).cast("long")
    out = agg.select(
        "conv_id",
        F.size("_turns").cast("long").alias("n_turns"),
        # distinct NON-NULL roles (array_distinct keeps one null but SQL
        # engines' list_distinct/count(DISTINCT) drop it — count the same
        # thing everywhere)
        F.size(
            F.array_distinct(
                F.filter(
                    F.transform("_turns", lambda t: t["role"]),
                    lambda r: r.isNotNull(),
                )
            )
        )
        .cast("long")
        .alias("n_roles"),
        role_rep.alias("n_role_repeats"),
        ts_reg.alias("n_ts_regressions"),
        empty.alias("n_empty_turns"),
    )
    return out.withColumn(
        "well_formed",
        (
            (F.col("n_role_repeats") == 0)
            & (F.col("n_ts_regressions") == 0)
            & (F.col("n_empty_turns") == 0)
        ).cast("int"),
    )
