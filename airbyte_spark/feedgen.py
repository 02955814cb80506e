"""Deterministic synthetic WAL/binlog generator for transcript change events.

Produces ordered parquet "segments" (one file ≈ one WAL segment), mirroring
the reference's replay fixtures
(base-normalization/integration_tests/resources/test_simple_streams/data_input/
messages.txt / messages_incremental.txt / messages_schema_change.txt) scaled
up and parameterized:

* inserts, updates (higher LSN wins), deletes (``_ab_cdc_deleted_at`` set)
* exact duplicate events (same pk+lsn re-emitted — at-least-once feed)
* late events: a lower-LSN event delivered *after* a higher-LSN event for the
  same key was already applied (the id=5 "vw" case in
  messages_incremental.txt) — must not resurrect old text
* hot-conversation skew (one conv_id receives ``hot_fraction`` of updates)
* optional schema epoch 2 (adds ``tool_version``, FIXTURES.md F4/E2)

Everything is numpy-seeded; same params + seed => byte-identical feed.
The generator is driver-side tooling (like the reference's fixture files),
not part of the engine hot path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "tool", "system"])
TOOLS = np.array([None, "search", "python", "browser", "calculator"], dtype=object)



@dataclass
class FeedSpec:
    n_convs: int = 100
    turns_per_conv: int = 8
    n_updates: int = 400
    n_deletes: int = 40
    dup_rate: float = 0.05
    late_rate: float = 0.05
    hot_fraction: float = 0.10  # share of updates hitting conv 0
    n_segments: int = 4
    seed: int = 42
    schema_epoch: int = 1  # 2 => include tool_version column


def _text(conv: np.ndarray, turn: np.ndarray, version: np.ndarray, rng) -> np.ndarray:
    """Deterministic per-(key,version) text with canonicalizer-exercising junk."""
    n = len(conv)
    junk = np.where(
        rng.random(n) < 0.15,
        np.array(["  spéçiäl\x00 ", "\ttabs\t and  runs ", " trailing ", "ünïcode—dash "])[
            rng.integers(0, 4, n)
        ],
        "",
    )
    return np.char.add(
        np.char.add(
            np.char.add("turn text c", conv.astype(str)),
            np.char.add(" t", turn.astype(str)),
        ),
        np.char.add(np.char.add(" v", version.astype(str)), junk.astype(str)),
    )


def _group_ranks(key: np.ndarray) -> np.ndarray:
    """Per-key running counter (0,1,2,... in array order) — the numpy twin
    of groupby().cumcount(), ~20x faster on multi-million-row feeds."""
    n = len(key)
    order = np.argsort(key, kind="stable")
    sk = key[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    sizes = np.diff(np.r_[starts, n])
    ranks_sorted = np.arange(n, dtype="int64") - np.repeat(starts, sizes)
    out = np.empty(n, dtype="int64")
    out[order] = ranks_sorted
    return out


def generate_feed(out_dir: str, spec: FeedSpec) -> pd.DataFrame:
    """Write segment parquet files under ``out_dir``; return the full event
    frame (in delivery order) for oracle use.

    Pure-numpy pipeline (one DataFrame assembly at the very end): pandas
    concat/copy/cumcount overhead made the old version the bottleneck at
    10^7-event bench scales."""
    rng = np.random.default_rng(spec.seed)

    # --- inserts: every (conv, turn) once, conv-major order ----------------
    ins_conv = np.repeat(np.arange(spec.n_convs, dtype=np.int64), spec.turns_per_conv)
    ins_turn = np.tile(np.arange(spec.turns_per_conv, dtype=np.int64), spec.n_convs)

    # --- updates (skewed toward conv 0) + deletes, shuffled together -------
    n_hot = int(spec.n_updates * spec.hot_fraction)
    upd_conv = np.concatenate(
        [np.zeros(n_hot, dtype=np.int64), rng.integers(0, spec.n_convs, spec.n_updates - n_hot)]
    )
    upd_turn = rng.integers(0, spec.turns_per_conv, spec.n_updates)
    del_conv = rng.integers(0, spec.n_convs, spec.n_deletes)
    del_turn = rng.integers(0, spec.turns_per_conv, spec.n_deletes)

    tail_conv = np.concatenate([upd_conv, del_conv])
    tail_turn = np.concatenate([upd_turn, del_turn])
    tail_op = np.concatenate(
        [np.full(spec.n_updates, 1, dtype=np.int8), np.full(spec.n_deletes, 2, dtype=np.int8)]
    )
    perm = rng.permutation(len(tail_conv))
    tail_conv, tail_turn, tail_op = tail_conv[perm], tail_turn[perm], tail_op[perm]

    conv = np.concatenate([ins_conv, tail_conv])
    turn = np.concatenate([ins_turn, tail_turn])
    op = np.concatenate([np.zeros(len(ins_conv), dtype=np.int8), tail_op])
    n = len(conv)

    # per-key version counter (0 for the insert, 1.. for later changes)
    version = _group_ranks(conv * spec.turns_per_conv + turn)

    lsn = np.arange(1, n + 1, dtype="int64")
    # object dtype: a '<U9' array would store the literal string 'None' on
    # the masked assignment below instead of a real null
    role = ROLES[(conv + turn) % len(ROLES)].astype(object)
    tool = TOOLS[(turn * 7 + version) % len(TOOLS)].copy()
    text = _text(conv, turn, version, rng).astype(object)
    deleted_mask = op == 2
    role[deleted_mask] = None
    tool[deleted_mask] = None
    text[deleted_mask] = None

    base = np.datetime64("2025-01-01T00:00:00", "us")
    ts = base + (turn * 60).astype("timedelta64[s]").astype("timedelta64[us]")
    updated = base + lsn.astype("timedelta64[s]").astype("timedelta64[us]")
    deleted_at = np.where(deleted_mask, updated, np.datetime64("NaT", "us"))
    emitted = updated + np.timedelta64(2_000_000, "us")

    # --- duplicates: re-emit a random earlier event verbatim ----------------
    n_dup = int(n * spec.dup_rate)
    if n_dup:
        didx = rng.integers(0, n, n_dup)
        take = np.concatenate([np.arange(n), didx])
    else:
        take = np.arange(n)

    # --- deliver in LSN order, then displace "late" events further down -----
    take = take[np.argsort(lsn[take], kind="stable")]
    m = len(take)
    emitted_full = emitted[take].copy()
    n_late = int(m * spec.late_rate)
    if n_late:
        late_idx = rng.choice(m - 1, size=n_late, replace=False)
        order = np.arange(m, dtype="float64")
        # push each late event past ~5% of the feed; stamp older emitted_at
        order[late_idx] += m * 0.05 + rng.integers(1, 50, n_late)
        emitted_full[late_idx] -= np.timedelta64(3600_000_000, "us")
        deliver = np.argsort(order, kind="stable")
        take = take[deliver]
        emitted_full = emitted_full[deliver]

    ev = pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", conv.astype(str)).astype(object)[take],
            "turn_idx": turn[take].astype("int32"),
            "op": np.array(["I", "U", "D"], dtype=object)[op[take]],
            "version": version[take],
            "_ab_cdc_lsn": lsn[take],
            "role": role[take],
            "tool": tool[take],
            "text": text[take],
            "ts": ts[take],
            "_ab_cdc_updated_at": updated[take],
            "_ab_cdc_deleted_at": deleted_at[take],
            "_airbyte_emitted_at": emitted_full,
        }
    )

    if spec.schema_epoch >= 2:
        ev["tool_version"] = np.where(
            ev["tool"].notna(), "v" + (ev["_ab_cdc_lsn"] % 3 + 1).astype(str), None
        )

    _write_segments(ev.drop(columns=["op", "version"]), out_dir, spec.n_segments)
    return ev


_ARROW_FIELDS = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
    ("_ab_cdc_lsn", pa.int64()),
    ("_ab_cdc_updated_at", pa.timestamp("us")),
    ("_ab_cdc_deleted_at", pa.timestamp("us")),
    ("_airbyte_emitted_at", pa.timestamp("us")),
]


def _write_segments(ev: pd.DataFrame, out_dir: str, n_segments: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    fields = list(_ARROW_FIELDS)
    if "tool_version" in ev.columns:
        fields = fields[:6] + [("tool_version", pa.string())] + fields[6:]
    # carry any EXTRA payload columns (e.g. an embedding vector) with
    # arrow-inferred types; "op"/"version" stay generator-internal
    known = {name for name, _ in fields} | {"op", "version"}
    for c in ev.columns:
        if c not in known:
            # infer from a small non-null prefix: pa.array over the FULL
            # column materializes every row (e.g. the whole embedding
            # list column) just to read .type; fall back to the full
            # conversion only when the prefix is all-null
            sample = ev[c].dropna().head(128)
            inferred = pa.array(sample if len(sample) else ev[c]).type
            fields.append((c, inferred))
    schema = pa.schema(fields)
    cols = [name for name, _ in fields]
    splits = np.array_split(np.arange(len(ev)), n_segments)
    for i, idx in enumerate(splits):
        seg = ev.iloc[idx][cols]
        tbl = pa.Table.from_pandas(seg, schema=schema, preserve_index=False)
        pq.write_table(tbl, os.path.join(out_dir, f"segment-{i:05d}.parquet"))


# ---------------------------------------------------------------------------
# Pandas oracle: reference replay semantics (D1-D8) in one pass
# ---------------------------------------------------------------------------


def oracle_final_state(ev: pd.DataFrame, canonicalize=None) -> pd.DataFrame:
    """Final table per the reference's SCD ordering (stream_processor.py:876-891):
    per (conv_id, turn_idx) the row with max (lsn, updated_at, emitted_at) wins;
    if that row is a delete, the key is absent. Late/duplicate events fall out
    of the ordering naturally — exactly how the reference's window dedup
    treats them."""
    df = ev.copy()
    df["_rank"] = np.arange(len(df))
    df = df.sort_values(
        ["_ab_cdc_lsn", "_ab_cdc_updated_at", "_airbyte_emitted_at", "_rank"],
        kind="stable",
    )
    # drop_duplicates keep='last' (NOT groupby().last(), which skips NaNs
    # per-column and would smear old values into delete rows)
    last = df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    alive = last[last["_ab_cdc_deleted_at"].isna()].copy()
    out_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if "tool_version" in alive.columns:
        out_cols.append("tool_version")
    out = alive[out_cols].reset_index(drop=True)
    if canonicalize is not None:
        out["text"] = canonicalize(out["text"])
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
