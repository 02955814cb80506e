"""Table-to-table incremental pipeline — tail one LakeTable's change feed
into another (Delta `readChangeFeed` -> MERGE / medallion bronze->silver
parity; the reference's equivalent is chaining one connection's
destination into another source, which Airbyte users do via the warehouse).

``tail_into(src, dst)`` advances dst to src's committed state by applying
only the commits dst has not seen, exactly-once, resumable across crashes:

1. The last APPLIED SOURCE VERSION is dst's fence for this pipeline's
   ``app_id`` — stored in dst's own commit log, so pipeline progress
   survives restarts with no side-channel state (same contract as the
   streaming sync's batch fences).
2. ``src.commit_ops`` (tiny driver-side JSON reads, no data scan) segments
   the unseen range at non-row-attributable commits (overwrite/rollback =
   the CDF truncate boundary). Row-attributable stretches are read with
   ONE ``changes_between`` call each — MOR/append commits coalesce into
   one scan per schema era, so the plan is O(schema eras + rewrite
   commits), not O(commits), however far behind dst is.
3. Each stretch lands in dst via ``merge_batch`` keyed by dst's pk and
   ordered by the change rows' ``__lsn`` (ties broken by commit version),
   fenced at the stretch's last source version — one atomic dst commit
   per stretch.
4. A truncate boundary re-syncs: dst is OVERWRITTEN with src's snapshot
   AT the boundary version (source LSNs preserved so later low-LSN
   stragglers still lose), fenced at that version, then tailing resumes
   past it — the Delta-CDF consumer contract for non-row-attributable
   commits, automated.

Scale shape: everything is bucket-pruned/coalesced scans + one fenced
merge per stretch; nothing is O(history). A hop's ``transform`` runs on
change rows (|changes|, not |table|) — put silver-layer projections /
enrichment there. Chain hops by calling ``tail_into`` per edge
(bronze->silver->gold), each edge fenced independently in its own dst.

SCD-history sources are out of scope here: their change rows carry NULL
derived columns by contract (see ``LakeTable.changes_between`` docstring)
and a consumer must re-derive them via ``scd.resolve_scd_changelog``;
``tail_into`` targets SCD1 latest-state tables.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import diff_schemas
from .merge import merge_batch
from .scd import SCD_OUT_COLS, _resolved_history, scd_merge_batch
from .table import LakeTable, META_DELETED, META_LSN

#: commits that change no logical row state — physical reorganization and
#: schema/bookkeeping commits contribute nothing to the feed
_NOOP_OPS = {"create", "evolve", "compact", "scd_compact", "rebucket"}
#: commits whose change rows are exactly derivable (see changes_between)
_ATTRIBUTABLE_OPS = {"append", "merge", "scd_merge"}

#: sentinel non-null value for the synthesized deleted-at column — only
#: its null-ness matters to merge_batch
_DELETED_COL = "_cdf_deleted_at"


@dataclass
class TailStats:
    """One ``tail_into`` call's outcome. ``to_version`` is the source
    version dst's fence ACTUALLY reached — equal to the source head after
    a full drain, lower when ``max_segments`` bounded the call (resume by
    calling again)."""

    from_version: int
    to_version: int
    #: dst merge/overwrite commits made (0 = dst was already caught up)
    applied: int = 0
    #: source versions where a truncate boundary forced a snapshot re-sync
    resyncs: list = field(default_factory=list)


def _segments(ops: list[tuple[int, str]], lo: int) -> list[tuple]:
    """Split ``(version, op)`` commits after ``lo`` into maximal
    row-attributable stretches and truncate points:
    ``("changes", from_v, to_v)`` / ``("resync", v)``. ADJACENT truncates
    (no attributable commit between them) collapse to the LAST one — each
    resync is an O(table) overwrite of dst, and a rollback-then-overwrite
    (or N stacked overwrites) leaves only the final state visible, so the
    earlier boundaries are dead work."""
    segs: list[tuple] = []
    cursor = lo
    last_attributable = lo
    for v, op in ops:
        if op in _NOOP_OPS:
            continue
        if op in _ATTRIBUTABLE_OPS:
            last_attributable = v
            continue
        # truncate (overwrite / rollback / unknown op — conservative)
        if last_attributable > cursor:
            segs.append(("changes", cursor, last_attributable))
            segs.append(("resync", v))
        elif segs and segs[-1][0] == "resync":
            segs[-1] = ("resync", v)  # adjacent truncate: supersede
        else:
            segs.append(("resync", v))
        cursor = v
        last_attributable = v
    if last_attributable > cursor:
        segs.append(("changes", cursor, last_attributable))
    return segs


def _apply_renames(df: DataFrame, rename_hints: Optional[dict]) -> DataFrame:
    """Translate OLD-ERA change rows onto the current (post-rename) schema.

    ``changes_between`` projects each stretch's rows to the schema at the
    stretch's END version; when a rename evolve landed AFTER that version
    (dst has already evolved to the source's head schema), the rows still
    carry the old column name and the merge conform would null the renamed
    column out. The rename hints are exactly the old->new map the evolve
    applied, so replaying them on the batch is lossless."""
    if not rename_hints:
        return df
    for old, new in rename_hints.items():
        if old in df.columns and new not in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def _advance_fence(dst: LakeTable, app_id: str, version: int) -> None:
    """Record source-version progress in dst with an EMPTY fenced commit —
    driver-side JSON only, no data files, no Spark job.

    Without it, a source receiving only non-row-attributable no-op commits
    (compact / evolve / vacuum cycles on a quiet stream) never advances the
    consumer's fence: every poll re-reads the same commit-op range, and
    once the stale fence version expires from the source's log window the
    consumer degrades to a spurious full-snapshot re-sync of an
    already-identical dst."""
    from .merge import _lineage

    snap = dst.snapshot()
    if (snap.fences.get(app_id) or 0) >= version:
        return
    dst.commit(
        snap, [], [], fence=(app_id, version),
        lineage=_lineage(app_id, version, 0, 0, 0, None, None),
        op="merge", retry_conflicts=2,
    )


def tail_into(
    src: LakeTable,
    dst: LakeTable,
    app_id: str = "table_tail",
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
    max_segments: Optional[int] = None,
    propagate_schema: Optional[bool] = None,
    rename_hints: Optional[dict] = None,
) -> TailStats:
    """Apply src commits dst hasn't seen; see module docstring.

    ``transform`` (the silver hop) receives the rows about to land —
    change rows (with ``__lsn``, ``{_DELETED_COL}`` and the
    ``_change_version``/``_neg_change_version`` tie-break helpers) on the
    merge path, full-state rows (with ``__lsn``) on the re-sync path —
    and must preserve dst's pk, ``__lsn`` and (when present) the deleted
    and tie-break columns (add/replace payload columns, don't re-select);
    payload columns it emits are conformed onto dst's schema (missing ->
    null, extras dropped). ``max_segments`` bounds one call's work (the
    budgeted-maintenance pattern); call again to continue — each segment
    is fenced, so stopping between segments is exactly the crash-resume
    path.

    SCHEMA EVOLUTION PROPAGATES DOWNSTREAM: when src's current schema
    differs from dst's, the catalog diff (add / widen / rename-with-hints
    / remove — the same ``diff_schemas`` the ingest path applies) is
    applied to dst as a metadata-only ``evolve`` commit BEFORE any rows
    land, so change rows carrying new/widened columns are never silently
    conformed away. Defaults to on for a mirror hop (``transform is
    None``) and OFF when a transform is given (a silver hop owns its own
    output schema); pass ``propagate_schema`` explicitly to override.
    The evolve is idempotent across crashes (re-diffing an evolved dst
    yields no transforms). A breaking diff (pk/cursor removal or lossy
    type change) raises ``BreakingChangeError`` — same guard as ingest.

    LAGGING-CONSUMER RECOVERY: a dst that fell behind the source's
    log-retention/vacuum window cannot read the old change sets any more
    (compaction folded the delta files and vacuum removed them, or the
    commits expired from the log). Instead of surfacing the plan-time
    error forever, the unreadable stretch degrades to a fenced snapshot
    re-sync at its end version (recorded in ``TailStats.resyncs``) and
    tailing continues — the Delta-CDF "consumer must re-sync" contract,
    automated. Keep vacuum ``grace_commits`` / compaction cadence wider
    than the consumer's polling interval to stay on the cheap path."""
    src_snap = src.snapshot()
    src_head = src_snap.version
    last = dst.snapshot().fences.get(app_id)
    lo = last if last is not None else 0
    stats = TailStats(from_version=lo, to_version=lo)
    if src_head <= lo:
        return stats
    if propagate_schema is None:
        propagate_schema = transform is None
    if propagate_schema:
        dst_snap = dst.snapshot()
        transforms = diff_schemas(
            dst_snap.schema,
            src_snap.schema.to_struct(),
            primary_key=list(dst_snap.primary_key),
            rename_hints=rename_hints,
        )
        if transforms:
            dst.evolve(transforms)

    def _resync(v: int) -> None:
        # faithful mirror of src AT the boundary: resolved state,
        # tombstones dropped (src's own overwrite dropped them too),
        # source LSNs preserved so later low-LSN stragglers still lose
        state = src.read(include_meta=True, snap=src.snapshot(at_version=v))
        state = _apply_renames(state, rename_hints)
        if transform is not None:
            state = transform(state)
        if dst.overwrite(state, lsn_col=META_LSN, fence=(app_id, v)) is not None:
            stats.applied += 1
        stats.resyncs.append(v)
        stats.to_version = max(stats.to_version, v)

    try:
        all_segs = _segments(src.commit_ops(lo, src_head), lo)
    except ValueError:
        # fence predates the log window: nothing row-attributable remains
        all_segs = [("resync", src_head)]
    segs = all_segs if max_segments is None else all_segs[:max_segments]
    truncated = len(segs) < len(all_segs)
    for seg in segs:
        if seg[0] == "resync":
            _resync(seg[1])
            continue
        _, a, b = seg
        try:
            ch = src.changes_between(a, b)
        except ValueError:
            # stretch's deltas were folded+vacuumed behind us; historical
            # snapshots in that window reference the same dead files, so
            # the only fully-on-disk state is the CURRENT head — re-sync
            # there; any remaining (older) segments then no-op via fences
            _resync(src_head)
            continue
        ch = _apply_renames(ch, rename_hints)
        batch = ch.withColumn(
            _DELETED_COL,
            F.when(F.col(META_DELETED), F.lit(1).cast("long")),
        ).withColumn(
            # LSN ties across commits resolve to the EARLIEST commit —
            # the same tie rule the source's own MOR read / COW merge
            # apply ("target keeps on tie"), so dst can never diverge
            # from src on a conflicting re-delivery
            "_neg_change_version", -F.col("_change_version")
        )
        if transform is not None:
            batch = transform(batch)
        r = merge_batch(
            dst,
            batch,
            order_cols=[META_LSN, "_neg_change_version"],
            cursor=META_LSN,
            deleted_col=_DELETED_COL,
            app_id=app_id,
            batch_id=b,
            strategy="mor",
        )
        if not r.skipped:
            stats.applied += 1
        stats.to_version = max(stats.to_version, b)
    if not truncated and stats.to_version < src_head:
        # trailing no-op commits (compact/evolve/...) carry no rows but
        # must still advance the fence — see _advance_fence
        _advance_fence(dst, app_id, src_head)
        stats.to_version = src_head
    return stats


def bootstrap_agg_table(
    spark,
    path: str,
    src: LakeTable,
    group_cols: list,
    aggs: dict,
) -> LakeTable:
    """Create (or open) the destination of ``materialized_agg_into``:
    pk = the group columns, bucketed on the first group column so a
    grouped read of the view never shuffles. Schema is derived from the
    aggregate plan itself (no hand-written duplicate)."""
    from ..catalog import TableSchema

    if LakeTable.exists(path):
        return LakeTable(spark, path)
    plan = src.read().groupBy(*group_cols).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return LakeTable.create(
        spark, path, TableSchema.from_struct(plan.schema),
        primary_key=list(group_cols), bucket_cols=[group_cols[0]],
        n_buckets=src.snapshot().n_buckets,
    )


def materialized_agg_into(
    src: LakeTable,
    dst: LakeTable,
    group_cols: list,
    aggs: dict,
    app_id: str = "mat_agg",
    max_segments: Optional[int] = None,
) -> TailStats:
    """Incrementally maintain a MATERIALIZED AGGREGATE VIEW of ``src``
    (``SELECT group_cols, aggs FROM src GROUP BY group_cols``) — the
    derived-table hop (Delta Live Tables / Materialize-style view
    maintenance, scoped to per-group exactness):

    1. The change feed names WHICH groups a stretch touched (one distinct
       over the change rows' group columns — change sets, not the table).
    2. Touched groups are RECOMPUTED from the source's resolved state and
       MERGED into dst in one fenced commit per stretch; groups whose
       rows all disappeared become tombstones. Because groups recompute
       wholesale, ANY aggregate works — max/avg/count-distinct included,
       none of the retraction bookkeeping true delta-aggregation needs.
    3. When the group columns lead the source's bucket columns, the
       recompute scans ONLY the touched groups' buckets (driver-side
       bucket list from the touched keys); otherwise it is one semi-join
       against the state. Cost per call: O(changed groups' data), never
       O(table).
    4. Truncate boundaries / unreadable stretches degrade to one full
       recompute (fenced overwrite), same contract as ``tail_into``.

    Freshness semantics: recomputes read the source's CURRENT state, so a
    bounded call (``max_segments``) may leave touched groups FRESHER than
    the fence — converging, never stale; dst equals the full GROUP BY of
    src's head state once a call drains all segments. ``aggs`` is
    ``{output_col: Column}`` and must be supplied identically on every
    call (it defines the view)."""
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    src_snap = src.snapshot()
    src_head = src_snap.version
    dst_snap = dst.snapshot()
    last = dst_snap.fences.get(app_id)
    lo = last if last is not None else 0
    stats = TailStats(from_version=lo, to_version=lo)
    if src_head <= lo:
        return stats
    agg_exprs = [c.alias(n) for n, c in aggs.items()]

    def _full_refresh(v: int) -> None:
        full = src.read().groupBy(*group_cols).agg(*agg_exprs)
        if dst.overwrite(full, fence=(app_id, v)) is not None:
            stats.applied += 1
        stats.resyncs.append(v)
        stats.to_version = max(stats.to_version, v)

    def _ns_on(left, right):
        # group keys join NULL-SAFELY: SQL GROUP BY puts all-null keys in
        # one group, so the touched-key joins must match them too
        cond = None
        for c in group_cols:
            e = left[c].eqNullSafe(right[c])
            cond = e if cond is None else cond & e
        return cond

    try:
        all_segs = _segments(src.commit_ops(lo, src_head), lo)
    except ValueError:
        all_segs = [("resync", src_head)]
    segs = all_segs if max_segments is None else all_segs[:max_segments]
    truncated = len(segs) < len(all_segs)
    src_pk = list(src_snap.primary_key)
    # bucket pruning needs EVERY bucket column present in the key set
    # (bucket_expr hashes all of them)
    aligned = bool(src_snap.bucket_cols) and all(
        c in group_cols for c in src_snap.bucket_cols
    )
    pk_aligned = bool(src_snap.bucket_cols) and all(
        c in src_pk for c in src_snap.bucket_cols
    )
    for seg in segs:
        if seg[0] == "resync":
            _full_refresh(seg[1])
            continue
        _, a, b = seg
        try:
            ch = src.changes_between(a, b)
            # groups the stretch touched = the change rows' NEW group
            # values (live rows only — a delete tombstone's payload is
            # null) PLUS the changed keys' PRE-IMAGE groups from the
            # segment-start snapshot: an update that moves a row across
            # groups, or a delete, must refresh the group the row LEFT,
            # which only the old state still names.
            new_keys = ch.filter(~F.col(META_DELETED)).select(*group_cols)
            hist = src.snapshot(at_version=a) if a >= 1 else None
            if hist is not None:
                hist_cols = {f.name for f in hist.schema.fields}
                if not all(c in hist_cols for c in group_cols):
                    # a group column added by an evolve AFTER version a:
                    # no pre-image group existed then, so there is nothing
                    # to refresh — skipping old_keys is exact
                    hist = None
            if hist is not None:
                changed_pks = ch.select(*src_pk).distinct()
                if pk_aligned:
                    pkb = sorted(
                        {
                            r["_b"]
                            for r in changed_pks.select(
                                src.bucket_expr(hist).alias("_b")
                            ).distinct().collect()
                        }
                    )
                    hist_files = [
                        p for p, m in hist.files.items()
                        if m["bucket"] in set(pkb)
                    ]
                else:
                    hist_files = list(hist.files)
                # vacuum guard: changes_between's existence check covers
                # the DELTA files, not the base files this historical scan
                # needs — a lagging consumer must degrade to the full
                # refresh contract, not die on executors mid-poll
                if not all(
                    os.path.exists(os.path.join(src.path, p))
                    for p in hist_files
                ):
                    raise ValueError(
                        f"segment-start snapshot v{a} partially vacuumed"
                    )
                old_state = src.read(
                    buckets=pkb if pk_aligned else None, snap=hist
                )
                old_keys = old_state.join(
                    F.broadcast(changed_pks), src_pk, "left_semi"
                ).select(*group_cols)
                new_keys = new_keys.unionByName(old_keys)
            keys = new_keys.distinct().persist()
        except ValueError:
            _full_refresh(src_head)
            continue
        try:
            if aligned:
                # touched buckets from the touched keys: ≤ n_buckets rows
                # to the driver, then a bucket-pruned scan
                buckets = [
                    r["_b"]
                    for r in keys.select(
                        src.bucket_expr(src_snap).alias("_b")
                    ).distinct().collect()
                ]
                state = src.read(buckets=sorted(buckets))
            else:
                state = src.read()
            state = state.join(F.broadcast(keys), _ns_on(state, keys), "left_semi")
            fresh = state.groupBy(*group_cols).agg(*agg_exprs)
            gone = keys.join(fresh, _ns_on(keys, fresh), "left_anti")
            batch = (
                fresh.withColumn("_mat_deleted", F.lit(None).cast("long"))
                .unionByName(
                    gone.select(
                        *group_cols,
                        *[
                            F.lit(None).cast(f.dataType).alias(f.name)
                            for f in fresh.schema.fields
                            if f.name not in group_cols
                        ],
                        F.lit(1).cast("long").alias("_mat_deleted"),
                    )
                )
                .withColumn("_mat_v", F.lit(b).cast("long"))
            )
            r = merge_batch(
                dst, batch, order_cols=["_mat_v"], cursor="_mat_v",
                deleted_col="_mat_deleted", app_id=app_id, batch_id=b,
                strategy="cow",
            )
            if not r.skipped:
                stats.applied += 1
            stats.to_version = max(stats.to_version, b)
        finally:
            keys.unpersist()
    if not truncated and stats.to_version < src_head:
        _advance_fence(dst, app_id, src_head)
        stats.to_version = src_head
    return stats


def tail_scd_into(
    src: LakeTable,
    dst: LakeTable,
    app_id: str = "scd_tail",
    bounded: bool = False,
    max_segments: Optional[int] = None,
    propagate_schema: bool = True,
    rename_hints: Optional[dict] = None,
) -> TailStats:
    """Mirror a ``<stream>_scd`` Type-2 HISTORY table downstream through
    its change feed — ``tail_into``'s sibling for SCD tables (e.g.
    shipping the history cross-region, or a silver history replica).

    Version rows are immutable by the SCD-table contract, so every
    row-attributable stretch is ONE coalesced ``changes_between`` read
    whose rows are appended into dst via ``scd_merge_batch(strategy=
    "mor")`` — O(changes) per stretch, fenced at the stretch's last
    source version, no history read at all. The change rows' NULL derived
    columns are irrelevant: dst re-derives them at read/compaction
    exactly like any MOR SCD table (the consumer-side contract
    ``changes_between`` documents, here automated). A truncate boundary
    (overwrite/rollback on src) re-syncs dst with the RESOLVED history at
    the boundary snapshot — derived columns materialized, source cursors
    preserved — as one fenced overwrite, then tailing resumes.

    dst must be bootstrapped with the same (pk..., cursor) primary key
    (``bootstrap_scd_table``). After a tail, ``read_scd(dst)`` equals
    ``read_scd(src)`` byte-for-byte; fold dst with ``scd_compact`` on the
    same cadence as any MOR history table.

    Schema evolution propagates downstream exactly as in ``tail_into``
    (``propagate_schema`` / ``rename_hints``): dst evolves to src's head
    schema before rows land, and old-era change rows are translated across
    renames — without it, version rows carrying a post-evolve column would
    be conformed to NULL forever, breaking the byte-equality contract."""
    src_snap = src.snapshot()
    src_head = src_snap.version
    dst_snap = dst.snapshot()
    last = dst_snap.fences.get(app_id)
    lo = last if last is not None else 0
    stats = TailStats(from_version=lo, to_version=lo)
    if src_head <= lo:
        return stats
    pk = list(dst_snap.primary_key[:-1])
    cursor = dst_snap.primary_key[-1]
    if propagate_schema:
        transforms = diff_schemas(
            dst_snap.schema,
            src_snap.schema.to_struct(),
            primary_key=list(dst_snap.primary_key),
            rename_hints=rename_hints,
        )
        if transforms:
            dst.evolve(transforms)

    def _resync(v: int) -> None:
        # a resync inside the lagging window would read the same vacuumed
        # files — boundary resyncs use their version, degraded stretches
        # pass src_head (the only state guaranteed fully on disk)
        bsnap = src.snapshot(at_version=v)
        raw = src.read(
            snap=bsnap, resolve=False, include_deleted=True,
            include_meta=False,
        )
        state = _resolved_history(bsnap, raw, bounded)
        state = _apply_renames(state, rename_hints)
        if dst.overwrite(state, lsn_col=cursor, fence=(app_id, v)) is not None:
            stats.applied += 1
        stats.resyncs.append(v)
        stats.to_version = max(stats.to_version, v)

    try:
        all_segs = _segments(src.commit_ops(lo, src_head), lo)
    except ValueError:
        # fence predates the log window (lagging consumer) — same
        # degrade-to-resync contract as tail_into
        all_segs = [("resync", src_head)]
    segs = all_segs if max_segments is None else all_segs[:max_segments]
    truncated = len(segs) < len(all_segs)
    for seg in segs:
        if seg[0] == "resync":
            _resync(seg[1])
            continue
        _, a, b = seg
        try:
            ch = src.changes_between(a, b)
        except ValueError:
            _resync(src_head)  # stretch's deltas folded+vacuumed behind us
            continue
        batch = _apply_renames(
            ch.drop(
                "_change_version", "_change_type", META_LSN, META_DELETED,
                *SCD_OUT_COLS,
            ),
            rename_hints,
        )
        r = scd_merge_batch(
            dst, batch, pk, cursor=cursor, app_id=app_id, batch_id=b,
            strategy="mor", bounded=bounded,
        )
        if not r.skipped:
            stats.applied += 1
        stats.to_version = max(stats.to_version, b)
    if not truncated and stats.to_version < src_head:
        _advance_fence(dst, app_id, src_head)
        stats.to_version = src_head
    return stats
