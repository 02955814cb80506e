"""Singer tap adapter (S10) — captured-tap-output ingestion, Spark-first.

The reference wraps a live Singer tap subprocess and converts its stdout
line protocol into Airbyte messages on the driver
(``airbyte-cdk/python/airbyte_cdk/sources/singer/singer_helpers.py``):

* catalog conversion ``singer_catalog_to_airbyte_catalog``
  (singer_helpers.py:113-141): ``stream``/``schema``/``key_properties``
  plus stream-level metadata rules — ``valid-replication-keys`` forces
  incremental with the first sorted key as default cursor,
  ``forced-replication-method`` INCREMENTAL/FULL_TABLE
  (singer_helpers.py:70-90);
* message classification ``_airbyte_message_from_json``
  (singer_helpers.py:239-262): RECORD → (stream, record), STATE → value,
  SCHEMA dropped, non-JSON lines tolerated as logs;
* selection-catalog rendering ``create_singer_catalog_with_selection``
  (singer_helpers.py:264-304): mask to configured streams, stamp
  ``selected``/``replication-method``/``replication-key`` metadata, honor
  ``fieldExclusions``.

Spark-first shape: a tap run is CAPTURED as a directory of JSONL files (the
stdout of one or many tap processes — e.g. one file per worker, appended in
emit order). Envelope classification and per-stream record typing are
executor-side column expressions over ``spark.read.text``:

* ONE ``json_tuple`` parse per line yields the scalar envelope fields AND
  the raw JSON payloads (``record``/``value`` come back as JSON text, so
  the per-stream typed parse is a second, schema-directed ``from_json``
  only over that stream's rows);
* line order — which Singer semantics depend on for STATE and
  ACTIVATE_VERSION — is reconstructed distributively as an orderable
  (file path, split offset, within-split id) struct (partition ids alone
  are NOT emit-ordered: Spark packs splits size-descending — see
  ``read_singer_output``), so ``max_by(x, _singer_seq)`` is "the last
  message in tap-emit order" without a driver-side read;
* the driver touches only the (bounded) catalog dict, the one-row final
  state, and the per-type counts.

Deviations from the reference, by design:

* records carry ``time_extracted`` from the tap (nullable) instead of a
  non-deterministic ``emitted_at=now()`` stamp (singer_helpers.py:253) —
  replays must be bit-reproducible here;
* ACTIVATE_VERSION is implemented (full-table replication: rows of
  versions older than the activated one are swept), not dropped — the
  reference drops it (singer_helpers.py:241) because its destinations
  re-sync full tables wholesale; a lake sink can honor it exactly.
"""

from __future__ import annotations

import json
from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import ConfiguredStream, TableSchema, json_type_to_spark

SEQ_COL = "_singer_seq"
VERSION_COL = "_singer_version"

_INCREMENTAL = "INCREMENTAL"
_FULL_TABLE = "FULL_TABLE"

# Serialization pins ONE unambiguous microsecond format so to_json /
# from_json round trips are exact to the micro.
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
# Parsing is LENIENT (optional sections): real taps emit RFC3339
# ('2021-01-01T00:00:00.000000Z') while our own captures use TS_FORMAT —
# both must type-parse, or cursor timestamps silently come back NULL.
PARSE_TS_FORMAT = "yyyy-MM-dd['T'][ ]HH:mm:ss[.SSSSSS][XXX][XX][X]"


# ---------------------------------------------------------------------------
# Envelope parse (distributed)
# ---------------------------------------------------------------------------


def parse_singer_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Classify raw Singer stdout lines into an envelope DataFrame.

    Output columns: ``type`` (RECORD/STATE/SCHEMA/ACTIVATE_VERSION, null for
    non-protocol lines — the reference logs those, singer_helpers.py:185),
    ``stream``, ``record_json``/``state_json``/``schema_json`` (raw JSON
    text of the payload), ``version``, ``time_extracted``, ``line`` (the
    raw line, kept for log accounting) and ``_singer_seq`` (tap-emit
    order; see module docstring).

    One ``json_tuple`` parse per line; no Python in the row path.

    If the input already carries ``_singer_seq`` (``read_singer_output``
    stamps the file-aware form), it is used as-is; otherwise a
    ``monotonically_increasing_id`` fallback is stamped — exact for a
    single in-order source, but NOT across multiple files (see
    ``read_singer_output``).
    """
    if SEQ_COL in lines.columns:
        seq = lines.select(F.col(line_col).alias("line"), F.col(SEQ_COL))
    else:
        seq = lines.select(
            F.col(line_col).alias("line"),
            F.monotonically_increasing_id().alias(SEQ_COL),
        )
    parsed = seq.select(
        "line",
        SEQ_COL,
        F.json_tuple(
            F.col("line"),
            "type",
            "stream",
            "record",
            "value",
            "schema",
            "version",
            "time_extracted",
        ).alias(
            "type",
            "stream",
            "record_json",
            "state_json",
            "schema_json",
            "_version_str",
            "time_extracted",
        ),
    )
    return parsed.withColumn(
        "version", F.col("_version_str").cast(T.LongType())
    ).drop("_version_str")


def read_singer_output(spark: SparkSession, path: str) -> DataFrame:
    """Read a captured tap run (directory of JSONL files) as an envelope DF.

    Tap-emit order is reconstructed WITHOUT trusting partition ids: Spark
    packs file splits into partitions sorted by size DESCENDING, so
    ``monotonically_increasing_id`` alone would order a small early
    capture file AFTER a large later one (and ``latest_state`` would then
    resurrect a stale bookmark — checkpoint regression). The sequence is
    instead an orderable struct of (file path, split offset, mid): within
    one split mid ascends in line order, splits of a file order by their
    byte offset, and files order lexicographically — the capture-naming
    convention (``chunk-000``, ``chunk-001``, …) that makes multi-file
    order well-defined in the first place."""
    raw = spark.read.text(path).select(
        "value",
        F.struct(
            F.col("_metadata.file_path").alias("f"),
            F.col("_metadata.file_block_start").alias("b"),
            F.monotonically_increasing_id().alias("i"),
        ).alias(SEQ_COL),
    )
    return parse_singer_lines(raw)


def serialize_records(
    df: DataFrame,
    stream: str,
    version_col=None,
    timestamp_format: str = TS_FORMAT,
) -> DataFrame:
    """Serialize a typed DataFrame as Singer RECORD lines (one text column).

    The inverse of :func:`records` — used to capture a Spark-side stream as
    tap output (and by the oracle round-trip query). Timestamp columns are
    pre-formatted with ``date_format`` BEFORE the envelope pack: Spark's
    ``to_json`` honors ``timestampFormat`` only for top-level fields, and
    the record struct sits nested inside the envelope, so without this the
    payload silently falls back to the default millisecond format and
    micro-precision cursors drift on replay.
    """
    rec_fields = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            rec_fields.append(
                F.date_format(F.col(f.name), timestamp_format).alias(f.name)
            )
        else:
            rec_fields.append(F.col(f.name))
    envelope = [
        F.lit("RECORD").alias("type"),
        F.lit(stream).alias("stream"),
    ]
    if version_col is not None:
        envelope.append(version_col.alias("version"))
    envelope.append(F.struct(*rec_fields).alias("record"))
    return df.select(F.to_json(F.struct(*envelope)).alias("value"))


def message_counts(envelope: DataFrame) -> dict:
    """Per-type message counts (unparseable lines under ``"LOG"``) — the
    sync-summary accounting the reference keeps via its logger prefixes."""
    rows = (
        envelope.groupBy(F.coalesce(F.col("type"), F.lit("LOG")).alias("type"))
        .count()
        .collect()
    )
    return {r["type"]: r["count"] for r in rows}


# ---------------------------------------------------------------------------
# Typed per-stream records
# ---------------------------------------------------------------------------


def records(
    envelope: DataFrame,
    stream: str,
    schema: T.StructType,
    timestamp_format: str = PARSE_TS_FORMAT,
) -> DataFrame:
    """Typed RECORD rows for one stream.

    ``from_json`` runs only over this stream's rows (the filter precedes the
    parse in the plan); output = the schema's columns plus
    ``time_extracted``, ``_singer_version`` and ``_singer_seq``.
    """
    recs = envelope.filter(
        (F.col("type") == "RECORD") & (F.col("stream") == stream)
    )
    parsed = recs.withColumn(
        "_r",
        F.from_json(
            F.col("record_json"), schema, {"timestampFormat": timestamp_format}
        ),
    )
    # getField, not F.col(f"_r.{name}") — a field name containing dots is a
    # legal JSON key and must not be parsed as a nested path
    cols = [F.col("_r").getField(f.name).alias(f.name) for f in schema.fields]
    return parsed.select(
        *cols,
        F.col("time_extracted"),
        F.col("version").alias(VERSION_COL),
        F.col(SEQ_COL),
    )


def active_version(envelope: DataFrame, stream: str) -> Optional[int]:
    """Highest ACTIVATE_VERSION emitted for ``stream`` (None if never).

    One-row aggregate — bounded driver traffic.
    """
    row = (
        envelope.filter(
            (F.col("type") == "ACTIVATE_VERSION") & (F.col("stream") == stream)
        )
        .agg(F.max("version").alias("v"))
        .collect()[0]
    )
    return row["v"]


def active_records(
    envelope: DataFrame,
    stream: str,
    schema: T.StructType,
    timestamp_format: str = PARSE_TS_FORMAT,
) -> DataFrame:
    """RECORD rows that survive full-table version activation.

    Singer spec: after ``ACTIVATE_VERSION v``, rows whose version < v are
    swept from the destination; unversioned records are always live. The
    reference drops these messages (singer_helpers.py:241) — see module
    docstring for why we honor them instead.
    """
    v = active_version(envelope, stream)
    recs = records(envelope, stream, schema, timestamp_format)
    if v is None:
        return recs
    return recs.filter(
        F.col(VERSION_COL).isNull() | (F.col(VERSION_COL) >= F.lit(v))
    )


# ---------------------------------------------------------------------------
# STATE handling
# ---------------------------------------------------------------------------


def latest_state(envelope: DataFrame) -> Optional[dict]:
    """The LAST StateMessage value in tap-emit order (checkpoint bookmark).

    ``max_by(state_json, _singer_seq)`` is a single aggregate — the full
    state stream never reaches the driver, only the winning row.
    """
    row = (
        envelope.filter(F.col("type") == "STATE")
        .agg(F.max_by("state_json", SEQ_COL).alias("s"))
        .collect()[0]
    )
    return json.loads(row["s"]) if row["s"] is not None else None


# ---------------------------------------------------------------------------
# Catalog conversion (driver-side, bounded — mirrors singer_helpers.py)
# ---------------------------------------------------------------------------


def _is_field_metadata(metadata: Mapping) -> bool:
    """singer_helpers.py:39-43 — breadcrumb ("properties", <field>) entries."""
    bc = metadata.get("breadcrumb") or []
    return len(bc) == 2 and bc[0] != "property"


def _stream_level_metadata(metadatas: Sequence[Mapping]) -> Optional[Mapping]:
    for m in metadatas or []:
        if not _is_field_metadata(m) and "metadata" in m:
            return m["metadata"]
    return None


def _sync_info_from_metadata(metadatas: Sequence[Mapping]) -> dict:
    """Replication rules from stream-level metadata
    (set_sync_modes_from_metadata, singer_helpers.py:70-90)."""
    info: dict = {"sync_mode": "full_refresh", "cursor_field": None}
    sm = _stream_level_metadata(metadatas)
    if not sm:
        return info
    replication_keys = sm.get("valid-replication-keys", [])
    if replication_keys:
        info["sync_mode"] = "incremental"
        # multiple keys: deterministically the first sorted one (ref TODO)
        info["cursor_field"] = sorted(replication_keys)[0]
        return info
    forced = sm.get("forced-replication-method")
    if isinstance(forced, dict):
        forced = forced.get("replication-method", "")
    if isinstance(forced, str):
        if forced.upper() == _INCREMENTAL:
            info["sync_mode"] = "incremental"
        elif forced.upper() == _FULL_TABLE:
            info["sync_mode"] = "full_refresh"
    return info


def singer_catalog_to_streams(
    singer_catalog: Mapping,
    sync_mode_overrides: Optional[Mapping[str, str]] = None,
    primary_key_overrides: Optional[Mapping[str, Sequence[str]]] = None,
    excluded_streams: Sequence[str] = (),
) -> list[ConfiguredStream]:
    """Convert a discovered Singer catalog into ConfiguredStreams.

    Mirrors ``singer_catalog_to_airbyte_catalog`` + the exclusion filter in
    ``get_catalogs`` (singer_helpers.py:113-176): per stream, the JSON
    schema maps through :func:`json_type_to_spark`, the pk comes from
    overrides else ``key_properties``, and sync mode from overrides else
    stream metadata.
    """
    sync_mode_overrides = sync_mode_overrides or {}
    primary_key_overrides = primary_key_overrides or {}
    out: list[ConfiguredStream] = []
    for entry in singer_catalog.get("streams", []):
        name = entry.get("stream")
        if name in excluded_streams:
            continue
        struct = json_type_to_spark(entry.get("schema", {"type": "object"}))
        if not isinstance(struct, T.StructType):
            raise ValueError(f"stream {name}: schema must be an object schema")
        info = _sync_info_from_metadata(entry.get("metadata", []))
        sync_mode = sync_mode_overrides.get(name, info["sync_mode"])
        pk = list(
            primary_key_overrides.get(name, entry.get("key_properties") or [])
        )
        out.append(
            ConfiguredStream(
                name=name,
                schema=TableSchema.from_struct(struct),
                primary_key=pk,
                cursor_field=info["cursor_field"],
                sync_mode=sync_mode,
                destination_sync_mode="append_dedup" if pk else "append",
            )
        )
    return out


def render_selection_catalog(
    configured: Sequence[ConfiguredStream], discovered: Mapping
) -> dict:
    """The catalog handed back to the tap, masking selection + replication.

    Pure-dict re-expression of ``create_singer_catalog_with_selection``
    (singer_helpers.py:264-304): configured streams get
    ``schema.selected=true``; stream-level metadata gains
    ``selected``/``replication-method``/``forced-replication-method`` (and
    ``replication-key`` for incremental streams with a cursor); field-level
    metadata is selected unless it carries non-empty ``fieldExclusions``.
    Returns a NEW dict (the reference writes a file into cwd).
    """
    by_name = {c.name: c for c in configured}
    out_streams = []
    for entry in discovered.get("streams", []):
        entry = json.loads(json.dumps(entry))  # deep copy, stay pure
        name = entry.get("stream")
        cfg = by_name.get(name)
        if cfg is not None:
            entry.setdefault("schema", {})["selected"] = True
            new_meta = []
            for md in entry.get("metadata", []) or []:
                md = dict(md)
                inner = dict(md.get("metadata", {}))
                if not _is_field_metadata(md):
                    inner["selected"] = True
                    method = (
                        _INCREMENTAL
                        if cfg.sync_mode == "incremental"
                        else _FULL_TABLE
                    )
                    if cfg.sync_mode == "incremental" and cfg.cursor_field:
                        inner["replication-key"] = cfg.cursor_field
                    inner["forced-replication-method"] = method
                    inner["replication-method"] = method
                else:
                    inner["selected"] = not inner.get("fieldExclusions")
                md["metadata"] = inner
                new_meta.append(md)
            if new_meta:
                entry["metadata"] = new_meta
        out_streams.append(entry)
    return {"streams": out_streams}
