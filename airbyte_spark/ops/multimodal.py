"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern: media (image/audio/video) travels as a `binary` column with a
sidecar metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so each Python worker sees
columnar batches, never single rows.

The actual codec step is STUBBED (no image/audio libraries in this
environment): ``decode_image`` raises ``NotImplementedError`` unless a
deterministic fake decoder is requested. Everything around it — schema,
batch iteration, partition sizing — is real and tested.

Scale notes:
* mapInPandas is the right vehicle: Arrow transfer amortizes
  serialization, ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
  per-batch memory when payloads are megabytes each.
* Media rows are wide; repartition by size (target ~128 MB of payload per
  task) before the decode stage, not by row count.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("media_kind", StringType()),
    ]
)


def attach_fake_payload(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Make a documents table multimodal-shaped: payload = utf-8 bytes of
    `text` standing in for encoded media. Deterministic, engine-portable."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").cast(BinaryType()).alias("payload"),
        F.lit(kind).alias("media_kind"),
    )


def decode_image(payload: bytes):
    """Real decoder hook — requires an imaging library not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; wire a real decoder in production"
    )


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary payload column.

    The per-batch body is plain pandas/hashlib — this is where a real
    decode/resize/frame-sample would run; byte length + md5 stand in as
    deterministic 'features' so the plumbing is fully testable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "media_kind": pdf["media_kind"],
                }
            )

    return media.mapInPandas(batches, MEDIA_META_SCHEMA)
