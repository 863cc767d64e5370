"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extraction as Arrow-batched Pandas stages (``mapInPandas``).

Beyond-reference surface.  The container has no image/audio codecs, so the
actual decode is a clearly-marked deterministic fake (md5-derived
dimensions/features) behind the same interface a real decoder would use —
the Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and tested, and the fake is reproducible in SQL so even this
path has a DuckDB oracle twin.

Swap ``_fake_decode_batch`` for a real codec (PIL/libsndfile/ffmpeg) by
replacing one function; everything else (schema contract, mapInPandas
batching, downstream feature joins) is production shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simulated ingest: treat the document body as an opaque binary payload
    with typed metadata — the schema shape a real image/audio table has."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.length(F.col(text_col)).alias("byte_len"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB DECODER (deterministic fake).

    A real implementation would decode ``payload`` with an image/audio
    codec.  This fake derives width/height and a 4-dim feature vector from
    the payload's md5 so results are reproducible in any engine:
      width  = 64 + h[0:4]  % 192
      height = 64 + h[4:8]  % 192
      feat_i = round(h[8+4i : 12+4i] / 65535, 6)
    """
    import hashlib

    def decode(payload: bytes):
        h = hashlib.md5(payload).hexdigest()
        seg = lambda a, b: int(h[a:b], 16)  # noqa: E731
        return (
            64 + seg(0, 4) % 192,
            64 + seg(4, 8) % 192,
            [round(seg(8 + 4 * i, 12 + 4 * i) / 65535.0, 6) for i in range(4)],
        )

    w, ht, feats = zip(*(decode(p) for p in pdf["payload"])) if len(pdf) else ((), (), ())
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "byte_len": pdf["byte_len"],
            "width": list(w),
            "height": list(ht),
            "features": list(feats),
        }
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode via mapInPandas (the production shape for
    CPU-bound per-row Python work: batch transfer, no per-row pickling)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(gen, schema=DECODED_SCHEMA)


def decode_media_scalars(media: DataFrame) -> DataFrame:
    """Driver-facing projection of :func:`decode_media`: the feature vector
    flattened to ``feat_0..feat_3`` double columns.  Value-hash harnesses
    (pandas ``sort_values`` canonicalizers) cannot hash list cells, so the
    correctness-gated query emits scalars; library users keep the
    array-typed :func:`decode_media`."""
    out = decode_media(media)
    return out.select(
        "doc_id",
        "media_type",
        "byte_len",
        "width",
        "height",
        *[F.col("features")[i].alias(f"feat_{i}") for i in range(4)],
    )


def decode_media_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    scalars: bool = False,
) -> str:
    """Oracle twin of attach_binary_payload → decode_media (possible only
    because the stub is md5-deterministic).  ``scalars=True`` mirrors
    :func:`decode_media_scalars` (feat_i columns instead of the array)."""
    h = f"md5({text_col})"
    seg = lambda a, b: f"cast(concat('0x', substring({h}, {a + 1}, {b - a})) as bigint)"  # noqa: E731
    feat = lambda i: (  # noqa: E731
        f"round(cast({seg(8 + 4 * i, 12 + 4 * i)} as double) / 65535.0, 6)"
    )
    if scalars:
        feats = ",\n  ".join(f"{feat(i)} as feat_{i}" for i in range(4))
    else:
        feats = "[" + ", ".join(feat(i) for i in range(4)) + "] as features"
    return f"""
select cast({id_col} as bigint) as doc_id,
  'image/fake' as media_type,
  cast(length({text_col}) as int) as byte_len,
  cast(64 + {seg(0, 4)} % 192 as int) as width,
  cast(64 + {seg(4, 8)} % 192 as int) as height,
  {feats}
from ({source_sql})
"""
