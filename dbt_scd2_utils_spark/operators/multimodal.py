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


# ---------------------------------------------------------------------------
# resize + frame sampling (same stub-decoder contract)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_feat", DoubleType()),
    ]
)


def resize_media(media: DataFrame, max_dim: int = 128) -> DataFrame:
    """Aspect-preserving resize to ``max_dim`` on the longest side.

    Output dimensions are exact integer math over the decoded metadata
    (``w*max_dim div max(w,h)``, floored at 1) so the geometry is
    oracle-checkable; the pixel transform itself is the stub (payload
    passes through untouched — a real codec resamples it here, inside the
    same mapInPandas stage)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if len(pdf) == 0:
                continue
            dims = []
            for p in pdf["payload"]:
                h = hashlib.md5(p).hexdigest()
                w = 64 + int(h[0:4], 16) % 192
                ht = 64 + int(h[4:8], 16) % 192
                m = max(w, ht)
                dims.append((w, ht, max(w * max_dim // m, 1), max(ht * max_dim // m, 1)))
            w, ht, ow, oh = zip(*dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": list(w),
                    "height": list(ht),
                    "out_width": list(ow),
                    "out_height": list(oh),
                    "payload": pdf["payload"],
                }
            )

    return media.mapInPandas(gen, schema=RESIZED_SCHEMA)


def resize_media_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dim: int = 128,
) -> str:
    """Oracle twin of attach_binary_payload → resize_media (geometry only;
    the binary payload column is not part of the checked projection)."""
    h = f"md5({text_col})"
    seg = lambda a, b: f"cast(concat('0x', substring({h}, {a + 1}, {b - a})) as bigint)"  # noqa: E731
    return f"""
with d as (
  select cast({id_col} as bigint) as doc_id,
         'image/fake' as media_type,
         cast(64 + {seg(0, 4)} % 192 as int) as width,
         cast(64 + {seg(4, 8)} % 192 as int) as height
  from ({source_sql})
)
select doc_id, media_type, width, height,
       cast(greatest((width * {max_dim}) // greatest(width, height), 1) as int) as out_width,
       cast(greatest((height * {max_dim}) // greatest(width, height), 1) as int) as out_height
from d
"""


def sample_frames(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling: one input row fans out to ``n_frames`` output rows —
    the real 1→N generator shape of video/audio chunking in mapInPandas
    (the output batch is a different length than the input batch).  Frame
    features are md5-derived from (payload, frame_idx) so the fan-out is
    oracle-checkable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, feats = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    h = hashlib.md5(bytes(p) + f"-{i}".encode()).hexdigest()
                    feats.append(round(int(h[:8], 16) / float(2**32), 6))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_feat": feats}
            )

    return media.mapInPandas(gen, schema=FRAME_SCHEMA)


def sample_frames_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_frames: int = 3,
) -> str:
    """Oracle twin: the payload is utf-8 of the text, so
    md5(payload || '-' || idx) == md5(text || '-' || idx)."""
    h = f"md5({text_col} || '-' || cast(frame_idx as varchar))"
    return f"""
with f as (
  select cast(unnest(generate_series(0, {n_frames - 1})) as int) as frame_idx,
         {id_col}, {text_col}
  from ({source_sql})
)
select cast({id_col} as bigint) as doc_id, frame_idx,
       round(cast(cast(concat('0x', substring({h}, 1, 8)) as bigint) as double)
             / 4294967296.0, 6) as frame_feat
from f
"""
