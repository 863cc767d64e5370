"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extraction as Arrow-batched Pandas stages (``mapInPandas``).

Beyond-reference surface.  Two decoder tiers behind one interface:

* ORACLE tier (``decode_media`` / ``resize_media`` / ``sample_frames``): a
  clearly-marked deterministic fake (md5-derived dimensions/features) whose
  results are reproducible in SQL, so these paths have DuckDB oracle twins
  and full value-hash correctness gating.
* REAL tier (``decode_media_real`` / ``resize_media_real`` + the
  ``encode_ppm``/``decode_ppm``/``encode_wav``/``decode_wav`` codecs): pure
  Python/numpy P6-PPM image and PCM WAV audio decode with actual pixel and
  sample math — real header parsing, real nearest-neighbor resampling, real
  RMS/zero-crossing features.  No SQL oracle is possible (DuckDB cannot
  parse PPM/WAV), so the driver gates the query rows-only and pytest checks
  exact values against independently-computed expectations.

Formats beyond PPM/WAV (JPEG, mp3, mp4…) need codec libraries this
container doesn't have; swapping the per-batch decode function is the only
change — the mapInPandas plumbing, schema contract, and batching are shared
with the real tier and production-shaped.
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

# Real-codec decode adds an exact integer checksum of the decoded payload
# (position-weighted, mod 1e9+7) so the driver can value-gate it via a SQL
# oracle that re-derives the synthetic corpus arithmetically.
DECODED_REAL_SCHEMA = StructType(
    [*DECODED_SCHEMA.fields, StructField("decoded_checksum", LongType())]
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


# ---------------------------------------------------------------------------
# REAL codec path: PPM (P6) images and PCM WAV audio in pure Python/numpy.
#
# These are real formats with real pixel/sample math — no system codec
# libraries needed — so this path retires the "stub decoder" caveat for
# users whose media is PPM/PNM or PCM WAV, and serves as the worked example
# of swapping _fake_decode_batch for an actual decoder: same mapInPandas
# plumbing, same schema contract, different per-batch function.  DuckDB
# cannot parse PPM/WAV binaries, but the synthetic corpus is pure integer
# arithmetic on doc_id, so the decode emits an exact positional checksum
# of the decoded bytes/samples that a SQL oracle re-derives without ever
# touching the binary — the driver value-gates the path via that checksum;
# pytest additionally checks exact pixel/sample values and float features.
# ---------------------------------------------------------------------------


def encode_ppm(arr) -> bytes:
    """Binary PPM (P6, maxval 255) from an (H, W, 3) uint8 array."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got shape {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(data: bytes):
    """Parse P6 PPM → (width, height, (H, W, 3) uint8 array).  Handles the
    whitespace/comment grammar of the header; raises ValueError on anything
    malformed (truncated pixel data, bad magic, maxval ≠ 255)."""
    import numpy as np

    if not isinstance(data, (bytes, bytearray)) or data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # Header tokens: magic, width, height, maxval — separated by whitespace,
    # with '#'-to-EOL comments allowed anywhere between tokens.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval, then raw pixels
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as e:
        raise ValueError(f"bad PPM header tokens {tokens!r}") from e
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = w * h * 3
    raw = data[pos : pos + need]
    if len(raw) != need:
        raise ValueError(f"truncated PPM pixels: need {need}, have {len(raw)}")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Minimal mono 16-bit PCM WAV from an int16 array."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(s), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(s),
    )
    return hdr + s


def decode_wav(data: bytes):
    """Parse PCM WAV → (sample_rate, channels, float64 samples in [-1, 1]).
    Walks RIFF chunks (fmt before data, unknown chunks skipped); 16-bit and
    8-bit PCM supported; raises ValueError on malformed payloads."""
    import struct

    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM (format 1) supported, got {audio_format}")
    if bits == 16:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return sample_rate, channels, samples


def synthesize_media_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-format corpus from the documents table: even ids
    become small P6 PPM images, odd ids become mono PCM16 WAV clips —
    REAL encoded bytes generated Arrow-batched (the ingest-side twin of the
    decode stage, and the test bed for it)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
            StructField("byte_len", IntegerType()),
        ]
    )
    src = df.select(F.col(id_col).cast("long").alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, mtypes, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 2 == 0:
                    w, h = 4 + i % 13, 4 + (i // 2) % 11
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [(xx * 7 + yy * 13 + i * 31 + c * 5) % 256 for c in range(3)],
                        axis=2,
                    ).astype(np.uint8)
                    mtypes.append("image/ppm")
                    payloads.append(encode_ppm(img))
                else:
                    # Integer sawtooth (NOT a float sine): every sample is
                    # exact integer arithmetic on (t, doc_id), so a SQL
                    # oracle can re-derive the decoded samples bit-for-bit
                    # — transcendental libm calls differ in the last ulp
                    # across engines and would poison an exact checksum.
                    n = 64 + i % 129
                    t = np.arange(n, dtype=np.int64)
                    k = 1 + i % 7
                    samples = ((t * k * 2557) % 24001 - 12000).astype(np.int16)
                    mtypes.append("audio/wav")
                    payloads.append(encode_wav(samples))
                ids.append(i)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": mtypes,
                    "payload": payloads,
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return src.mapInPandas(gen, schema=schema)


def decode_media_real(media: DataFrame) -> DataFrame:
    """REAL decode dispatching on media_type (same output contract as the
    stub :func:`decode_media`, plus an exact integer checksum):

    * ``image/ppm`` → width/height from the parsed header, features =
      [mean_r, mean_g, mean_b, luma_std] over the actual pixels (/255).
    * ``audio/wav`` → width = sample_rate, height = n_samples, features =
      [duration_s, rms, zero_crossing_rate, peak] over the actual samples.

    Float features are rounded to 6 decimals for cross-run stability.
    ``decoded_checksum`` is a position-weighted integer checksum of the
    DECODED payload — Σ value[j]·(j+1) mod 1e9+7 over raw pixel bytes
    (images) or Σ (sample[t]+32768)·(t+1) mod 1e9+7 over int16 samples
    (audio).  Pure integer arithmetic end-to-end, so a SQL oracle that
    re-derives the synthetic corpus can predict it exactly — this is what
    lets the driver gate the real-codec path by value hash instead of
    rows-only."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        mod = 1_000_000_007
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                p = bytes(payload)
                if mtype == "image/ppm":
                    w, h, arr = decode_ppm(p)
                    px = arr.astype(np.float64) / 255.0
                    luma = px @ np.array([0.2126, 0.7152, 0.0722])
                    feats = [
                        round(float(px[:, :, c].mean()), 6) for c in range(3)
                    ] + [round(float(luma.std()), 6)]
                    flat = arr.reshape(-1).astype(np.int64)
                    cksum = int(np.dot(flat, np.arange(1, flat.size + 1)) % mod)
                elif mtype == "audio/wav":
                    rate, _ch, s = decode_wav(p)
                    w, h = rate, len(s)
                    zc = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if len(s) > 1 else 0.0
                    feats = [
                        round(len(s) / rate, 6),
                        round(float(np.sqrt(np.mean(s**2))), 6),
                        round(zc, 6),
                        round(float(np.abs(s).max()), 6),
                    ]
                    # /32768.0 is exact for int16 inputs, so rint recovers
                    # the original integer samples bit-for-bit
                    ints = np.rint(s * 32768.0).astype(np.int64) + 32768
                    cksum = int(np.dot(ints, np.arange(1, ints.size + 1)) % mod)
                else:
                    raise ValueError(f"unsupported media_type {mtype!r}")
                rows.append(
                    (int(doc_id), mtype, len(p), int(w), int(h), feats, cksum)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "byte_len", "width", "height",
                    "features", "decoded_checksum",
                ],
            )

    return media.mapInPandas(gen, schema=DECODED_REAL_SCHEMA)


def decode_media_real_sql(source_sql: str, id_col: str = "doc_id") -> str:
    """Oracle twin of synthesize_media_corpus → decode_media_real's
    checksum projection.  DuckDB never parses a binary: the synthetic
    corpus is pure integer arithmetic on doc_id, so the oracle re-derives
    the PPM header length, WAV chunk sizes, and the position-weighted
    checksum of the decoded pixel bytes / int16 samples directly — a
    constant-bound ``range()`` cross join filtered to each doc's true
    dims plays the role of the pixel/sample loop (this DuckDB build does
    not take lateral column parameters in ``range``).
    A bug anywhere in the engine's encode→parse→decode round trip
    (header grammar, byte order, truncation) diverges the checksum."""
    return f"""
with ids as (select cast({id_col} as bigint) as i from ({source_sql})),
img as (
  select i, 4 + i % 13 as w, 4 + (i // 2) % 11 as h
  from ids where i % 2 = 0
),
img_out as (
  select i as doc_id,
         'image/ppm' as media_type,
         cast(9 + length(cast(w as varchar)) + length(cast(h as varchar))
              + w * h * 3 as int) as byte_len,
         cast(w as int) as width,
         cast(h as int) as height,
         cast(sum(((x * 7 + y * 13 + i * 31 + c * 5) % 256)
                  * ((y * w + x) * 3 + c + 1)) % 1000000007 as bigint)
           as decoded_checksum
  from img, range(0, 14) ty(y), range(0, 16) tx(x), range(0, 3) tc(c)
  where y < h and x < w
  group by i, w, h
),
aud as (
  select i, 64 + i % 129 as n, 1 + i % 7 as k from ids where i % 2 = 1
),
aud_out as (
  select i as doc_id,
         'audio/wav' as media_type,
         cast(44 + 2 * n as int) as byte_len,
         cast(8000 as int) as width,
         cast(n as int) as height,
         cast(sum((((t * k * 2557) % 24001 - 12000) + 32768) * (t + 1))
              % 1000000007 as bigint) as decoded_checksum
  from aud, range(0, 193) tt(t)
  where t < n
  group by i, n, k
)
select * from img_out union all select * from aud_out
"""


def resize_media_real(media: DataFrame, max_dim: int = 16) -> DataFrame:
    """REAL aspect-preserving nearest-neighbor resize for ``image/ppm``
    payloads: decodes the pixels, resamples with integer index maps, and
    re-encodes a valid P6 payload (non-image rows pass through untouched
    with their original dims)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                p = bytes(payload)
                if mtype != "image/ppm":
                    rows.append((int(doc_id), mtype, None, None, None, None, p))
                    continue
                w, h, arr = decode_ppm(p)
                m = max(w, h)
                ow, oh = max(w * max_dim // m, 1), max(h * max_dim // m, 1)
                xi = (np.arange(ow) * w) // ow
                yi = (np.arange(oh) * h) // oh
                out = arr[yi][:, xi]
                rows.append(
                    (int(doc_id), mtype, int(w), int(h), int(ow), int(oh), encode_ppm(out))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "width", "height",
                    "out_width", "out_height", "payload",
                ],
            )

    return media.mapInPandas(gen, schema=RESIZED_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("peak", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_frame_features(media: DataFrame, frame: int = 32) -> DataFrame:
    """Windowed audio feature extraction over the REAL PCM WAV decode:
    each clip fans out 1→⌈n/frame⌉ rows of per-frame signal features —
    ``(doc_id, frame_idx, n_samples, energy, peak, zero_crossings)`` —
    the framing step before any audio model (VAD, fingerprinting,
    loudness gating).

    Every feature is EXACT integer arithmetic on the decoded int16
    samples (energy = Σ s², peak = max|s|, zero_crossings = sign flips
    WITHIN the frame), so the oracle
    (:func:`audio_frame_features_sql`) re-derives the whole table from
    the synthetic corpus without touching a binary — a frame-boundary or
    byte-order bug flips the values.

    Same Arrow ``mapInPandas`` 1→N shape as :func:`sample_frames`: the
    decode+frame loop is per-batch numpy, rows ∝ total audio duration,
    partitioning inherited from the media table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype != "audio/wav":
                    continue
                _rate, _ch, s = decode_wav(bytes(payload))
                ints = np.rint(s * 32768.0).astype(np.int64)
                n = len(ints)
                for f in range((n + frame - 1) // frame):
                    seg = ints[f * frame : (f + 1) * frame]
                    zc = (
                        int(np.sum((seg[1:] < 0) != (seg[:-1] < 0)))
                        if len(seg) > 1
                        else 0
                    )
                    rows.append(
                        (
                            int(doc_id),
                            f,
                            len(seg),
                            int((seg * seg).sum()),
                            int(np.abs(seg).max()),
                            zc,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_samples", "energy", "peak",
                    "zero_crossings",
                ],
            )

    return media.mapInPandas(gen, schema=AUDIO_FRAME_SCHEMA)


def audio_frame_features_sql(
    source_sql: str, id_col: str = "doc_id", frame: int = 32
) -> str:
    """Oracle twin of synthesize_media_corpus → audio_frame_features:
    re-derives the integer-sawtooth samples (s = (t·k·2557) % 24001 −
    12000 with k = 1 + i%7, n = 64 + i%129 — the generator's arithmetic)
    and aggregates the same per-frame integers in SQL."""
    return f"""
with ids as (
  select cast({id_col} as bigint) as i from ({source_sql})
  where {id_col} % 2 = 1
),
samp as (
  select i, t,
         ((t * (1 + i % 7) * 2557) % 24001 - 12000) as s
  from ids, (select unnest(range(0, 193)) as t)
  where t < 64 + i % 129
),
lagged as (
  select i, t // {frame} as frame_idx, t, s,
         lag(s) over (partition by i, t // {frame} order by t) as prev
  from samp
)
select i as doc_id,
       cast(frame_idx as bigint) as frame_idx,
       cast(count(*) as bigint) as n_samples,
       cast(sum(s * s) as bigint) as energy,
       cast(max(abs(s)) as bigint) as peak,
       cast(sum(case when prev is not null
                      and (prev < 0) != (s < 0) then 1 else 0 end)
            as bigint) as zero_crossings
from lagged
group by i, frame_idx
"""


IMAGE_TILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("tile_x", LongType()),
        StructField("tile_y", LongType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def image_tile_features(media: DataFrame, tile: int = 4) -> DataFrame:
    """Tiled image statistics over the REAL P6 PPM decode: each image
    fans out into ⌈w/tile⌉×⌈h/tile⌉ rows of per-tile integer channel
    sums — the patchify step of a vision pipeline (ViT-style patches,
    thumbnail heuristics, flat-region detection), with every value exact
    integer arithmetic on the decoded pixels so the oracle
    (:func:`image_tile_features_sql`) re-derives the table from the
    synthetic generator without parsing a binary.

    Same Arrow ``mapInPandas`` 1→N shape as :func:`audio_frame_features`;
    edge tiles are partial (n_px carries the true pixel count)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype != "image/ppm":
                    continue
                w, h, arr = decode_ppm(bytes(payload))
                a = arr.astype(np.int64)
                for ty in range((h + tile - 1) // tile):
                    for tx in range((w + tile - 1) // tile):
                        seg = a[
                            ty * tile : (ty + 1) * tile,
                            tx * tile : (tx + 1) * tile,
                        ]
                        rows.append(
                            (
                                int(doc_id),
                                tx,
                                ty,
                                int(seg.shape[0] * seg.shape[1]),
                                int(seg[:, :, 0].sum()),
                                int(seg[:, :, 1].sum()),
                                int(seg[:, :, 2].sum()),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "tile_x", "tile_y", "n_px",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return media.mapInPandas(gen, schema=IMAGE_TILE_SCHEMA)


def image_tile_features_sql(
    source_sql: str, id_col: str = "doc_id", tile: int = 4
) -> str:
    """Oracle twin of synthesize_media_corpus → image_tile_features:
    pixel value = (x·7 + y·13 + i·31 + c·5) % 256 on a (4 + i%13) ×
    (4 + (i//2)%11) grid — the generator's arithmetic, aggregated per
    tile in SQL."""
    px = "((x * 7 + y * 13 + i * 31 + {c} * 5) % 256)"
    return f"""
with ids as (
  select cast({id_col} as bigint) as i from ({source_sql})
  where {id_col} % 2 = 0
),
grid as (
  select i, x, y
  from ids,
       (select unnest(range(0, 17)) as x),
       (select unnest(range(0, 15)) as y)
  where x < 4 + i % 13 and y < 4 + (i // 2) % 11
)
select i as doc_id,
       cast(x // {tile} as bigint) as tile_x,
       cast(y // {tile} as bigint) as tile_y,
       cast(count(*) as bigint) as n_px,
       cast(sum({px.format(c=0)}) as bigint) as sum_r,
       cast(sum({px.format(c=1)}) as bigint) as sum_g,
       cast(sum({px.format(c=2)}) as bigint) as sum_b
from grid
group by i, x // {tile}, y // {tile}
"""
