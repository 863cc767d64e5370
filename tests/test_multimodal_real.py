"""REAL multimodal codec tier (operators/multimodal.py): pure-Python P6 PPM
and PCM WAV decode with actual pixel/sample math, end-to-end through the
Arrow-batched mapInPandas plumbing.  Expectations are computed independently
in the test (numpy over the same synthesized media), not read back from the
operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.multimodal import (
    decode_media_real,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    resize_media_real,
    synthesize_media_corpus,
)

# ---- pure codec units ----------------------------------------------------


def test_ppm_roundtrip_and_header_grammar():
    img = (np.arange(6 * 4 * 3) * 7 % 256).astype(np.uint8).reshape(4, 6, 3)
    w, h, arr = decode_ppm(encode_ppm(img))
    assert (w, h) == (6, 4) and (arr == img).all()
    # comments + arbitrary whitespace in the header are legal PNM
    body = img.tobytes()
    fancy = b"P6 # magic\n# a comment line\n 6\t4 # dims\n255\n" + body
    w, h, arr = decode_ppm(fancy)
    assert (w, h) == (6, 4) and (arr == img).all()


@pytest.mark.parametrize(
    "payload, msg",
    [
        (b"P5\n2 2\n255\n" + b"\0" * 12, "not a P6"),
        (b"P6\n2 2\n65535\n" + b"\0" * 12, "maxval 255"),
        (b"P6\n4 4\n255\n" + b"\0" * 5, "truncated PPM pixels"),
        (b"nonsense", "not a P6"),
    ],
)
def test_ppm_malformed_rejected(payload, msg):
    with pytest.raises(ValueError, match=msg):
        decode_ppm(payload)


def test_wav_roundtrip_and_malformed():
    s = (np.sin(np.arange(200) / 3.0) * 20000).astype(np.int16)
    rate, ch, dec = decode_wav(encode_wav(s, 16000))
    assert (rate, ch, len(dec)) == (16000, 1, 200)
    assert np.allclose(dec, s / 32768.0)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


# ---- Spark end-to-end ----------------------------------------------------


@pytest.fixture(scope="module")
def decoded(spark):
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    media = synthesize_media_corpus(docs).persist()
    out = decode_media_real(media).persist()
    yield media, out
    media.unpersist(), out.unpersist()


def test_decode_real_images_exact(decoded):
    media, out = decoded
    rows = {r["doc_id"]: r for r in out.filter("media_type = 'image/ppm'").collect()}
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'image/ppm'").collect()
    }
    assert set(rows) == {i for i in range(40) if i % 2 == 0}
    for i, r in rows.items():
        w, h, arr = decode_ppm(payloads[i])
        assert (r["width"], r["height"]) == (w, h) == (4 + i % 13, 4 + (i // 2) % 11)
        px = arr.astype(np.float64) / 255.0
        expected = [round(float(px[:, :, c].mean()), 6) for c in range(3)]
        luma = px @ np.array([0.2126, 0.7152, 0.0722])
        expected.append(round(float(luma.std()), 6))
        assert r["features"] == pytest.approx(expected, abs=1e-9)


def test_decode_real_audio_exact(decoded):
    _media, out = decoded
    rows = {r["doc_id"]: r for r in out.filter("media_type = 'audio/wav'").collect()}
    assert set(rows) == {i for i in range(40) if i % 2 == 1}
    for i, r in rows.items():
        n = 64 + i % 129
        t = np.arange(n, dtype=np.int64)
        s = ((t * (1 + i % 7) * 2557) % 24001 - 12000).astype(np.int16)
        sf = s.astype(np.float64) / 32768.0
        assert (r["width"], r["height"]) == (8000, n)  # sample_rate, n_samples
        zc = float(np.mean(np.signbit(sf[1:]) != np.signbit(sf[:-1])))
        expected = [
            round(n / 8000, 6),
            round(float(np.sqrt(np.mean(sf**2))), 6),
            round(zc, 6),
            round(float(np.abs(sf).max()), 6),
        ]
        assert r["features"] == pytest.approx(expected, abs=1e-9)


def test_decode_real_checksums_exact(decoded):
    # the positional checksum of the DECODED payload, recomputed here
    # independently from the raw encoded bytes
    media, out = decoded
    mod = 1_000_000_007
    got = {r["doc_id"]: r["decoded_checksum"] for r in out.collect()}
    for r in media.collect():
        p = bytes(r["payload"])
        if r["media_type"] == "image/ppm":
            _w, _h, arr = decode_ppm(p)
            flat = arr.reshape(-1).astype(np.int64)
            want = int(np.dot(flat, np.arange(1, flat.size + 1)) % mod)
        else:
            _rate, _ch, s = decode_wav(p)
            ints = np.rint(s * 32768.0).astype(np.int64) + 32768
            want = int(np.dot(ints, np.arange(1, ints.size + 1)) % mod)
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_resize_real_resamples_pixels(decoded):
    media, _out = decoded
    resized = {
        r["doc_id"]: r
        for r in resize_media_real(media, max_dim=8)
        .filter("media_type = 'image/ppm'")
        .collect()
    }
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'image/ppm'").collect()
    }
    for i, r in resized.items():
        w, h, arr = decode_ppm(payloads[i])
        m = max(w, h)
        ow, oh = max(w * 8 // m, 1), max(h * 8 // m, 1)
        assert (r["out_width"], r["out_height"]) == (ow, oh)
        # the output payload is a VALID P6 whose pixels are the exact
        # nearest-neighbor resample of the input
        rw, rh, rarr = decode_ppm(bytes(r["payload"]))
        assert (rw, rh) == (ow, oh)
        xi = (np.arange(ow) * w) // ow
        yi = (np.arange(oh) * h) // oh
        assert (rarr == arr[yi][:, xi]).all()
    # audio passes through untouched
    audio = resize_media_real(media, max_dim=8).filter("media_type = 'audio/wav'")
    assert audio.filter(F.col("out_width").isNotNull()).count() == 0


def test_audio_frame_features_exact(spark):
    import numpy as np

    from dbt_scd2_utils_spark.operators.multimodal import (
        audio_frame_features,
        synthesize_media_corpus,
    )

    ids = spark.createDataFrame([(i,) for i in (1, 3, 7, 129)], "doc_id long")
    out = audio_frame_features(synthesize_media_corpus(ids), frame=32)
    rows = {(r.doc_id, r.frame_idx): r for r in out.collect()}
    for i in (1, 3, 7, 129):
        n = 64 + i % 129
        k = 1 + i % 7
        t = np.arange(n, dtype=np.int64)
        s = (t * k * 2557) % 24001 - 12000
        n_frames = (n + 31) // 32
        assert sum(1 for key in rows if key[0] == i) == n_frames
        for f in range(n_frames):
            seg = s[f * 32 : (f + 1) * 32]
            r = rows[(i, f)]
            assert r.n_samples == len(seg)
            assert r.energy == int((seg * seg).sum())
            assert r.peak == int(np.abs(seg).max())
            assert r.zero_crossings == int(
                np.sum((seg[1:] < 0) != (seg[:-1] < 0))
            )


def test_audio_frame_features_skips_images(spark):
    from dbt_scd2_utils_spark.operators.multimodal import (
        audio_frame_features,
        synthesize_media_corpus,
    )

    ids = spark.createDataFrame([(2,), (4,)], "doc_id long")  # images only
    assert audio_frame_features(synthesize_media_corpus(ids)).count() == 0


def test_image_tile_features_exact(spark):
    import numpy as np

    from dbt_scd2_utils_spark.operators.multimodal import (
        image_tile_features,
        synthesize_media_corpus,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 2, 24)], "doc_id long")
    out = image_tile_features(synthesize_media_corpus(ids), tile=4)
    rows = {(r.doc_id, r.tile_x, r.tile_y): r for r in out.collect()}
    for i in (0, 2, 24):
        w, h = 4 + i % 13, 4 + (i // 2) % 11
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 7 + yy * 13 + i * 31 + c * 5) % 256 for c in range(3)],
            axis=2,
        ).astype(np.int64)
        for ty in range((h + 3) // 4):
            for tx in range((w + 3) // 4):
                seg = img[ty * 4 : ty * 4 + 4, tx * 4 : tx * 4 + 4]
                r = rows[(i, tx, ty)]
                assert r.n_px == seg.shape[0] * seg.shape[1]
                assert (r.sum_r, r.sum_g, r.sum_b) == (
                    int(seg[:, :, 0].sum()),
                    int(seg[:, :, 1].sum()),
                    int(seg[:, :, 2].sum()),
                )
