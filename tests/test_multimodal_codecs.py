"""Real-codec multimodal tests: BMP/WAV/FRMS byte-exact round-trips and
the Arrow-batched decode / resize / frame-sample Spark stages."""

import numpy as np
import pytest

from airbyte_spark.ops import codecs as C
from airbyte_spark.ops.multimodal import (
    attach_synthetic_media,
    decode_media_features,
    resize_images,
    sample_frames,
)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (7, 4), (16, 16)]:
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = C.decode_bmp(C.encode_bmp(rgb))
        assert (out == rgb).all(), (h, w)
    # row padding: w=5 rows pad 15 -> 16 bytes; size must reflect that
    assert len(C.encode_bmp(np.zeros((2, 5, 3), np.uint8))) == 54 + 2 * 16


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        C.decode_bmp(b"\x89PNG0000000000000000000000000000000000000000000000")


def test_wav_roundtrip_exact():
    for sr, ch, n in [(8000, 1, 17), (16000, 2, 400), (24000, 1, 1)]:
        samples = (np.arange(n * ch, dtype=np.int64) % 3001 - 1500).astype(np.int16)
        sr2, ch2, out = C.decode_wav(C.encode_wav(samples, sr, ch))
        assert (sr2, ch2) == (sr, ch)
        assert (out == samples).all()


def test_frames_container_walk():
    frames = [C.synth_image(d) for d in range(5)]
    payload = C.encode_frames(frames)
    assert C.frame_count(payload) == 5
    assert [f for _, f in C.iter_frames(payload)] == frames
    sampled = list(C.iter_frames(payload, stride=2))
    assert [i for i, _ in sampled] == [0, 2, 4]


def test_resize_nearest_identity_and_shape():
    rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (C.resize_nearest(rgb, 4, 6) == rgb).all()
    small = C.resize_nearest(rgb, 2, 3)
    assert small.shape == (2, 3, 3)
    assert (small == rgb[::2][:, ::2]).all()


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    return attach_synthetic_media(docs)


def test_decode_media_features_matches_synthesis(media):
    rows = {r.doc_id: r for r in decode_media_features(media).collect()}
    assert len(rows) == 12
    for d, r in rows.items():
        kind = ("image", "audio", "video")[d % 3]
        assert r.media_kind == kind
        if kind == "image":
            assert (r.height, r.width) == C.synth_image_dims(d)
            assert r.sample_rate is None and r.n_frames is None
        elif kind == "audio":
            sr, n, ch = C.synth_audio_params(d)
            assert (r.sample_rate, r.n_samples, r.channels) == (sr, n, ch)
            assert r.width is None
        else:
            assert r.n_frames == C.synth_video_frames(d)
            assert (r.height, r.width) == C.synth_image_dims(d)


def test_resize_images_stage(media):
    from airbyte_spark.ops.multimodal import decode_image

    out = resize_images(media, 4, 5).collect()
    assert len(out) == 4  # image rows only (doc_id % 3 == 0)
    for r in out:
        payload = bytes(r.payload)
        # format preserved: BMP/PNG/JPEG rows re-encode in kind
        fmt = (r.doc_id // 3) % 3
        sig = (b"BM", b"\x89PNG", b"\xff\xd8")[fmt]
        assert payload.startswith(sig), (r.doc_id, fmt)
        rgb = decode_image(payload)
        assert rgb.shape == (4, 5, 3)
        # nearest-neighbor of the known gradient: pixel (0,0) is
        # preserved exactly for the lossless formats, within JPEG's
        # quantization error for the lossy one
        want = C._synth_rgb(r.doc_id)[0, 0].astype(int)
        err = np.abs(rgb[0, 0].astype(int) - want).max()
        assert err == 0 if fmt < 2 else err <= 40, (r.doc_id, err)


def test_sample_frames_stage(media):
    out = sample_frames(media, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert r.frame_idx % 2 == 0
        rgb = C.decode_bmp(bytes(r.frame))
        assert (rgb.shape[0], rgb.shape[1]) == (r.height, r.width)
    for d, rows in by_doc.items():
        assert d % 3 == 2  # video rows only
        want = -(-C.synth_video_frames(d) // 2)  # ceil(n/stride)
        assert len(rows) == want
        # frame k of doc d is synth_image(d + k) — sampled dims must track k
        for r in rows:
            assert (r.height, r.width) == C.synth_image_dims(d + r.frame_idx)


def test_audio_features_match_closed_form(media):
    """audio_features' integer aggregates equal the closed-form model of
    the synthetic PCM stream — sample-VALUE-level verification of the
    RIFF decode (the oracle twin of multimodal_audio)."""
    from airbyte_spark.ops.multimodal import audio_features

    rows = {r.doc_id: r for r in audio_features(media).collect()}
    assert set(rows) == {d for d in range(12) if d % 3 == 1}
    for d, r in rows.items():
        sr, n, ch = C.synth_audio_params(d)
        t = np.arange(n * ch, dtype=np.int64)
        s = ((t * (1 + d % 13)) % 2048) - 1024
        assert (r.sample_rate, r.channels, r.n_samples) == (sr, ch, n)
        assert r.sum_sq == int((s * s).sum())
        assert r.sum_abs == int(np.abs(s).sum())
        assert r.peak_abs == int(np.abs(s).max())
        assert r.n_zero_cross == int(np.count_nonzero(s[1:] * s[:-1] < 0))


def test_wav_decodes_data_chunk_before_fmt():
    """RIFF permits any chunk order — a spec-legal WAV with the data chunk
    before fmt (or LIST chunks interleaved) must decode, not return
    None metadata."""
    import struct

    import numpy as np

    samples = np.arange(8, dtype=np.int16)
    sr, ch = 8000, 1
    data = samples.tobytes()
    fmt = C._FMT.pack(b"fmt ", 16, 1, ch, sr, sr * 2, 2, 16)
    # data first, then an info LIST chunk, then fmt
    info = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    body = C._DATA.pack(b"data", len(data)) + data + info + fmt
    wav = C._RIFF.pack(b"RIFF", 4 + len(body), b"WAVE") + body
    sr2, ch2, out = C.decode_wav(wav)
    assert (sr2, ch2) == (sr, ch)
    assert np.array_equal(out, samples)

    # fmt missing entirely -> the documented ValueError, not a TypeError
    body = C._DATA.pack(b"data", len(data)) + data
    wav = C._RIFF.pack(b"RIFF", 4 + len(body), b"WAVE") + body
    import pytest

    with pytest.raises(ValueError, match="fmt"):
        C.decode_wav(wav)


def test_png_roundtrip_all_filters():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 3), (7, 4), (16, 16)]:
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for filters in (None, [0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            out = C.decode_png(C.encode_png(rgb, row_filters=filters))
            assert (out == rgb).all(), (h, w, filters)


def test_png_decode_matches_spec_transcription():
    """decode_png against an INDEPENDENT scalar unfilter transcribed
    straight from RFC 2083 §6 pseudocode — guards against a bug symmetric
    in encoder and decoder surviving the round-trip test."""
    import struct
    import zlib

    def ref_decode(payload):
        pos, idat, dims = 8, [], None
        while pos + 12 <= len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            if ctype == b"IHDR":
                w, h = struct.unpack_from(">II", payload, pos + 8)
                dims = (h, w)
            elif ctype == b"IDAT":
                idat.append(payload[pos + 8 : pos + 8 + ln])
            pos += 12 + ln
        h, w = dims
        raw = zlib.decompress(b"".join(idat))
        stride, bpp = w * 3, 3
        prev = [0] * stride
        out = []
        p = 0
        for _y in range(h):
            ft = raw[p]
            line = list(raw[p + 1 : p + 1 + stride])
            p += 1 + stride
            rec = [0] * stride
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0        # left
                b = prev[x]                                # up
                c = prev[x - bpp] if x >= bpp else 0       # upper-left
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) // 2
                else:  # Paeth, RFC 2083 §6.6 verbatim
                    pp = a + b - c
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) % 256
            out.append(rec)
            prev = rec
        return np.array(out, np.uint8).reshape(h, w, 3)

    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
    payload = C.encode_png(rgb, row_filters=[4, 3, 2, 1, 0])
    got = C.decode_png(payload)
    assert (got == ref_decode(payload)).all()
    assert (got == rgb).all()


def test_png_rejects_corruption_and_variants():
    rgb = np.zeros((2, 2, 3), np.uint8)
    good = C.encode_png(rgb)
    with pytest.raises(ValueError, match="not a PNG"):
        C.decode_png(b"BM" + good)
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        C.decode_png(bytes(bad))


def test_codec_fuzz_raises_only_valueerror():
    """Seeded mutation fuzz over all four container walks: corrupt
    payloads must surface as ValueError, never struct.error/zlib.error
    leaking out of a mapInPandas worker (fuzz-found on every decoder:
    header unpacks past truncation points)."""
    import random

    from util import mutate_payload

    rng = random.Random(7)
    payloads = {
        "bmp": C.synth_image(4),
        "png": C.synth_image_png(7),
        "wav": C.synth_audio(4),
        "frms": C.synth_video(5),
    }
    dec = {
        "bmp": C.decode_bmp,
        "png": C.decode_png,
        "wav": C.decode_wav,
        "frms": lambda p: [C.frame_count(p), list(C.iter_frames(p))],
    }
    for name, base in payloads.items():
        for trial in range(400):
            try:
                dec[name](mutate_payload(base, rng, trial))
            except ValueError:
                pass  # the one documented corrupt-input exception


def test_corrupt_media_edge_shapes_stay_valueerror():
    """Review-found corrupt shapes past the mutation vocabulary: a WAV
    claiming channels=0 must not divide-by-zero downstream; a frame
    whose magic is corrupted must not surface the top-level hook's
    NotImplementedError; a zero-frame container decodes to null dims."""
    import struct

    from airbyte_spark.ops.multimodal import _decode_frame

    samples = np.arange(8, dtype=np.int16)
    fmt = C._FMT.pack(b"fmt ", 16, 1, 0, 8000, 16000, 2, 16)  # channels=0
    data = C._DATA.pack(b"data", len(samples.tobytes())) + samples.tobytes()
    body = fmt + data
    wav = C._RIFF.pack(b"RIFF", 4 + len(body), b"WAVE") + body
    with pytest.raises(ValueError, match="channels"):
        C.decode_wav(wav)

    bad_frame = b"XX" + C.synth_image(3)[2:]  # corrupt BMP magic
    with pytest.raises(ValueError, match="signature"):
        _decode_frame(bad_frame)

    empty = b"FRMS" + struct.pack("<I", 0)
    assert C.frame_count(empty) == 0
    assert list(C.iter_frames(empty)) == []


def test_decode_image_dispatch():
    from airbyte_spark.ops.multimodal import decode_image

    rgb = C._synth_rgb(3)
    assert (decode_image(C.synth_image_png(3)) == rgb).all()
    assert (decode_image(C.synth_image(3)) == rgb).all()
    # JPEG now decodes for real (lossy: bounded error, exact dims)
    jr = decode_image(C.synth_image_jpeg(3))
    assert jr.shape == rgb.shape
    assert np.abs(jr.astype(int) - rgb.astype(int)).mean() < 32
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # truncated JPEG
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF0000WEBPVP8 " + b"\x00" * 16)  # WebP
