"""Pure-stdlib/numpy media codecs — the real decode step behind the
multimodal plumbing.

The sandbox has no imaging/audio libraries, but two production formats are
simple enough to en/decode exactly with numpy alone:

* **BMP** (Windows bitmap, 24-bit uncompressed, bottom-up row order) —
  a 14-byte file header + 40-byte BITMAPINFOHEADER + 4-byte-aligned BGR
  rows. This is a real, widely-produced format (screenshots, sensors).
* **WAV** (RIFF/PCM, 16-bit little-endian) — the canonical uncompressed
  audio container.
* **FRMS** — a minimal length-prefixed multi-frame container (the shape of
  MJPEG-in-AVI: magic + frame count + per-frame byte length + payload,
  each frame itself a BMP). Gives frame-sampling real bytes to walk.

Everything here is bytes→numpy→bytes with no per-row Python in the Spark
plan: the mapInPandas stages in ``multimodal.py`` call these per payload
inside Arrow-batched workers.

Synthesis (`synth_*`) is DETERMINISTIC in ``doc_id`` — every derived
integer feature (width, height, sample rate, frame count, …) is a
closed-form function of doc_id, so a SQL oracle can verify the DECODED
values without being able to decode the bytes itself.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- BMP

_BMP_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, px offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP from an (h, w, 3) uint8 RGB array."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    # BMP stores BGR, bottom-up
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, row_bytes * h, 2835, 2835, 0, 0)
    offset = _BMP_HDR.size + len(info)
    hdr = _BMP_HDR.pack(b"BM", offset + row_bytes * h, 0, 0, offset)
    return hdr + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP back to (h, w, 3) uint8 RGB."""
    magic, _, _, _, offset = _BMP_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _, bpp, comp, *_rest) = _BMP_INFO.unpack_from(
        payload, _BMP_HDR.size
    )
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=offset
    ).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def resize_nearest(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — pure-index numpy, no interpolation libs."""
    h, w, _ = rgb.shape
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return rgb[yi][:, xi]


# ----------------------------------------------------------------- WAV

_RIFF = struct.Struct("<4sI4s")
_FMT = struct.Struct("<4sIHHIIHH")
_DATA = struct.Struct("<4sI")


def encode_wav(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """RIFF/PCM-16 WAV from an int16 array of interleaved samples."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    data = samples.tobytes()
    block = channels * 2
    fmt = _FMT.pack(
        b"fmt ", 16, 1, channels, sample_rate, sample_rate * block, block, 16
    )
    body = fmt + _DATA.pack(b"data", len(data)) + data
    return _RIFF.pack(b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode PCM-16 WAV → (sample_rate, channels, int16 samples)."""
    magic, _, wave = _RIFF.unpack_from(payload, 0)
    if magic != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV payload")
    # walk ALL chunks before returning: RIFF permits any chunk order
    # (data before fmt, LIST/INFO interleaved), so returning at the first
    # data chunk could yield sample_rate/channels = None
    pos, sample_rate, channels, samples = _RIFF.size, None, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate, _byte_rate, bits = struct.unpack_from(
                "<HHIIxxH", payload, pos + 8
            )
            if fmt_tag != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (PCM-16 only)")
        elif cid == b"data":
            samples = np.frombuffer(payload, np.int16, clen // 2, pos + 8)
        pos += 8 + clen + (clen & 1)  # RIFF chunks are 2-byte aligned
    if samples is None:
        raise ValueError("WAV data chunk not found")
    if sample_rate is None:
        raise ValueError("WAV fmt chunk not found")
    return sample_rate, channels, samples


# --------------------------------------------- FRMS multi-frame container


def encode_frames(frames: list[bytes]) -> bytes:
    """Length-prefixed frame container: b'FRMS' + u32 count + per-frame
    (u32 length + payload) — the walkable shape of MJPEG-in-AVI."""
    out = [b"FRMS", struct.pack("<I", len(frames))]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def frame_count(payload: bytes) -> int:
    if payload[:4] != b"FRMS":
        raise ValueError("not a FRMS payload")
    return struct.unpack_from("<I", payload, 4)[0]


def iter_frames(payload: bytes, stride: int = 1):
    """Walk the container, yielding (frame_idx, frame_bytes) for every
    ``stride``-th frame — offsets are skipped without decoding, so sampling
    1-in-N frames reads headers only for the N-1 skipped."""
    n = frame_count(payload)
    pos = 8
    for i in range(n):
        (ln,) = struct.unpack_from("<I", payload, pos)
        if i % stride == 0:
            yield i, payload[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


# ------------------------------------------------- deterministic synthesis
#
# Every shape parameter below is a closed-form function of doc_id; the SQL
# oracle recomputes them (``__spark_entry__.oracle_sql`` multimodal_decode)
# to verify the decoded values end-to-end.


def synth_image_dims(doc_id: int) -> tuple[int, int]:
    return 6 + doc_id % 7, 8 + doc_id % 9  # (height, width)


def synth_image(doc_id: int) -> bytes:
    h, w = synth_image_dims(doc_id)
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [
            (x * 7 + doc_id) % 256,
            (y * 11 + doc_id * 3) % 256,
            (x + y + doc_id * 5) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    return encode_bmp(rgb)


def synth_audio_params(doc_id: int) -> tuple[int, int, int]:
    """(sample_rate, n_samples, channels) — rate keys on doc_id//3 so it
    still varies across rows whose kind (keyed on doc_id%3) is fixed."""
    return (
        8000 * (1 + (doc_id // 3) % 3),
        400 + (doc_id * 37) % 800,
        1 + doc_id % 2,
    )


def synth_audio(doc_id: int) -> bytes:
    sample_rate, n, channels = synth_audio_params(doc_id)
    t = np.arange(n * channels)
    samples = (((t * (1 + doc_id % 13)) % 2048) - 1024).astype(np.int16)
    return encode_wav(samples, sample_rate, channels)


def synth_video_frames(doc_id: int) -> int:
    return 2 + doc_id % 5


def synth_video(doc_id: int) -> bytes:
    return encode_frames(
        [synth_image(doc_id + k) for k in range(synth_video_frames(doc_id))]
    )
