"""Pure-stdlib/numpy media codecs — the real decode step behind the
multimodal plumbing.

The sandbox has no imaging/audio libraries, but two production formats are
simple enough to en/decode exactly with numpy alone:

* **BMP** (Windows bitmap, 24-bit uncompressed, bottom-up row order) —
  a 14-byte file header + 40-byte BITMAPINFOHEADER + 4-byte-aligned BGR
  rows. This is a real, widely-produced format (screenshots, sensors).
* **PNG** (RFC 2083, 8-bit truecolor non-interlaced) — CRC-checked
  chunk walk, stdlib-zlib inflate, and all five scanline unfilters
  (None/Sub/Up/Average/Paeth) in numpy. The ubiquitous lossless web
  format, decoded for real.
* **JPEG** (baseline sequential, sibling module ``jpeg.py``) — the lossy
  DCT format, also decoded for real (Huffman entropy decode, dequant,
  IDCT, chroma upsampling); only codec-library formats (WebP/MP3/H.264)
  remain behind the documented production hook.
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
import zlib

import numpy as np


def _unpack(st, data, off: int = 0):
    """unpack_from (Struct instance or format string) that reports
    truncated/malformed payloads as ValueError — the one corrupt-input
    exception type a mapInPandas decode stage lets through — instead of
    leaking struct.error (fuzz-found on all four container walks)."""
    try:
        if isinstance(st, struct.Struct):
            return st.unpack_from(data, off)
        return struct.unpack_from(st, data, off)
    except struct.error as e:
        raise ValueError(f"payload truncated/malformed: {e}") from None

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
    magic, _, _, _, offset = _unpack(_BMP_HDR, payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _, bpp, comp, *_rest) = _unpack(
        _BMP_INFO, payload, _BMP_HDR.size
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


# ----------------------------------------------------------------- PNG
#
# Real PNG (RFC 2083): 8-bit truecolor (color type 2), non-interlaced —
# the ubiquitous variant — with ALL FIVE scanline filters implemented.
# Needs only stdlib zlib + numpy: IHDR/IDAT/IEND chunk walk with CRC
# verification, inflate, per-row unfiltering.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_IHDR = struct.Struct(">IIBBBBB")


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6) over uint8 arrays: pick whichever
    of left/up/upper-left is closest to a+b-c, ties in that order."""
    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, c))
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def encode_png(rgb: np.ndarray, row_filters=None) -> bytes:
    """8-bit truecolor PNG from an (h, w, 3) uint8 RGB array.

    ``row_filters`` optionally cycles per-row filter types (0=None 1=Sub
    2=Up 3=Average 4=Paeth) — the synthesizer uses all five so the
    decoder's every unfilter path is exercised by real payloads; None
    writes filter 0 throughout (always valid)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = rgb.shape
    bpp = 3
    zeros = np.zeros(bpp, dtype=np.uint8)
    prev = np.zeros(w * bpp, dtype=np.uint8)
    scanlines = []
    for y in range(h):
        row = rgb[y].reshape(-1)
        ft = 0 if row_filters is None else int(row_filters[y % len(row_filters)])
        left = np.concatenate([zeros, row[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left  # uint8 arithmetic wraps mod 256 per spec
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            avg = ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2)
            filt = row - avg.astype(np.uint8)
        elif ft == 4:
            ul = np.concatenate([zeros, prev[:-bpp]])
            filt = row - _paeth(left, prev, ul)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        scanlines.append(bytes([ft]) + filt.tobytes())
        prev = row
    ihdr = _IHDR.pack(w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(scanlines))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode 8-bit truecolor non-interlaced PNG to (h, w, 3) uint8 RGB:
    chunk walk (CRC-checked), zlib inflate, all five unfilters. Sub/Up
    unfilter vectorize (cumsum / add); Average/Paeth are sequential in x
    by definition, so those rows reconstruct pixel-at-a-time — the same
    data dependency every real decoder has."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, dims, idat = 8, None, []
    while pos + 12 <= len(payload):
        (ln,) = _unpack(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = _unpack(">I", payload, pos + 8 + ln)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = _unpack(_IHDR, data)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (8-bit truecolor, "
                    "non-interlaced only)"
                )
            dims = (h, w)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if dims is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    h, w = dims
    bpp, stride = 3, w * 3
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT stream corrupt: {e}") from None
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong length")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    z3 = np.zeros(bpp, np.uint8)
    for y in range(h):
        ft, row = int(arr[y, 0]), arr[y, 1:]
        if ft == 0:
            rec = row.copy()
        elif ft == 1:
            # Sub: recon[x] = raw[x] + recon[x-bpp] — a per-channel prefix
            # sum mod 256 (sum in uint32, mask back)
            px = row.reshape(w, bpp).astype(np.uint32)
            rec = (np.cumsum(px, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif ft == 2:
            rec = row + prev
        elif ft in (3, 4):
            rec = np.zeros(stride, np.uint8)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                left = rec[(x - 1) * bpp : x * bpp] if x else z3
                up = prev[s]
                if ft == 3:
                    avg = (
                        left.astype(np.uint16) + up.astype(np.uint16)
                    ) // 2
                    rec[s] = row[s] + avg.astype(np.uint8)
                else:
                    ul = prev[(x - 1) * bpp : x * bpp] if x else z3
                    rec[s] = row[s] + _paeth(left, up, ul)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, 3).copy()


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
    magic, _, wave = _unpack(_RIFF, payload, 0)
    if magic != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV payload")
    # walk ALL chunks before returning: RIFF permits any chunk order
    # (data before fmt, LIST/INFO interleaved), so returning at the first
    # data chunk could yield sample_rate/channels = None
    pos, sample_rate, channels, samples = _RIFF.size, None, None, None
    while pos + 8 <= len(payload):
        cid, clen = _unpack("<4sI", payload, pos)
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate, _byte_rate, bits = _unpack(
                "<HHIIxxH", payload, pos + 8
            )
            if fmt_tag != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (PCM-16 only)")
            if channels < 1 or sample_rate < 1:
                # a corrupt fmt chunk with channels=0 would otherwise
                # return "successfully" and divide-by-zero downstream in
                # the audio feature stages (fuzz-review-found)
                raise ValueError("WAV fmt chunk has invalid channels/rate")
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
    return _unpack("<I", payload, 4)[0]


def iter_frames(payload: bytes, stride: int = 1):
    """Walk the container, yielding (frame_idx, frame_bytes) for every
    ``stride``-th frame — offsets are skipped without decoding, so sampling
    1-in-N frames reads headers only for the N-1 skipped."""
    n = frame_count(payload)
    pos = 8
    for i in range(n):
        (ln,) = _unpack("<I", payload, pos)
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


def _synth_rgb(doc_id: int) -> np.ndarray:
    h, w = synth_image_dims(doc_id)
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (x * 7 + doc_id) % 256,
            (y * 11 + doc_id * 3) % 256,
            (x + y + doc_id * 5) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


def synth_image(doc_id: int) -> bytes:
    return encode_bmp(_synth_rgb(doc_id))


def synth_image_png(doc_id: int) -> bytes:
    """Same deterministic pixel grid as ``synth_image``, PNG-encoded with
    the filter type cycling 0→4 per row — every unfilter path in
    ``decode_png`` is exercised by real payloads, and the oracle's
    closed-form width/height stay format-independent."""
    return encode_png(_synth_rgb(doc_id), row_filters=[0, 1, 2, 3, 4])


def synth_image_jpeg(doc_id: int) -> bytes:
    """Same deterministic pixel grid, baseline-JPEG-encoded (ops.jpeg) —
    subsampling alternates 4:4:4 / 4:2:0 on doc_id//9 so both chroma
    geometries flow through the decode stage. Lossy, but the oracle's
    width/height contract is exact regardless."""
    from . import jpeg

    sub = "420" if (doc_id // 9) % 2 else "444"
    return jpeg.encode_jpeg(_synth_rgb(doc_id), quality=90, subsample=sub)


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
