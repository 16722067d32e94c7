"""REAL media metadata extraction from binary columns — pure stdlib
byte/struct parsing of container headers, no codecs required (upgrades
the honest fake in ``stages/multimodal.py``: decode/resample still needs
PIL/ffmpeg, but format sniffing, image dimensions, audio sample
rate/channels/duration are fully real).

Formats: PNG (IHDR), GIF (87a/89a logical screen), BMP (BITMAPINFOHEADER),
JPEG (marker walk to SOF0/1/2), WAV (RIFF fmt/data chunks). Reference
analog: the OCR chain's per-file metadata probe before backend dispatch
(processors/ocr.py backend selection reads the file kind first).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

META_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("format", pa.string()),   # png|gif|bmp|jpeg|wav|unknown
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_channels", pa.int32()),
        ("sample_rate_hz", pa.int32()),
        ("bit_depth", pa.int32()),
        ("duration_ms", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_media_header(b: bytes) -> dict:
    """One payload → typed header metadata (None fields where the format
    doesn't carry them; format='unknown' on sniff/parse failure)."""
    out = {"format": "unknown", "width": None, "height": None,
           "n_channels": None, "sample_rate_hz": None, "bit_depth": None,
           "duration_ms": None, "n_bytes": len(b)}
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            out.update(format="png", width=w, height=h, bit_depth=b[24])
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            out.update(format="gif", width=w, height=h)
        elif b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            out.update(format="bmp", width=w, height=abs(h))
        elif b[:2] == b"\xff\xd8":
            # JPEG: walk marker segments to the first SOF
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in _SOF_MARKERS:
                    prec = b[i + 4]
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    out.update(format="jpeg", width=w, height=h,
                               bit_depth=prec, n_channels=b[i + 9])
                    break
                seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
                i += 2 + seg_len
            else:
                return out
            if out["format"] == "unknown":
                out["format"] = "jpeg"  # SOI present, SOF not found
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            rate = channels = bits = None
            data_size = None
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                size = struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and size >= 16:
                    channels, rate = struct.unpack("<HI", b[i + 10:i + 16])
                    bits = struct.unpack("<H", b[i + 22:i + 24])[0]
                elif cid == b"data":
                    data_size = size
                i += 8 + size + (size & 1)
            if rate:
                out.update(format="wav", n_channels=channels,
                           sample_rate_hz=rate, bit_depth=bits)
                if data_size is not None and channels and bits:
                    frames = data_size // (channels * (bits // 8))
                    out["duration_ms"] = int(frames * 1000 // rate)
    except (struct.error, IndexError):
        return {"format": "unknown", "width": None, "height": None,
                "n_channels": None, "sample_rate_hz": None,
                "bit_depth": None, "duration_ms": None, "n_bytes": len(b)}
    return out


class MediaMetaActor:
    """Actor-pool header-parse stage (stateless parse, but the actor shape
    matches the decode stages so a real codec can chain in __init__)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows = [parse_media_header(p or b"") for p in payloads]
        cols: dict = {"media_id": pa.array(ids, pa.string())}
        for f in list(META_SCHEMA)[1:]:
            cols[f.name] = pa.array([r[f.name] for r in rows], f.type)
        return pa.table(cols, schema=META_SCHEMA)


def extract_media_meta(media: Dataset, concurrency=None,
                       batch_size: int = 64) -> Dataset:
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, ncpu // 2))
    return media.map_batches(
        MediaMetaActor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------------------------------
# deterministic REAL-container synthetic corpus
# ---------------------------------------------------------------------------


def _png_bytes(w: int, h: int) -> bytes:
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def _bmp_bytes(w: int, h: int) -> bytes:
    row = (w * 3 + 3) & ~3
    size = 54 + row * h
    return (b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h,
                          2835, 2835, 0, 0) + bytes(row * h))


def _jpeg_bytes(w: int, h: int) -> bytes:
    sof = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
            + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xd9")


def _wav_bytes(rate: int, channels: int, bits: int, ms: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(bits // 8)
        wf.setframerate(rate)
        wf.writeframes(bytes(rate * ms // 1000 * channels * (bits // 8)))
    return buf.getvalue()


def synth_real_media(n: int, seed: int = 42) -> pa.Table:
    """REAL tiny container files (stdlib-built PNG/GIF/BMP/JPEG/WAV) with
    known header truths, plus junk payloads every 11th row."""
    rng = np.random.default_rng(seed)
    ids, payloads = [], []
    for i in range(n):
        ids.append(f"m-{i:05d}")
        if i % 11 == 10:
            payloads.append(rng.bytes(64))
            continue
        w, h = 10 + i % 50, 7 + i % 31
        kind = i % 5
        if kind == 0:
            payloads.append(_png_bytes(w, h))
        elif kind == 1:
            payloads.append(_gif_bytes(w, h))
        elif kind == 2:
            payloads.append(_bmp_bytes(w, h))
        elif kind == 3:
            payloads.append(_jpeg_bytes(w, h))
        else:
            payloads.append(_wav_bytes(8000, 1 + i % 2, 16, 100 + 10 * (i % 7)))
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
    })
