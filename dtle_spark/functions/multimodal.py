"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` over bounded
batches. Three honesty tiers, all loud at their boundaries:

- **Full decode, REAL, pure stdlib**: PNG pixels (``decode_png`` —
  zlib inflate + all five scanline un-filters, 8-bit gray/RGB
  non-interlaced; plus filtered ``encode_png`` and real
  nearest-neighbor resize) and 16-bit PCM WAV samples (``decode_wav``
  + RMS features). No codec library needed.
- **Header tier, REAL**: JPEG/GIF/BMP dimensions and WAV properties
  via stdlib ``struct`` walks — the metadata extraction a corpus
  pipeline runs at scan time (dimension filters, format stats,
  corrupt-file screens) without touching pixel data.
- **Seams**: JPEG/palette-PNG pixel decode, compressed audio, and
  video frames raise ``NotImplementedError`` naming the library
  (PIL/ffmpeg, absent from this container) — never silent fakes.

Scale notes: payloads dominate row size, so (a) never shuffle the
payload column — extract features first, then join features back by id
if needed; (b) cap ``spark.sql.files.maxPartitionBytes`` /
``maxRecordsPerBatch`` so an Arrow batch of payloads fits executor
memory; (c) push payload-free predicates before the decode stage so
column pruning keeps the scan light; (d) header parsing reads only the
leading bytes — with a lazy/ranged storage layer it never fetches the
payload tail at all.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtle_spark.util import spread

MEDIA_COLUMNS = "payload binary, mime string"
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, width int, height int"
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Demo media table: utf-8 text bytes as the opaque payload."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


# --- real container-header parsers (pure stdlib) ----------------------

# JPEG start-of-frame markers that carry dimensions (C4=DHT, C8=JPG,
# CC=DAC are NOT frames)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_header(payload: bytes) -> dict | None:
    """Image container-header parse: format + pixel dimensions for
    PNG / JPEG / GIF / BMP, ``None`` if the magic is unrecognized.
    Raises ValueError on a recognized-but-truncated/corrupt header
    (a corrupt-file screen, not silent zeros)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("PNG: truncated or missing IHDR")
        w, h = struct.unpack(">II", payload[16:24])
        return {"format": "png", "width": w, "height": h}
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk the segment chain
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("JPEG: segment desync")
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI before any SOF
                break
            if marker in _JPEG_SOF:
                if pos + 9 > len(payload):
                    raise ValueError("JPEG: truncated SOF")
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"format": "jpeg", "width": w, "height": h}
            seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
            pos += 2 + seg_len
        raise ValueError("JPEG: no SOF marker found")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("GIF: truncated screen descriptor")
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h}
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("BMP: truncated header")
        dib = struct.unpack("<I", payload[14:18])[0]
        if dib >= 40:  # BITMAPINFOHEADER and successors: signed int32
            w, h = struct.unpack("<ii", payload[18:26])
            return {"format": "bmp", "width": w, "height": abs(h)}
        w, h = struct.unpack("<HH", payload[18:22])  # BITMAPCOREHEADER
        return {"format": "bmp", "width": w, "height": h}
    return None


def parse_wav_header(payload: bytes) -> dict | None:
    """RIFF/WAVE header parse: channels, sample rate, bit depth, and
    data-chunk byte length (-> duration) via a chunk walk. ``None`` if
    not RIFF/WAVE; ValueError on a corrupt chunk chain."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            if clen < 16 or pos + 8 + 16 > len(payload):
                raise ValueError("WAV: truncated fmt chunk")
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
            fmt = {"channels": channels, "sample_rate": rate, "bits": bits}
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV: no fmt chunk")
    frames = None
    if data_len is not None and fmt["channels"] and fmt["bits"]:
        frames = data_len // (fmt["channels"] * fmt["bits"] // 8)
    return {"format": "wav", **fmt, "n_frames": frames}


def make_wav(samples: list[int], sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Minimal REAL PCM WAV encoder (16-bit LE, stdlib struct/array):
    fixture generator for the decode round trip."""
    import array as _array

    data = _array.array("h", samples).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> dict:
    """REAL PCM WAV decoder (pure stdlib): chunk walk + 16-bit LE
    sample unpack. Compressed/float WAV raises loudly (the ffmpeg
    seam). Returns {sample_rate, channels, n_frames, samples: list[int]}
    with samples frame-major channel-interleaved."""
    import array as _array

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format tag={tag} bits={bits}: only 16-bit PCM decodes "
                    "without ffmpeg"
                )
            fmt = (channels, rate)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    channels, rate = fmt
    arr = _array.array("h")
    arr.frombytes(data[: len(data) - (len(data) % 2)])
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": len(arr) // max(channels, 1),
        "samples": arr.tolist(),
    }


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_frames long,"
    " duration_ms long, rms double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio feature extraction over PCM WAV
    payloads: rate/channels/frames/duration plus RMS amplitude
    (integer sum of squares, one sqrt at the end — deterministic)."""
    import math

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_wav(bytes(payload))
                n = len(d["samples"])
                ssq = sum(s * s for s in d["samples"])
                rows.append(
                    {
                        "doc_id": doc_id,
                        "sample_rate": d["sample_rate"],
                        "channels": d["channels"],
                        "n_frames": d["n_frames"],
                        "duration_ms": d["n_frames"] * 1000 // max(d["sample_rate"], 1),
                        "rms": math.sqrt(ssq / n) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=AUDIO_FEATURE_SCHEMA)


def make_png(width: int, height: int) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib/struct): 8-bit grayscale,
    deterministic pixel ramp. Test/fixture generator for the roundtrip
    gate — the parser must read back exactly what this writes."""
    if width < 1 or height < 1:
        raise ValueError("png dims must be positive")
    pixels = bytes(
        (x * 31 + y * 7) % 256 for y in range(height) for x in range(width)
    )
    return encode_png(width, height, 1, pixels, filter_type=0)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> dict:
    """REAL PNG decoder, pure stdlib (zlib inflate + per-scanline
    un-filtering with all five filter types: None/Sub/Up/Average/
    Paeth). Supports baseline non-interlaced 8-bit grayscale (color
    type 0) and RGB (type 2) — the honest subset implementable without
    a codec library; palette/alpha/16-bit/interlaced raise loudly.

    Returns {width, height, channels, pixels: bytes} with pixels in
    row-major channel-interleaved order (exactly the pre-filter
    scanline bytes)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={ctype} interlace={interlace}:"
                    " only 8-bit gray/RGB non-interlaced supported without PIL"
                )
            meta = (w, h, 1 if ctype == 0 else 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, ch = meta
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: IDAT length mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        row_start = y * (stride + 1)
        ft = raw[row_start]
        line = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG: unknown filter {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return {"width": w, "height": h, "channels": ch, "pixels": bytes(out)}


def encode_png(
    width: int, height: int, channels: int, pixels: bytes, filter_type: int = 0
) -> bytes:
    """REAL PNG encoder for 8-bit gray/RGB with a selectable scanline
    filter (0-4) — filters are applied for real, so decode_png's five
    un-filter paths have a genuine round-trip partner."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (rgb)")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, 0 if channels == 1 else 2, 0, 0, 0
    )
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        f = bytearray(line)
        if filter_type == 1:
            for i in range(channels, stride):
                f[i] = (line[i] - line[i - channels]) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                f[i] = (line[i] - prev[i]) & 0xFF
        elif filter_type == 3:
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                f[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                f[i] = (line[i] - _paeth(left, prev[i], ul)) & 0xFF
        elif filter_type != 0:
            raise ValueError(f"unknown filter {filter_type}")
        raw += bytes([filter_type]) + bytes(f)
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample (the real pixel work for the resize
    stage — PIL swaps in higher-quality kernels through the same
    contract)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = sy * width * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


def _decode_stub(payload: bytes, mime: str, validate_pixels: bool = False) -> dict:
    """Decode dispatch for the SCAN-TIER metadata pass: all recognized
    image containers (PNG included) go through the O(header-bytes)
    parse_image_header — the full PNG pixel decode (zlib inflate +
    per-byte un-filter, orders of magnitude more expensive) runs only
    when ``validate_pixels`` is set or in the pixel stages (resize)
    that actually need pixels (ADVICE r4). Unrecognized image
    containers and audio/video raise. Never silent wrong output."""
    if mime.startswith("image/"):
        data = bytes(payload)
        if validate_pixels and data[:8] == b"\x89PNG\r\n\x1a\n":
            d = decode_png(data)  # full pixel decode, validates IDAT
            return {
                "n_bytes": len(payload),
                "checksum": hashlib.md5(payload).hexdigest(),
                "width": d["width"],
                "height": d["height"],
            }
        feats = parse_image_header(data)
        if feats is None:
            raise NotImplementedError(
                f"unrecognized image container for {mime}; PIL decode plugs in here"
            )
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": feats["width"],
            "height": feats["height"],
        }
    if mime.startswith(("audio/", "video/")):
        raise NotImplementedError(
            f"codec for {mime} not available in this environment; "
            "plug ffmpeg decode here (WAV headers: parse_wav_header)"
        )
    digest = hashlib.md5(payload).hexdigest()
    hexpos = "0123456789abcdef"
    return {
        "n_bytes": len(payload),
        "checksum": digest,
        # fake dimensions derived from the digest (stands in for the
        # decoded image's width/height)
        "width": hexpos.index(digest[0]) * 16 + hexpos.index(digest[1]),
        "height": hexpos.index(digest[2]) * 16 + hexpos.index(digest[3]),
    }


def extract_features(media: DataFrame, validate_pixels: bool = False) -> DataFrame:
    """mapInPandas feature extraction over the payload column —
    Arrow-batched, schema-declared, partition-parallel. Metadata tier:
    header-parse only (O(header bytes) per doc); pass
    ``validate_pixels=True`` to opt in to full PNG IDAT validation."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), m, validate_pixels)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    # NOTE: real codec decode is CPU-bound -> spread(media) first; the
    # deterministic stub is cheap enough that worker startup would dominate
    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = "doc_id long, format string, width int, height int, n_bytes long"
MEDIA_COLUMNS_WITH_ID = "doc_id long, payload binary, mime string"


def synthesize_png_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-PNG media table: one make_png payload per id
    with dims (1 + id % 64, 1 + id*7 % 64). Encoding runs in
    mapInPandas — the same Arrow plumbing a production ingest uses."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids_,
                    "payload": [
                        make_png(int(1 + i % 64), int(1 + (i * 7) % 64)) for i in ids_
                    ],
                    "mime": "image/png",
                }
            )

    # PNG encoding is CPU-bound Python: spread the narrow id column so
    # a single-split parquet scan doesn't serialize the batch work
    return spread(ids.select(id_col)).mapInPandas(op, schema=MEDIA_COLUMNS_WITH_ID)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL header parse over image payloads: format +
    dimensions + byte size, no codec library. Raises (fails the task,
    not silently) on corrupt headers — the corrupt-file screen."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                feats = parse_image_header(data)
                if feats is None:
                    raise ValueError(f"doc {doc_id}: not a recognized image container")
                rows.append({"doc_id": doc_id, **feats, "n_bytes": len(data)})
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=IMAGE_FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, payload binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_payload binary"


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stage. PNG payloads resize FOR REAL: decode_png ->
    nearest-neighbor resample -> encode_png (pure stdlib end to end);
    other image containers raise (PIL.thumbnail plugs in through the
    same contract); non-image payloads keep the deterministic
    passthrough used by the plumbing tests."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                data = bytes(payload)
                if data[:8] == b"\x89PNG\r\n\x1a\n":
                    d = decode_png(data)
                    scale = min(1.0, max_side / max(d["width"], d["height"], 1))
                    nw = max(1, int(d["width"] * scale))
                    nh = max(1, int(d["height"] * scale))
                    px = (
                        d["pixels"]
                        if (nw, nh) == (d["width"], d["height"])
                        else resize_nearest(
                            d["pixels"], d["width"], d["height"], d["channels"], nw, nh
                        )
                    )
                    out.append(
                        {
                            "doc_id": doc_id,
                            "width": nw,
                            "height": nh,
                            "payload": encode_png(nw, nh, d["channels"], px),
                        }
                    )
                    continue
                if mime.startswith("image/"):
                    raise NotImplementedError(
                        f"resize for {mime} needs PIL; only PNG decodes here"
                    )
                feats = _decode_stub(data, mime)
                scale = min(1.0, max_side / max(feats["width"], feats["height"], 1))
                out.append(
                    {
                        "doc_id": doc_id,
                        "width": int(feats["width"] * scale),
                        "height": int(feats["height"] * scale),
                        "payload": data,  # opaque passthrough (non-image)
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame sampling stage: one output row per sampled frame
    (explode shape). The deterministic fake 'frame' is a payload slice;
    production plugs ffmpeg keyframe extraction into the same contract."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                if mime.startswith("video/"):
                    raise NotImplementedError("ffmpeg frame extraction not available here")
                data = bytes(payload)
                for i in range(0, max(len(data), 1), every_n_bytes):
                    rows.append(
                        {"doc_id": doc_id, "frame_idx": i // every_n_bytes,
                         "frame_payload": data[i : i + every_n_bytes]}
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Video tier: a REAL (if minimal) container — MJPN, length-prefixed PNG
# frames — so the frame-sampling plumbing (container walk, stride
# selection, per-frame header/pixel reuse of the PNG tier, Arrow
# batching) is genuinely exercised end-to-end. Compressed video
# (mp4/webm/...) remains the loud ffmpeg seam in _decode_stub; the
# pipeline shapes here are exactly what that decode would plug into.
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"MJPN"


def make_video(frames: list[bytes]) -> bytes:
    """Mux PNG frame payloads into the MJPN container:
    magic + u32 frame count + per frame (u32 length + bytes)."""
    out = [VIDEO_MAGIC, struct.pack(">I", len(frames))]
    for fr in frames:
        out.append(struct.pack(">I", len(fr)))
        out.append(fr)
    return b"".join(out)


def parse_video_header(payload: bytes) -> dict | None:
    """Container walk WITHOUT decoding any frame: frame count + byte
    offsets (O(frames) u32 reads, never touches frame bodies — the
    ranged-read economics of the image header tier).

    Returns None ONLY for a foreign container (no MJPN magic — the
    caller's ffmpeg seam); a payload that CLAIMS to be MJPN but is
    truncated or carries trailing bytes raises ValueError — that is
    data corruption, and pointing the operator at the codec seam would
    hide it."""
    data = bytes(payload)
    if len(data) < 8 or data[:4] != VIDEO_MAGIC:
        return None
    (n,) = struct.unpack(">I", data[4:8])
    offsets = []
    pos = 8
    for i in range(n):
        if pos + 4 > len(data):
            raise ValueError(f"truncated MJPN container at frame {i}")
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        if pos + 4 + ln > len(data):
            raise ValueError(f"truncated MJPN frame body at frame {i}")
        offsets.append((pos + 4, ln))
        pos += 4 + ln
    if pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after the declared "
            f"{n} MJPN frames"
        )
    return {"format": "mjpn", "n_frames": n, "offsets": offsets}


def sample_video_frames(
    payload: bytes, stride: int = 2, hdr: dict | None = None
) -> list[tuple[int, bytes]]:
    """Every ``stride``-th frame's bytes (frame 0 always included) —
    the keyframe-ish sampling a training pipeline runs before feature
    extraction. Seeks straight to the sampled offsets; skipped frames'
    bytes are never sliced out. Pass a pre-parsed ``hdr`` to skip the
    second container walk (the feature stage already has one)."""
    data = bytes(payload)
    if hdr is None:
        hdr = parse_video_header(data)
    if hdr is None:
        raise NotImplementedError(
            "unrecognized video container; ffmpeg demux plugs in here"
        )
    out = []
    for idx in range(0, hdr["n_frames"], stride):
        off, ln = hdr["offsets"][idx]
        out.append((idx, data[off:off + ln]))
    return out


VIDEO_FEATURE_SCHEMA = (
    "doc_id long, format string, n_frames int, frame_idx int,"
    " width int, height int"
)


def extract_video_frame_features(
    media: DataFrame, stride: int = 2
) -> DataFrame:
    """mapInPandas frame sampling: one output row per SAMPLED frame
    with its dimensions from the real PNG header parse — the
    explode-shaped stage a video corpus runs before per-frame models.
    Arrow-batched; payloads never shuffle (features only leave the
    stage)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)  # ONE copy; hdr walk runs once
                hdr = parse_video_header(data)
                if hdr is None:
                    raise NotImplementedError(
                        "unrecognized video container; ffmpeg demux plugs in here"
                    )
                for idx, fr in sample_video_frames(data, stride, hdr=hdr):
                    dims = parse_image_header(fr)
                    rows.append({
                        "doc_id": doc_id,
                        "format": hdr["format"],
                        "n_frames": hdr["n_frames"],
                        "frame_idx": idx,
                        "width": None if dims is None else dims["width"],
                        "height": None if dims is None else dims["height"],
                    })
            yield pd.DataFrame(
                rows, columns=["doc_id", "format", "n_frames", "frame_idx",
                               "width", "height"],
            )

    return media.mapInPandas(op, schema=VIDEO_FEATURE_SCHEMA)


def synthesize_video_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-video media table: per id, an MJPN container
    of (1 + id % 5) real PNG frames with dims
    (1 + (id * 31 + idx) % 64, 1 + (id * 17 + idx * 3) % 64)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                n = 1 + int(doc_id) % 5
                frames = [
                    make_png(1 + (int(doc_id) * 31 + i) % 64,
                             1 + (int(doc_id) * 17 + i * 3) % 64)
                    for i in range(n)
                ]
                payloads.append(make_video(frames))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "payload": payloads,
                "mime": ["video/x-mjpn"] * len(payloads),
            })

    return spread(ids.select(id_col)).mapInPandas(
        op, schema=MEDIA_COLUMNS_WITH_ID
    )
