"""Self-describing synthetic media codec (SBM1 images / SVD1 videos).

The container ships no image/video libraries (PIL, libvips, ffmpeg), so the
multimodal operators define their own trivially-decodable raster container
and implement the REAL decode/resize/frame-sample paths against it — the
Spark-side plumbing (mapInPandas, Arrow batches, schemas, fan-out) is
identical to what a JPEG/H.264 path would use; only the per-batch codec
call differs.

Wire format (little-endian), 11-byte header followed by raw pixels:

    magic      4 bytes   b"SBM1" (still image) | b"SVD1" (multi-frame video)
    width      uint16
    height     uint16
    channels   uint8     1 (gray) or 3 (rgb)
    n_frames   uint16    1 for SBM1
    pixels     n_frames * height * width * channels bytes, frame-major,
               row-major within a frame

Synthesis (``synth_payload``) is a pure function of ``(doc_id, text)`` with
geometry formulas simple enough to restate in ANSI SQL, which is what lets
the driver oracle-check the decoded metadata end-to-end (DuckDB recomputes
width/height/frames/n_bytes from ``doc_id`` and ``octet_length(text)``):

    nb       = octet_length(text utf-8)
    is_video = doc_id % 5 == 0
    n_frames = 2 + doc_id % 3   if video else 1
    channels = 1 + 2 * (doc_id % 2)
    width    = 8 + nb % 24
    height   = 8 + (doc_id * 7) % 24
    pixels   = text bytes cycled to fill the raster (b"\\x00" if empty)
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_IMAGE = b"SBM1"
MAGIC_VIDEO = b"SVD1"
_HEADER = struct.Struct("<4sHHBH")
HEADER_LEN = _HEADER.size  # 11


def encode_media(pixels: np.ndarray) -> bytes:
    """(n_frames, height, width, channels) uint8 array -> container bytes."""
    if pixels.ndim != 4 or pixels.dtype != np.uint8:
        raise ValueError(f"expected 4-D uint8 array, got {pixels.shape} {pixels.dtype}")
    n_frames, height, width, channels = pixels.shape
    magic = MAGIC_IMAGE if n_frames == 1 else MAGIC_VIDEO
    return _HEADER.pack(magic, width, height, channels, n_frames) + pixels.tobytes()


def decode_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse and validate the header; raises ValueError on foreign payloads
    the way a real decoder rejects an unknown codec."""
    if len(payload) < HEADER_LEN:
        raise ValueError(f"payload too short for header: {len(payload)} bytes")
    magic, width, height, channels, n_frames = _HEADER.unpack_from(payload)
    if magic not in (MAGIC_IMAGE, MAGIC_VIDEO):
        raise ValueError(f"unsupported codec magic {magic!r}")
    expect = HEADER_LEN + n_frames * height * width * channels
    if len(payload) != expect:
        raise ValueError(
            f"corrupt payload: header promises {expect} bytes, got {len(payload)}"
        )
    return magic, width, height, channels, n_frames


def decode_media(payload: bytes) -> np.ndarray:
    """Container bytes -> (n_frames, height, width, channels) uint8 array."""
    _, width, height, channels, n_frames = decode_header(bytes(payload))
    body = np.frombuffer(payload, dtype=np.uint8, offset=HEADER_LEN)
    return body.reshape(n_frames, height, width, channels)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of every frame: (f, h, w, c) -> (f, height,
    width, c). Plain floor-scaled nearest neighbor: source index
    floor(i*src/dst), clamped. (Not PIL-equivalent — PIL NEAREST samples
    pixel centers; this codec is self-consistent and its oracles check
    geometry, so the simpler arithmetic is the contract.)"""
    _, src_h, src_w, _ = pixels.shape
    rows = np.minimum((np.arange(height) * src_h) // height, src_h - 1)
    cols = np.minimum((np.arange(width) * src_w) // width, src_w - 1)
    return pixels[:, rows[:, None], cols, :]


def synth_params(doc_id: int, n_text_bytes: int) -> tuple[int, int, int, int]:
    """(width, height, channels, n_frames) — MUST stay in lockstep with the
    SQL restatement in plans/contract_llm.py (multimodal oracles)."""
    width = 8 + n_text_bytes % 24
    height = 8 + (doc_id * 7) % 24
    channels = 1 + 2 * (doc_id % 2)
    n_frames = 2 + doc_id % 3 if doc_id % 5 == 0 else 1
    return width, height, channels, n_frames


def synth_payload(doc_id: int, text: str) -> bytes:
    """Deterministically render a document into a media payload: the utf-8
    bytes of the text, cycled to fill the raster."""
    raw = text.encode("utf-8") or b"\x00"
    width, height, channels, n_frames = synth_params(doc_id, len(text.encode("utf-8")))
    total = n_frames * height * width * channels
    reps = -(-total // len(raw))  # ceil
    body = np.frombuffer(raw * reps, dtype=np.uint8, count=total)
    return encode_media(body.reshape(n_frames, height, width, channels).copy())


# ------------------------------------------------------- audio (SAU1)
#
# Same philosophy as SBM1/SVD1 for the audio modality: a self-describing
# container with a trivially-decodable wire format, so the REAL decode /
# feature-extract paths (header parse, int16 PCM demux, per-channel
# signal stats) run against real bytes without torchaudio/ffmpeg.
#
#     magic        4 bytes   b"SAU1"
#     sample_rate  uint16
#     channels     uint8     1 (mono) or 2 (stereo), interleaved
#     n_samples    uint32    per channel
#     samples      n_samples * channels int16 LE, frame-interleaved
#
# Synthesis geometry (synth_audio_params / synth_audio_payload) is a pure
# function of (doc_id, text) kept SQL-restatable:
#
#     nb          = octet_length(text utf-8)       (>= 1 after padding)
#     sample_rate = 8000 + 4000 * (doc_id % 3)
#     channels    = 1 + doc_id % 2
#     n_samples   = 64 + nb % 192
#     sample j    = (byte[j % nb] - 128) * 256     (interleaved index j)

MAGIC_AUDIO = b"SAU1"
_AUDIO_HEADER = struct.Struct("<4sHBI")
AUDIO_HEADER_LEN = _AUDIO_HEADER.size  # 11


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_samples, channels) int16 array -> SAU1 container bytes."""
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError(
            f"expected 2-D int16 array, got {samples.shape} {samples.dtype}"
        )
    n_samples, channels = samples.shape
    return (
        _AUDIO_HEADER.pack(MAGIC_AUDIO, sample_rate, channels, n_samples)
        + samples.astype("<i2").tobytes()
    )


def decode_audio_header(payload: bytes) -> tuple[int, int, int]:
    """(sample_rate, channels, n_samples); raises ValueError on foreign
    or corrupt payloads like a real decoder."""
    if len(payload) < AUDIO_HEADER_LEN:
        raise ValueError(f"payload too short for header: {len(payload)} bytes")
    magic, sample_rate, channels, n_samples = _AUDIO_HEADER.unpack_from(payload)
    if magic != MAGIC_AUDIO:
        raise ValueError(f"unsupported codec magic {magic!r}")
    expect = AUDIO_HEADER_LEN + 2 * n_samples * channels
    if len(payload) != expect:
        raise ValueError(
            f"corrupt payload: header promises {expect} bytes, got {len(payload)}"
        )
    return sample_rate, channels, n_samples


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Container bytes -> (sample_rate, (n_samples, channels) int16)."""
    sample_rate, channels, n_samples = decode_audio_header(bytes(payload))
    body = np.frombuffer(payload, dtype="<i2", offset=AUDIO_HEADER_LEN)
    return sample_rate, body.reshape(n_samples, channels)


def synth_audio_params(doc_id: int, n_text_bytes: int) -> tuple[int, int, int]:
    """(sample_rate, channels, n_samples) — MUST stay in lockstep with
    the SQL restatement in plans/contract_llm.py (audio oracles)."""
    sample_rate = 8000 + 4000 * (doc_id % 3)
    channels = 1 + doc_id % 2
    n_samples = 64 + n_text_bytes % 192
    return sample_rate, channels, n_samples


def synth_audio_payload(doc_id: int, text: str) -> bytes:
    """Deterministically render a document into an SAU1 payload: utf-8
    bytes cycled over the interleaved sample stream, centered at 128 and
    scaled by 256 (full int16 span, integer-exact for the oracle)."""
    raw = text.encode("utf-8") or b"\x00"
    sample_rate, channels, n_samples = synth_audio_params(doc_id, len(text.encode("utf-8")))
    total = n_samples * channels
    reps = -(-total // len(raw))  # ceil
    body = np.frombuffer(raw * reps, dtype=np.uint8, count=total)
    samples = (body.astype(np.int16) - 128) * 256
    return encode_audio(samples.reshape(n_samples, channels), sample_rate)
