"""Pure-numpy RIFF/WAV encode/decode (public format, no external libs).

Supports PCM signed 16-bit little-endian (``pcm_s16le``, WAVE format tag 1)
and IEEE float32 (``pcm_f32le``, format tag 3) mono payloads — the codecs
of the input_hint table. Used by both the datagen (encode) and the
vectorized decode kernel (decode); the pytest fidelity oracle decodes
independently with the stdlib ``wave`` module (tests/test_fidelity.py).
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1
_FMT_FLOAT = 3

CODEC_S16 = "pcm_s16le"
CODEC_F32 = "pcm_f32le"


def encode_wav(pcm: np.ndarray, sr_hz: int, codec: str = CODEC_S16) -> bytes:
    """Encode float32 PCM in [-1, 1] to a mono WAV container."""
    pcm = np.asarray(pcm, dtype=np.float32)
    if codec == CODEC_S16:
        fmt_tag, bits = _FMT_PCM, 16
        data = (np.clip(pcm, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    elif codec == CODEC_F32:
        fmt_tag, bits = _FMT_FLOAT, 32
        data = pcm.astype("<f4").tobytes()
    else:
        raise ValueError(f"unsupported codec: {codec}")
    block_align = bits // 8
    byte_rate = sr_hz * block_align
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt_tag, 1, sr_hz, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono WAV blob to (float32 PCM in [-1, 1], sample_rate)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt_tag = bits = sr_hz = None
    data = None
    n = len(raw)
    while pos + 8 <= n:
        cid = raw[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt_tag, channels, sr_hz = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if channels != 1:
                raise ValueError(f"only mono supported, got {channels} channels")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_tag is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag == _FMT_PCM and bits == 16:
        pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    elif fmt_tag == _FMT_FLOAT and bits == 32:
        pcm = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported wav format tag={fmt_tag} bits={bits}")
    return pcm, int(sr_hz)
