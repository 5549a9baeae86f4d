"""WAV codec + per-row decode fidelity (FIXTURES.md F2; north_rule
invariant: decoded-PCM SNR >= 30 dB vs an independent oracle decode,
transcript byte-equality after round-trip)."""

import io
import struct
import wave

import numpy as np
import pytest

from entity_deduplication_spark.audio.wav import (
    CODEC_F32,
    CODEC_S16,
    decode_wav,
    encode_wav,
)


def _oracle_decode_s16(raw: bytes) -> tuple[np.ndarray, int]:
    """Independent decode via the stdlib wave module."""
    with wave.open(io.BytesIO(raw)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        sr = w.getframerate()
        data = w.readframes(w.getnframes())
    return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0, sr


def _oracle_decode_f32(raw: bytes) -> tuple[np.ndarray, int]:
    """Independent minimal RIFF parse for float32 (wave can't read fmt=3)."""
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    pos, sr, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", raw, pos + 4)
        if cid == b"fmt ":
            _, _, sr = struct.unpack_from("<HHI", raw, pos + 8)
        elif cid == b"data":
            data = raw[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    return np.frombuffer(data, dtype="<f4").copy(), sr


def snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    noise = ref - out
    p_sig = float(np.mean(ref**2)) + 1e-20
    p_noise = float(np.mean(noise**2)) + 1e-20
    return 10 * np.log10(p_sig / p_noise)


@pytest.mark.parametrize("sr", [8000, 16000, 44100])
def test_s16_roundtrip_vs_stdlib_oracle(sr):
    rng = np.random.default_rng(7)
    pcm = (rng.uniform(-0.9, 0.9, sr // 2)).astype(np.float32)
    raw = encode_wav(pcm, sr, CODEC_S16)
    ours, sr1 = decode_wav(raw)
    oracle, sr2 = _oracle_decode_s16(raw)
    assert sr1 == sr2 == sr
    np.testing.assert_allclose(ours, oracle, atol=0)
    assert snr_db(pcm, ours) >= 30.0  # 16-bit quantization ~ 90 dB


def test_f32_roundtrip_exact():
    rng = np.random.default_rng(8)
    pcm = rng.uniform(-1, 1, 4000).astype(np.float32)
    raw = encode_wav(pcm, 16000, CODEC_F32)
    ours, sr = decode_wav(raw)
    oracle, sr2 = _oracle_decode_f32(raw)
    assert sr == sr2 == 16000
    np.testing.assert_array_equal(ours, pcm)
    np.testing.assert_array_equal(ours, oracle)


def test_edge_cases():
    # silence, full-scale, shortest clip
    for pcm in [np.zeros(10, np.float32), np.ones(10, np.float32), np.float32([0.5])]:
        out, _ = decode_wav(encode_wav(pcm, 8000, CODEC_S16))
        np.testing.assert_allclose(out, pcm, atol=1.0 / 32767)


def test_datagen_fidelity_cases(spark):
    """~50 datagen rows: pipeline decode UDF vs oracle, SNR >= 30 dB and
    transcript byte-equality through the Spark round-trip."""
    from pyspark.sql import functions as F

    from entity_deduplication_spark.audio.decode import decode_pcm_udf
    from entity_deduplication_spark.datagen import generate_clips

    clips, _ = generate_clips(50, seed=99)
    sdf = spark.createDataFrame(clips)
    rows = sdf.select("clip_id", "codec", "bytes",
                      decode_pcm_udf(F.col("bytes")).alias("pcm")).collect()
    assert len(rows) == 50
    for r in rows:
        oracle, _ = (
            _oracle_decode_s16(bytes(r["bytes"]))
            if r["codec"] == CODEC_S16
            else _oracle_decode_f32(bytes(r["bytes"]))
        )
        ours = np.asarray(r["pcm"], dtype=np.float32)
        assert snr_db(oracle, ours) >= 30.0
    # transcript byte-equality after the Spark round-trip
    back = sdf.select("clip_id", "transcript").toPandas().set_index("clip_id")
    orig = clips.set_index("clip_id")
    assert (back["transcript"] == orig["transcript"]).all()
