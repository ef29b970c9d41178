"""Audio fingerprint + audio near-dedup (operators/phash.py).

Clips are deterministic broadband noise with per-group EQ and
envelope trajectories — the signal class the Haitsma-Kalker
construction is built for (narrowband stationary tones are the
documented weak case)."""

import numpy as np
import pytest

from hyper_spark.kernel.media import make_flac, make_wav
from hyper_spark.operators.phash import (
    _decode_mono,
    afp_bits,
    audio_fingerprint,
    audio_near_dedup,
)

RATE = 8000
N = 16000  # 2 s


def _clip(g: int) -> np.ndarray:
    r = np.random.default_rng(100 + g)
    x = r.standard_normal(N)
    k = np.fft.rfft(x)
    f = np.linspace(0, 1, k.size)
    shape = np.exp(-((f - (0.1 + 0.03 * (g % 9))) ** 2) / 0.01)
    y = np.fft.irfft(k * shape, N)
    t = np.arange(N) / RATE
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * (0.5 + 0.11 * g) * t + 0.3 * g))
    y = y * env
    return y / np.abs(y).max() * 0.8


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _i16(y: np.ndarray) -> np.ndarray:
    return np.clip(np.round(y * 32767), -32768, 32767).astype(np.int64)


class TestAfpBits:
    def test_invariances_and_separation(self):
        clips = [_clip(g) for g in range(12)]
        h = [afp_bits(c, RATE) for c in clips]
        for g, c in enumerate(clips):
            # uniform gain cancels exactly in the per-frame normalization
            assert _ham(h[g], afp_bits(c * 0.37, RATE)) == 0
            # 16-bit requantization moves a few marginal bits at most
            assert _ham(h[g], afp_bits(_i16(c) / 32767.0, RATE)) <= 8
        cross = [
            _ham(h[a], h[b])
            for a in range(12)
            for b in range(a + 1, 12)
        ]
        assert min(cross) >= 12  # unrelated content stays far
        assert afp_bits(np.zeros(N), RATE) == 0  # silence pins to 0

    def test_wav_and_flac_encodings_fingerprint_identically(self):
        # FLAC is lossless: the decoded samples equal the WAV's 16-bit
        # samples bit-for-bit, so the fingerprints must be IDENTICAL
        for g in range(4):
            s16 = _i16(_clip(g))
            wav = make_wav(s16 / 32768.0 * (32767 / 32768), RATE, bits=16)
            rate_w, mono_w = _decode_mono(make_wav(
                (s16 / 32768.0), RATE, bits=16))
            flac = make_flac(s16, RATE, bits=16)
            dec_f = _decode_mono(flac)
            assert dec_f is not None
            rate_f, mono_f = dec_f
            assert rate_f == RATE
            hw = afp_bits(mono_w, rate_w)
            hf = afp_bits(mono_f, rate_f)
            # scale differs by the int16 normalization convention only
            # (gain-invariant), so the bits agree exactly
            assert _ham(hw, hf) == 0
            assert wav != flac  # genuinely different containers

    def test_decode_mono_guards(self):
        assert _decode_mono(b"not audio") is None
        assert _decode_mono(b"fLaC" + b"\x00" * 3) is None


class TestAudioNearDedup:
    def test_clusters_reencodes_together(self, spark):
        rows = []
        for g in range(5):
            s16 = _i16(_clip(g))
            base = 10 * g
            rows.append((base, bytearray(make_wav(s16 / 32768.0, RATE))))
            rows.append(
                (base + 1, bytearray(make_wav(s16 / 32768.0 * 0.5, RATE)))
            )
            rows.append((base + 2, bytearray(make_flac(s16, RATE))))
        rows.append((99, bytearray(b"definitely not audio")))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in audio_near_dedup(df).collect()}
        assert 99 not in out
        for g in range(5):
            base = 10 * g
            assert out[base]["cluster"] == base
            assert out[base + 1]["cluster"] == base
            assert out[base + 2]["cluster"] == base
        keeps = {d for d, r in out.items() if r["keep"]}
        assert keeps == {0, 10, 20, 30, 40}

    def test_distributed_matches_local(self, spark):
        rows, expect = [], {}
        for g in range(4):
            s16 = _i16(_clip(g))
            blob = make_flac(s16, RATE)
            rows.append((g, bytearray(blob)))
            dec = _decode_mono(blob)
            expect[g] = afp_bits(dec[1], dec[0])
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
        assert got == expect

    def test_string_ids(self, spark):
        s16 = _i16(_clip(0))
        rows = [
            ("a.wav", bytearray(make_wav(s16 / 32768.0, RATE))),
            ("a.flac", bytearray(make_flac(s16, RATE))),
        ]
        df = spark.createDataFrame(rows, "doc_id string, payload binary")
        out = {r["doc_id"]: r for r in audio_near_dedup(df).collect()}
        assert out["a.wav"]["cluster"] == out["a.flac"]["cluster"] == "a.flac"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
