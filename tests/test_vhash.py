"""Video perceptual hash + near-dedup (operators/phash.py)."""

import numpy as np
import pytest

from hyper_spark.kernel.media import make_y4m, parse_y4m
from hyper_spark.operators.phash import (
    video_near_dedup,
    video_phash,
    video_phash_bits,
)


def _vid(g: int, n: int = 32, h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic smooth panning clip with a per-clip brightness
    envelope — motion-heavy on purpose (the adversarial case for
    frame sampling)."""
    r = np.random.default_rng(g)
    base = r.integers(0, 256, size=(h, w)).astype(np.float64)
    k = np.fft.rfft2(base)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    base = np.fft.irfft2(k * np.exp(-((fy**2 + fx**2) / 0.01)), s=(h, w))
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255
    frames = []
    for t in range(n):
        f = np.roll(base, t * (1 + g % 3), axis=1) * (
            0.7 + 0.3 * np.sin(2 * np.pi * t / n + g)
        )
        frames.append(np.clip(f, 0, 255))
    return np.stack(frames).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


class TestVideoPhashBits:
    def test_sampling_invariance_and_separation(self):
        vids = [_vid(g) for g in range(10)]
        h = [video_phash_bits(v.astype(np.float64)) for v in vids]
        for g, v in enumerate(vids):
            f = v.astype(np.float64)
            # Y4M luma round-trips byte-exact -> identical hash
            _, rt = parse_y4m(make_y4m(v))
            assert _ham(h[g], video_phash_bits(rt.astype(np.float64))) == 0
            assert _ham(h[g], video_phash_bits(f[::2])) <= 10
            assert _ham(h[g], video_phash_bits(f[::3])) <= 14
        cross = [
            _ham(h[a], h[b]) for a in range(10) for b in range(a + 1, 10)
        ]
        assert min(cross) >= 12
        assert video_phash_bits(np.zeros((0, 8, 8))) == 0


class TestVideoNearDedup:
    def test_clusters_sampled_copies(self, spark):
        rows = []
        for g in range(4):
            v = _vid(g)
            base = 10 * g
            rows.append((base, bytearray(make_y4m(v))))
            rows.append((base + 1, bytearray(make_y4m(v[::2]))))  # 2x sampled
            rows.append((base + 2, bytearray(make_y4m(v, fps=(30, 1)))))
        rows.append((99, bytearray(b"not a video")))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in video_near_dedup(df).collect()}
        assert 99 not in out
        for g in range(4):
            base = 10 * g
            assert (
                out[base]["cluster"]
                == out[base + 1]["cluster"]
                == out[base + 2]["cluster"]
                == base
            )
        assert {d for d, r in out.items() if r["keep"]} == {0, 10, 20, 30}

    def test_frame_step_and_distributed_matches_local(self, spark):
        vids = {g: _vid(g) for g in range(3)}
        rows = [(g, bytearray(make_y4m(v))) for g, v in vids.items()]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {
            r["doc_id"]: r["vhash"]
            for r in video_phash(df, frame_step=2).collect()
        }
        for g, v in vids.items():
            assert got[g] == video_phash_bits(v[::2].astype(np.float64))


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
