"""Perceptual hashing + banded Hamming near-dedup.

Oracles: a brute-force O(n²) Hamming scan in Python (independent of
the banded multi-index), and pHash invariance properties measured on
payloads synthesized by the repo's own codecs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.phash import (
    _decode_gray,
    hamming_pairs,
    image_phash,
    media_near_dedup,
    phash_bits,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _smooth(h=64, w=80, phase=0.0):
    yy, xx = np.mgrid[0:h, 0:w]
    g = (110 + 70 * np.sin(yy / 11.0 + phase) * np.cos(xx / 17.0)).clip(0, 255)
    g = g.astype(np.uint8)
    return np.stack(
        [g, (g * 0.9 + 10).astype(np.uint8), (g * 0.7 + 40).astype(np.uint8)],
        axis=2,
    )


def test_phash_invariance_properties():
    from hyper_spark.kernel.media import make_jpeg, make_png

    img = _smooth()
    h0 = phash_bits(_decode_gray(make_png(img)))
    # recompression (baseline, progressive, 4:2:0) stays within a few bits
    assert _ham(h0, phash_bits(_decode_gray(make_jpeg(img, quality=85)))) <= 8
    assert _ham(h0, phash_bits(_decode_gray(
        make_jpeg(img, quality=85, progressive=True, subsample=True)))) <= 8
    # global brightness shift: DC is excluded from the median, no flips
    bright = (img.astype(int) + 25).clip(0, 255).astype(np.uint8)
    assert _ham(h0, phash_bits(_decode_gray(make_png(bright)))) == 0
    # unrelated content is far away
    h1 = phash_bits(_decode_gray(make_png(_smooth(phase=2.2))))
    assert _ham(h0, h1) >= 16
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    assert _ham(h0, phash_bits(_decode_gray(make_png(noise)))) >= 16
    # undecodable payloads decode to None
    assert _decode_gray(b"not an image") is None
    assert _decode_gray(make_png(img)[:20]) is None


def _planted_hashes(n=220, seed=3):
    """Random 64-bit hashes plus planted near-pairs at distances 1-6."""
    rng = np.random.default_rng(seed)
    rows = []
    base = [int(x) for x in rng.integers(0, 1 << 63, n, dtype=np.int64)]
    for i, h in enumerate(base):
        rows.append((i, h))
    nid = n
    for d in (1, 2, 3, 4, 5, 6):
        h = base[d]
        flip = 0
        for b in rng.choice(64, d, replace=False):
            flip |= 1 << int(b)
        v = (h ^ flip)
        if v >= 1 << 63:
            v -= 1 << 64
        rows.append((nid, int(v)))
        nid += 1
    return rows


def _brute(rows, max_dist):
    out = set()
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1 :]:
            d = _ham(ha, hb)
            if d <= max_dist:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                out.add((a, b, d))
    return out


class TestHammingPairs:
    def test_matches_bruteforce_and_is_lossless(self, spark):
        rows = _planted_hashes()
        df = spark.createDataFrame(rows, "doc_id long, phash long")
        for max_dist in (2, 4, 6):
            got = {
                (r["id_a"], r["id_b"], r["dist"])
                for r in hamming_pairs(df, max_dist=max_dist).collect()
            }
            assert got == _brute(rows, max_dist), max_dist

    def test_null_hashes_skipped_and_guards(self, spark):
        df = spark.createDataFrame(
            [(1, 5), (2, None), (3, 5)], "doc_id long, phash long"
        )
        got = hamming_pairs(df, max_dist=1).collect()
        assert [(r["id_a"], r["id_b"], r["dist"]) for r in got] == [(1, 3, 0)]
        with pytest.raises(ValueError):
            hamming_pairs(df, max_dist=0)
        with pytest.raises(ValueError):
            hamming_pairs(df, max_dist=64)

    def test_capped_is_subset_and_plan_python_free(self, spark):
        rows = _planted_hashes(80)
        # boilerplate: many identical hashes -> one huge bucket
        rows += [(1000 + i, 12345) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, phash long")
        full = {
            (r["id_a"], r["id_b"]) for r in hamming_pairs(df, max_dist=3).collect()
        }
        capped = {
            (r["id_a"], r["id_b"])
            for r in hamming_pairs(df, max_dist=3, max_bucket=10).collect()
        }
        assert capped <= full
        assert len(capped) < len(full)  # the 30-dup bucket was dropped
        plan = (
            hamming_pairs(df, max_dist=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestMediaNearDedup:
    def test_clusters_recompressions_together(self, spark):
        from hyper_spark.kernel.media import make_jpeg, make_png

        a = _smooth()
        b = _smooth(phase=2.2)
        rows = [
            (0, bytearray(make_png(a))),
            (1, bytearray(make_jpeg(a, quality=88))),
            (2, bytearray(make_jpeg(a, quality=85, progressive=True))),
            (10, bytearray(make_png(b))),
            (11, bytearray(make_jpeg(b, quality=88, subsample=True))),
            (99, bytearray(b"not an image at all")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in media_near_dedup(
            df, max_dist=8).collect()}
        assert 99 not in out  # undecodable: no phash, excluded
        assert out[0]["cluster"] == out[1]["cluster"] == out[2]["cluster"] == 0
        assert out[10]["cluster"] == out[11]["cluster"] == 10
        keeps = {d for d, r in out.items() if r["keep"]}
        assert keeps == {0, 10}

    def test_string_ids_supported(self, spark):
        # image corpora key by URI as often as by number: the id column
        # must keep its input type through phash -> pairs -> clusters
        from hyper_spark.kernel.media import make_jpeg, make_png

        a = _smooth()
        rows = [
            ("s3://img/a.png", bytearray(make_png(a))),
            ("s3://img/a.jpg", bytearray(make_jpeg(a, quality=88))),
            ("junk", bytearray(b"nope")),
        ]
        df = spark.createDataFrame(rows, "doc_id string, payload binary")
        out = {r["doc_id"]: r for r in media_near_dedup(
            df, max_dist=8).collect()}
        assert "junk" not in out
        assert out["s3://img/a.png"]["cluster"] == "s3://img/a.jpg"
        assert out["s3://img/a.jpg"]["keep"]

    def test_image_phash_distributed_matches_local(self, spark):
        from hyper_spark.kernel.media import make_png

        imgs = {i: _smooth(phase=0.7 * i) for i in range(5)}
        rows = [(i, bytearray(make_png(img))) for i, img in imgs.items()]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r["phash"] for r in image_phash(df).collect()}
        for i, img in imgs.items():
            assert got[i] == phash_bits(_decode_gray(bytes(make_png(img))))
