"""Pure-numpy media codecs: byte-exact round-trips + analytic checks,
and the distributed decode operators over synthesized payloads."""

from __future__ import annotations

import numpy as np
import pytest

from hyper_spark.kernel.media import (
    make_bmp,
    make_ppm,
    make_wav,
    parse_bmp,
    parse_ppm,
    parse_wav,
    resize_nn,
)


def test_wav_roundtrip_all_depths():
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.9, 0.9, size=(500, 2))
    for bits, tol in ((8, 1 / 120), (16, 1 / 30000), (32, 1e-9)):
        rate, back = parse_wav(make_wav(x, 8000, bits=bits))
        assert rate == 8000 and back.shape == (500, 2)
        assert np.abs(back - x).max() < tol
    # mono 1-D input, odd length (word-aligned chunk padding)
    rate, back = parse_wav(make_wav(x[:333, 0], 44100, bits=16))
    assert rate == 44100 and back.shape == (333, 1)


def test_wav_analytic_sine():
    # full periods of a sine: rms == A/sqrt(2) up to 16-bit quantization
    rate, amp, periods, n = 8000, 0.5, 10, 8000
    t = np.arange(n) / n
    rate_, s = parse_wav(make_wav(amp * np.sin(2 * np.pi * periods * n * t / n), rate))
    rms = float(np.sqrt(np.mean(s**2)))
    assert abs(rms - amp / np.sqrt(2)) < 1e-4
    assert s.shape == (n, 1) and rate_ == rate


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        parse_wav(b"definitely not riff data")


def test_ppm_pgm_roundtrip_and_comments():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    np.testing.assert_array_equal(parse_ppm(make_ppm(rgb)), rgb)
    gray = rng.integers(0, 256, size=(9, 4), dtype=np.uint8)
    np.testing.assert_array_equal(parse_ppm(make_ppm(gray)), gray)
    # header comments are legal PPM
    blob = b"P6\n# a comment line\n23 17\n255\n" + rgb.tobytes()
    np.testing.assert_array_equal(parse_ppm(blob), rgb)


def test_bmp_roundtrip_padding_and_orientation():
    rng = np.random.default_rng(7)
    for w in (4, 5, 6, 7):  # every row-padding residue 0..3
        rgb = rng.integers(0, 256, size=(3, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(parse_bmp(make_bmp(rgb)), rgb)


def test_resize_nn():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nn(arr, 2, 2)
    np.testing.assert_array_equal(out, [[5, 7], [13, 15]])
    up = resize_nn(arr, 8, 8)
    assert up.shape == (8, 8) and up[0, 0] == arr[0, 0] and up[-1, -1] == arr[-1, -1]


def _payload_rows():
    rng = np.random.default_rng(11)
    rows = []
    for i in range(6):
        n = 400 + 100 * i
        wav = make_wav(0.4 * np.sin(2 * np.pi * 5 * np.arange(n) / n), 4000 + i)
        rows.append((100 + i, bytearray(wav)))
    for i in range(4):
        img = rng.integers(0, 256, size=(8 + i, 11, 3), dtype=np.uint8)
        rows.append((200 + i, bytearray(make_ppm(img))))
        rows.append((300 + i, bytearray(make_bmp(img))))
    rows.append((999, bytearray(b"\x89PNG garbage payload")))
    return rows


def test_media_info_and_decoder_distributed(spark):
    from hyper_spark.operators.multimodal import decode_features, media_decoder, media_info

    df = spark.createDataFrame(
        _payload_rows(), "doc_id long, payload binary"
    ).repartition(3)
    info = {r["doc_id"]: r for r in media_info(df).collect()}
    for i in range(6):
        r = info[100 + i]
        assert r["format"] == "wav" and r["sample_rate"] == 4000 + i
        assert r["n_samples"] == 400 + 100 * i and r["channels"] == 1
        assert r["bits"] == 16 and r["width"] is None
    for i in range(4):
        assert info[200 + i]["format"] == "ppm"
        assert (info[200 + i]["width"], info[200 + i]["height"]) == (11, 8 + i)
        assert info[300 + i]["format"] == "bmp"
        assert (info[300 + i]["width"], info[300 + i]["height"]) == (11, 8 + i)
    assert info[999]["format"] == "unknown" and info[999]["sample_rate"] is None

    feats = {
        r["doc_id"]: np.array(r["features"])
        for r in decode_features(df, decoder=media_decoder).collect()
    }
    assert all(v.shape == (16,) for v in feats.values())
    # audio: duration and rms are the analytic values
    for i in range(6):
        f = feats[100 + i]
        n, rate = 400 + 100 * i, 4000 + i
        assert abs(f[0] - n / rate) < 1e-6
        assert abs(f[1] - 0.4 / np.sqrt(2)) < 1e-3
    # same image through ppm and bmp containers -> identical features
    for i in range(4):
        np.testing.assert_allclose(feats[200 + i], feats[300 + i], atol=1e-6)
    # unknown payload takes the byte-histogram fallback (sums to 1)
    assert abs(feats[999].sum() - 1.0) < 1e-6


def test_y4m_roundtrip_and_guards():
    from hyper_spark.kernel.media import make_y4m, parse_y4m

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    fps, back = parse_y4m(make_y4m(frames, fps=(30, 1)))
    assert fps == (30, 1)
    np.testing.assert_array_equal(back, frames)
    with pytest.raises(ValueError):
        make_y4m(frames[:, :5, :])  # odd height
    with pytest.raises(ValueError):
        parse_y4m(b"not a stream")


def test_video_ops_distributed(spark):
    from hyper_spark.kernel.media import make_y4m
    from hyper_spark.operators.multimodal import (
        decode_features,
        media_decoder,
        media_info,
        video_frame_stats,
    )

    rows = []
    for d in range(3):
        lumas = [(d * 7 + i * 13) % 256 for i in range(2 + d)]
        frames = np.stack(
            [np.full((6, 8), v, dtype=np.uint8) for v in lumas]
        )
        rows.append((d, bytearray(make_y4m(frames, fps=(24, 1)))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(2)

    info = {r["doc_id"]: r for r in media_info(df).collect()}
    for d in range(3):
        r = info[d]
        assert r["format"] == "y4m" and r["n_samples"] == 2 + d
        assert (r["width"], r["height"]) == (8, 6) and r["sample_rate"] == 24

    stats = {
        (r["doc_id"], r["frame_idx"]): r
        for r in video_frame_stats(df, every_nth=2).collect()
    }
    for d in range(3):
        for i in range(0, 2 + d, 2):
            r = stats[(d, i)]
            assert r["mean_luma"] == float((d * 7 + i * 13) % 256)
            assert r["std_luma"] == 0.0
    assert (0, 1) not in stats  # every_nth=2 skips odd frames

    f = {r["doc_id"]: np.array(r["features"])
         for r in decode_features(df, decoder=media_decoder).collect()}
    # doc 2: 4 frames of luma 14, 27, 40, 53 -> overall mean 33.5
    assert abs(f[2][4] - 33.5 / 255.0) < 1e-6
    assert abs(f[2][1] - 24.0) < 1e-6  # fps slot
    assert abs(f[2][6] - 13 / 255.0) < 1e-6  # constant motion delta
