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


# ----------------------------------------------------------------- PNG/JPEG


def test_png_roundtrip_shapes():
    from hyper_spark.kernel.media import make_png, parse_png, png_info

    rng = np.random.default_rng(11)
    for shape in [(9, 7), (12, 5, 3), (6, 6, 4), (1, 1), (2, 300, 3)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = make_png(arr)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        np.testing.assert_array_equal(parse_png(blob), arr)
        w, h, depth, ch = png_info(blob)
        assert (h, w) == shape[:2] and depth == 8
        assert ch == (shape[2] if len(shape) == 3 else 1)


def test_png_all_filter_types_decode():
    """Hand-encode one row per filter type (None/Sub/Up/Average/Paeth)
    and check the decoder inverts each — make_png only emits filter 0,
    so this covers the paths real encoders use."""
    import struct
    import zlib

    from hyper_spark.kernel.media import parse_png

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    ch, stride = 3, 18
    prev = np.zeros(stride, np.int64)
    lines = []
    for r, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = arr[r].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = (cur - left) & 0xFF
        elif ftype == 2:
            enc = (cur - prev) & 0xFF
        elif ftype == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (cur - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(cid, body):
        return (
            struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(parse_png(blob), arr)


def test_png_rejects_unsupported():
    import struct
    import zlib

    from hyper_spark.kernel.media import make_png, parse_png, png_info

    with pytest.raises(ValueError):
        png_info(b"not a png at all----")
    # 16-bit depth: info parses it, full decode refuses
    def chunk(cid, body):
        return (
            struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    assert png_info(deep) == (2, 2, 16, 1)
    with pytest.raises(ValueError):
        parse_png(deep)
    # corrupt IDAT raises zlib.error (media_info/media_decoder catch it)
    good = bytearray(make_png(np.zeros((4, 4), np.uint8)))
    idat_at = bytes(good).index(b"IDAT")
    good[idat_at + 6] ^= 0xFF
    with pytest.raises(zlib.error):
        parse_png(bytes(good))


def test_jpeg_info_and_header_synth():
    from hyper_spark.kernel.media import jpeg_info, make_jpeg_header

    for w, h, c, prog in [(640, 480, 3, False), (31, 17, 1, True), (8192, 8192, 3, False)]:
        assert jpeg_info(make_jpeg_header(w, h, c, prog)) == (w, h, c, 8, prog)
    with pytest.raises(ValueError):
        jpeg_info(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        jpeg_info(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


def test_wav_info_chunk_walk():
    """bits must come from the fmt chunk wherever it sits — a JUNK
    chunk before fmt made the old fixed-offset read garbage
    (ADVICE r04)."""
    import struct

    from hyper_spark.kernel.media import make_wav, parse_wav, wav_info

    wav = make_wav(np.sin(np.arange(64) / 5.0), 22050, bits=8)
    junk = b"JUNK" + struct.pack("<I", 10) + b"0123456789"
    patched = (
        b"RIFF" + struct.pack("<I", 4 + len(junk) + len(wav) - 12) + b"WAVE"
        + junk + wav[12:]
    )
    assert wav_info(patched) == (1, 1, 22050, 8)
    rate, samples = parse_wav(patched)
    assert rate == 22050 and samples.shape == (64, 1)
    with pytest.raises(ValueError):
        wav_info(b"RIFF\x00\x00\x00\x00WAVEnope")


def test_media_info_png_jpeg_and_malformed(spark):
    from hyper_spark.kernel.media import make_bmp, make_jpeg_header, make_png
    from hyper_spark.operators.multimodal import media_decoder, media_info

    rng = np.random.default_rng(17)
    rows = []
    png_rgb = make_png(rng.integers(0, 256, (10, 14, 3), dtype=np.uint8))
    png_grey = make_png(rng.integers(0, 256, (5, 6), dtype=np.uint8))
    rows.append((1, bytearray(png_rgb)))
    rows.append((2, bytearray(png_grey)))
    rows.append((3, bytearray(make_jpeg_header(320, 200, 3))))
    rows.append((4, bytearray(make_jpeg_header(64, 48, 1, progressive=True))))
    # truncated BMP: magic passes, struct.unpack_from raises struct.error
    rows.append((5, bytearray(make_bmp(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))[:16])))
    # corrupt PNG IDAT: zlib.error inside parse (info path stays header-only)
    bad_png = bytearray(png_rgb)
    bad_png[bad_png.index(b"IDAT") + 6] ^= 0xFF
    rows.append((6, bad_png))

    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(2)
    info = {r["doc_id"]: r for r in media_info(df).collect()}
    assert info[1]["format"] == "png" and (info[1]["width"], info[1]["height"]) == (14, 10)
    assert info[1]["channels"] == 3 and info[1]["bits"] == 8
    assert info[2]["format"] == "png" and info[2]["channels"] == 1
    assert info[3]["format"] == "jpeg" and (info[3]["width"], info[3]["height"]) == (320, 200)
    assert info[4]["format"] == "jpeg" and info[4]["channels"] == 1
    # malformed payloads degrade to 'unknown', never fail the task
    assert info[5]["format"] == "unknown"
    assert info[6]["format"] == "png"  # header-only parse still fine

    # decoder: real PNG features equal the same pixels through BMP;
    # malformed payloads take the byte-histogram fallback
    px = rng.integers(0, 256, (9, 12, 3), dtype=np.uint8)
    feats = {}
    for did, blob in [(1, make_png(px)), (2, make_bmp(px)), (5, bytes(rows[4][1])), (6, bytes(bad_png))]:
        feats[did] = media_decoder(blob)
    np.testing.assert_allclose(feats[1], feats[2], atol=1e-6)
    assert abs(feats[5].sum() - 1.0) < 1e-6  # histogram fallback
    assert abs(feats[6].sum() - 1.0) < 1e-6  # zlib.error fallback


def test_image_features_zero_area_guard():
    from hyper_spark.kernel.media import make_png
    from hyper_spark.operators.multimodal import image_features, media_decoder

    blob = make_png(np.zeros((0, 5, 3), np.uint8))
    feats = image_features(blob)
    assert feats.shape == (16,) and not np.isnan(feats).any()
    out = media_decoder(blob)
    assert out.shape == (16,) and not np.isnan(out).any()


def test_flac_streaminfo_roundtrip():
    from hyper_spark.kernel.media import flac_info, make_flac_header

    for rate, ch, bits, total in [
        (44100, 2, 16, 10_000_000),
        (48000, 1, 24, 0),
        (8000, 8, 32, (1 << 36) - 1),
    ]:
        blob = make_flac_header(rate, ch, bits, total)
        assert flac_info(blob) == (rate, ch, bits, total)
    with pytest.raises(ValueError):
        flac_info(b"fLaX" + bytes(40))
    with pytest.raises(ValueError):  # vorbis-comment-first stream
        flac_info(b"fLaC" + bytes([0x84]) + (10).to_bytes(3, "big") + bytes(10))
    with pytest.raises(ValueError):
        make_flac_header(0, 2, 16, 0)


def test_gif_header_roundtrip():
    from hyper_spark.kernel.media import gif_info, make_gif_header

    assert gif_info(make_gif_header(640, 480)) == (640, 480, "89a")
    assert gif_info(make_gif_header(1, 65535, "87a")) == (1, 65535, "87a")
    for bad in (b"GIF90a" + bytes(8), b"PNG" + bytes(10),
                make_gif_header(1, 1)[:6] + b"\x00\x00\x00\x00"):
        with pytest.raises(ValueError):
            gif_info(bad)


def test_media_info_flac_gif_branches(spark):
    from hyper_spark.kernel.media import make_flac_header, make_gif_header
    from hyper_spark.operators.multimodal import media_info

    rows = [
        (0, bytearray(make_flac_header(22050, 2, 16, 4410))),
        (1, bytearray(make_gif_header(320, 200))),
        (2, bytearray(b"fLaC\x00\x00")),  # truncated: degrades to unknown
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in media_info(df).collect()}
    assert got[0]["format"] == "flac" and got[0]["sample_rate"] == 22050
    assert got[0]["n_samples"] == 4410 and got[0]["bits"] == 16
    assert got[1]["format"] == "gif" and (got[1]["width"], got[1]["height"]) == (320, 200)
    assert got[2]["format"] == "unknown"


def test_gif_full_roundtrip_and_lzw_spec_trace():
    from hyper_spark.kernel.media import (
        _lzw_decode,
        _lzw_encode,
        gif_info,
        make_gif,
        parse_gif,
    )

    # hand-derived spec trace (GIF89a §22, giflib width schedule):
    # pixels [1,1,1,1,1] at min_code=2 -> codes CLEAR(4,w3), 1(w3),
    # 6(w3, the KwKwK code), 6(w4 — table hit 2^3 entries), END(5,w4)
    # -> LSB-first bytes 8C AD 00. Validates the variable-width timing
    # against the published rules, not just self-consistency.
    assert _lzw_encode(np.array([1, 1, 1, 1, 1], dtype=np.uint8), 2) == bytes(
        [0x8C, 0xAD, 0x00]
    )
    assert list(_lzw_decode(bytes([0x8C, 0xAD, 0x00]), 2)) == [1, 1, 1, 1, 1]

    rng = np.random.default_rng(3)
    grey = (rng.integers(0, 5, (37, 53)) * 50).astype(np.uint8)
    blob = make_gif(grey)
    assert gif_info(blob) == (53, 37, "89a")
    assert np.array_equal(parse_gif(blob)[:, :, 0], grey)
    # max palette + long runs (KwKwK chains)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    rgb = pal[np.repeat(np.arange(256, dtype=np.uint8), 40).reshape(64, 160)]
    assert np.array_equal(parse_gif(make_gif(rgb)), rgb)
    # large random image forces 12-bit codes + a table-full CLEAR reset
    big = rng.integers(0, 256, (300, 400)).astype(np.uint8)
    assert np.array_equal(parse_gif(make_gif(big))[:, :, 0], big)
    # guards
    with pytest.raises(ValueError, match="256 distinct"):
        make_gif(rng.integers(0, 256, (40, 40, 3)).astype(np.uint8))
    with pytest.raises(ValueError, match="no image frame"):
        from hyper_spark.kernel.media import make_gif_header

        parse_gif(make_gif_header(4, 4))


def test_media_decoder_routes_gif_to_image_features():
    from hyper_spark.kernel.media import make_gif
    from hyper_spark.operators.multimodal import image_features, media_decoder

    img = (np.arange(1200, dtype=np.uint8).reshape(30, 40) % 200)
    blob = make_gif(img)
    feats = media_decoder(blob)
    assert feats.shape == (16,)
    assert np.allclose(feats, image_features(blob))
    # truncated GIF falls back to the byte histogram, never raises
    assert media_decoder(blob[:40]).shape == (16,)


def test_png_adam7_interlaced_decode():
    from hyper_spark.kernel.media import _ADAM7, make_png, parse_png

    # the pass table must reproduce the PNG spec's own 8x8 figure
    # (external check against the published geometry, not round-trip)
    tile = np.zeros((8, 8), dtype=int)
    for p, (r0, rs, c0, cs) in enumerate(_ADAM7, 1):
        tile[r0::rs, c0::cs] = p
    spec = np.array(
        [
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
        ]
    )
    assert np.array_equal(tile, spec)

    rng = np.random.default_rng(4)
    # odd sizes exercise empty passes and ragged pass widths
    for shape in [(13, 17), (13, 17, 3), (8, 8, 4), (1, 1), (9, 1, 3),
                  (1, 9), (3, 3), (16, 16, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(parse_png(make_png(img, interlace=True)), img)


# ------------------------------------------------- JPEG baseline codec


def _smooth_rgb(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (100 + 60 * np.sin(yy / 15.0) + 50 * np.cos(xx / 18.0)).astype(np.uint8)
    return np.stack(
        [base, (base * 0.8 + 30).astype(np.uint8), (base * 0.5 + 60).astype(np.uint8)],
        axis=2,
    )


def test_jpeg_full_roundtrip_smooth():
    from hyper_spark.kernel.media import make_jpeg, parse_jpeg

    img = _smooth_rgb()
    for q, tol in ((50, 12), (90, 5), (95, 4)):
        dec = parse_jpeg(make_jpeg(img, quality=q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol
    # greyscale: quantization error only, no chroma path
    dec = parse_jpeg(make_jpeg(img[:, :, 0], quality=90))
    assert dec.shape == (48, 64)
    assert np.abs(dec.astype(int) - img[:, :, 0].astype(int)).max() <= 2


def test_jpeg_constant_block_exact_arithmetic():
    # DC-only analytic check: a constant image decodes to EXACTLY
    # 128 + floor(8(v-128)/q00 + .5)*q00/8 (floor(+.5), clipped) —
    # validates the quant scaling, DCT norm, Huffman and zigzag wiring
    # against theory, not just self-consistency
    from hyper_spark.kernel.media import make_jpeg, parse_jpeg

    for v, q in ((40, 30), (200, 75), (128, 10), (67, 92), (255, 25), (0, 55)):
        dec = parse_jpeg(make_jpeg(np.full((16, 24), v, np.uint8), quality=q))
        scale = (5000 // q) if q < 50 else (200 - 2 * q)
        q00 = min(255, max(1, (16 * scale + 50) // 100))
        dc = np.floor(8 * (v - 128) / q00 + 0.5)
        exp = min(255, max(0, int(np.floor(128 + dc * q00 / 8.0 + 0.5))))
        u = np.unique(dec)
        assert u.size == 1 and u[0] == exp, (v, q, u, exp)


def test_jpeg_subsample_and_restart_markers():
    from hyper_spark.kernel.media import make_jpeg, parse_jpeg

    img = _smooth_rgb(40, 56)
    plain = parse_jpeg(make_jpeg(img, quality=88))
    sub = parse_jpeg(make_jpeg(img, quality=88, subsample=True))
    assert sub.shape == img.shape
    assert np.abs(sub.astype(int) - img.astype(int)).max() <= 8
    # restart markers change the byte stream but not the coefficients:
    # decode must be bit-identical with and without them
    rst = parse_jpeg(make_jpeg(img, quality=88, restart_interval=2))
    assert np.array_equal(rst, plain)
    rst420 = parse_jpeg(make_jpeg(img, quality=88, subsample=True, restart_interval=1))
    assert np.array_equal(rst420, sub)
    # odd dimensions exercise MCU padding + crop on both grids
    odd = _smooth_rgb(19, 21)
    assert parse_jpeg(make_jpeg(odd, quality=80, subsample=True)).shape == (19, 21, 3)
    assert parse_jpeg(make_jpeg(odd[:, :, 0], quality=80)).shape == (19, 21)


def test_jpeg_quality_scales_size():
    from hyper_spark.kernel.media import make_jpeg

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    s10, s50, s90 = (len(make_jpeg(noise, quality=q)) for q in (10, 50, 90))
    assert s10 < s50 < s90


def test_jpeg_parse_rejects_non_baseline():
    from hyper_spark.kernel.media import make_jpeg, make_jpeg_header, parse_jpeg

    with pytest.raises(ValueError):  # stub stream: SOF2 but no DHT
        parse_jpeg(make_jpeg_header(64, 48, 3, progressive=True))
    with pytest.raises(ValueError):  # stub entropy segment, baseline SOF0
        parse_jpeg(make_jpeg_header(64, 48, 3))
    with pytest.raises(ValueError):  # truncated entropy stream
        blob = make_jpeg(np.full((24, 24), 90, np.uint8), quality=85)
        parse_jpeg(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        parse_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        make_jpeg(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError):
        make_jpeg(np.zeros((4, 4, 2), np.uint8))


def test_jpeg_media_decoder_dispatch():
    from hyper_spark.kernel.media import make_jpeg, make_jpeg_header
    from hyper_spark.operators.multimodal import (
        fake_decoder,
        image_features,
        media_decoder,
    )

    img = _smooth_rgb(32, 32)
    blob = make_jpeg(img, quality=90)
    feats = media_decoder(blob)
    assert feats.shape == (16,)
    assert np.allclose(feats, image_features(blob))
    # decoded mean tracks the source image (real decode, not a hash)
    assert abs(feats[3] - img[:, :, 0].mean() / 255.0) < 0.02
    # a header-only stub (no Huffman tables, fake entropy segment)
    # falls back to the byte histogram
    stub = make_jpeg_header(64, 48, 3, progressive=True)
    assert np.allclose(media_decoder(stub), fake_decoder(stub))


# --------------------------------------------------------- FLAC codec


def test_flac_lossless_roundtrip_all_modes():
    from hyper_spark.kernel.media import flac_info, make_flac, parse_flac

    rng = np.random.default_rng(11)
    t = np.arange(9000)
    left = (3000 * np.sin(t / 50.0) + 200 * np.sin(t / 7.0)).astype(np.int64)
    right = (2500 * np.cos(t / 60.0) + rng.integers(-50, 50, t.size)).astype(np.int64)
    x = np.stack([left, right], axis=1)
    for mode in ("independent", "left", "right", "mid"):
        blob = make_flac(x, 16000, bits=16, block_size=2048, stereo=mode)
        rate, back = parse_flac(blob)
        assert rate == 16000 and np.array_equal(back, x), mode
    assert flac_info(blob) == (16000, 2, 16, 9000)
    # compression is real on predictable signals (not a raw container)
    assert len(make_flac(left, 16000)) < left.size * 2 * 0.3


def test_flac_constant_noise_and_depths():
    from hyper_spark.kernel.media import make_flac, parse_flac

    rng = np.random.default_rng(5)
    blob = make_flac(np.full(5000, -123), 8000)
    assert np.array_equal(parse_flac(blob)[1][:, 0], np.full(5000, -123))
    assert len(blob) < 200  # CONSTANT subframes: a few bytes per frame
    for bits in (8, 16, 24, 32):
        lim = 1 << (bits - 1)
        noise = rng.integers(-lim, lim, 3000)
        assert np.array_equal(
            parse_flac(make_flac(noise, 44100, bits=bits))[1][:, 0], noise
        ), bits
    # non-multiple-of-blocksize tail frame
    odd = rng.integers(-100, 100, 4097 + 513)
    assert np.array_equal(parse_flac(make_flac(odd, 22050))[1][:, 0], odd)


def test_flac_rejects_corruption():
    from hyper_spark.kernel.media import make_flac, make_flac_header, parse_flac

    x = (1000 * np.sin(np.arange(3000) / 20.0)).astype(np.int64)
    blob = bytearray(make_flac(x, 8000))
    with pytest.raises(ValueError):  # flip a residual byte -> CRC-16
        bad = bytearray(blob)
        bad[-10] ^= 0xFF
        parse_flac(bytes(bad))
    with pytest.raises(ValueError):  # truncated mid-frame
        parse_flac(bytes(blob[: len(blob) // 2]))
    with pytest.raises(ValueError):  # header-only stream, no frames
        parse_flac(make_flac_header(8000, 1, 16, 100))
    with pytest.raises(ValueError):
        make_flac(np.array([70000]), 8000, bits=16)  # out of range
    with pytest.raises(ValueError):
        make_flac(x, 8000, stereo="mid")  # mono + stereo mode


def test_flac_decodes_handcrafted_lpc_subframe():
    # the encoder only emits CONSTANT/FIXED; craft an LPC frame by hand
    # (RFC 9639 §9.2.3) and check the decoder's IIR reconstruction
    # against an independently computed reference
    import struct as _struct

    from hyper_spark.kernel.media import (
        _crc8,
        _crc16,
        _PlainBitWriter,
        _utf8_coded,
        make_flac_header,
        parse_flac,
    )

    bs, order, shift = 64, 2, 4
    coefs = [29, -13]  # arbitrary quantized predictor
    warm = [100, -200]
    resid = [((i * 37) % 41) - 20 for i in range(bs - order)]
    expect = np.empty(bs, dtype=np.int64)
    expect[:order] = warm
    for i in range(order, bs):
        acc = sum(coefs[j] * expect[i - 1 - j] for j in range(order))
        expect[i] = resid[i - order] + (acc >> shift)
    assert np.abs(expect).max() < 1 << 15  # fits 16-bit

    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0b0000)
    hdr.append((0 << 4) | (0b100 << 1))  # mono, 16-bit
    hdr += _utf8_coded(0)
    hdr += _struct.pack(">H", bs - 1)
    hdr.append(_crc8(bytes(hdr)))
    bw = _PlainBitWriter()
    bw.put(0, 1)
    bw.put(0b100000 | (order - 1), 6)  # LPC order 2
    bw.put(0, 1)  # no wasted bits
    for w in warm:
        bw.put(w, 16)
    bw.put(15 - 1, 4)  # precision 15
    bw.put(shift, 5)
    for c in coefs:
        bw.put(c, 15)
    bw.put(0, 2)  # rice, 4-bit params
    bw.put(0, 4)  # partition order 0
    bw.put(0b1111, 4)  # escaped partition: raw 8-bit residuals
    bw.put(8, 5)
    for r in resid:
        bw.put(r, 8)
    bw.pad_to_byte()
    frame = bytes(hdr) + bytes(bw.buf)
    blob = (
        make_flac_header(8000, 1, 16, bs)
        + frame
        + _struct.pack(">H", _crc16(frame))
    )
    rate, back = parse_flac(blob)
    assert rate == 8000 and np.array_equal(back[:, 0], expect)


def test_flac_audio_features_and_dispatch():
    from hyper_spark.kernel.media import make_flac, make_wav
    from hyper_spark.operators.multimodal import audio_features, media_decoder

    # same sine through WAV (float path) and FLAC (int path): the
    # feature vectors must agree (same signal, same normalization)
    t = np.arange(8000)
    f = 0.5 * np.sin(2 * np.pi * 7 * t / 8000.0)
    ints = np.floor(f * 32768.0 + 0.5).astype(np.int64).clip(-32768, 32767)
    fw = audio_features(make_wav(f, 8000, bits=16))
    ff = audio_features(make_flac(ints, 8000, bits=16))
    np.testing.assert_allclose(fw, ff, atol=1e-3)
    assert np.allclose(media_decoder(make_flac(ints, 8000)), ff)
    # truncated FLAC falls back to the byte histogram, never raises
    assert media_decoder(make_flac(ints, 8000)[:60]).shape == (16,)


def test_jpeg_progressive_matches_sequential():
    # progressive and sequential streams carry the SAME quantized
    # coefficients, so decodes must be bit-identical — this exercises
    # DC first/refine, per-component spectral AC scans, successive
    # approximation, ZRL-with-interleaved-history refinement
    from hyper_spark.kernel.media import jpeg_info, make_jpeg, parse_jpeg

    img = _smooth_rgb()
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    cases = [
        (img[:, :, 0], {}),
        (img, {}),
        (img, {"subsample": True}),
        (img, {"quality": 30}),
        (noise, {"quality": 10}),
        (noise, {"quality": 90}),
        (rng.integers(0, 256, (19, 21, 3), dtype=np.uint8),
         {"quality": 70, "subsample": True}),
    ]
    for arr, kw in cases:
        prog_blob = make_jpeg(arr, progressive=True, **kw)
        assert jpeg_info(prog_blob)[4] is True  # SOF2 flagged
        seq = parse_jpeg(make_jpeg(arr, **kw))
        assert np.array_equal(parse_jpeg(prog_blob), seq), kw
    with pytest.raises(ValueError):  # restarts only in sequential mode
        make_jpeg(img, progressive=True, restart_interval=2)


def test_jpeg_progressive_eobrun_streams():
    # make_jpeg only emits EOB runs of length 1 (Annex-K tables carry
    # no EOBn>0 symbols); hand-craft a stream with a custom DHT whose
    # EOB2 symbol (0x10) spans blocks, hitting the decoder's
    # eobrun-at-entry paths in BOTH the AC-first skip and the
    # AC-refine band-wide correction-bit walk
    import struct as _struct

    from hyper_spark.kernel.media import (
        _BitWriter,
        _huff_codes,
        parse_jpeg,
    )

    # 32x8 grey = 4 blocks; q=1 so coefficients are the dequant values
    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    dc_bits = [0, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(8))
    ac_bits = [0, 2, 2, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    # EOB, EOB2, (0,1), (1,1), ZRL, (2,1), (0,2)
    ac_vals = [0x00, 0x10, 0x01, 0x11, 0xF0, 0x21, 0x02]
    dc_tab = _huff_codes(dc_bits, dc_vals)
    ac_tab = _huff_codes(ac_bits, ac_vals)

    head = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([1] * 64))
        + seg(0xC2, _struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    )
    # scan 1: DC first, Al=1 — all four DCs zero (size-0 symbol x4)
    bw = _BitWriter()
    for _ in range(4):
        c, ln = dc_tab[0]
        bw.put(c, ln)
    bw.pad_to_byte()
    sos_dc = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bytes(bw.buf)
    # scan 2: AC first, band 1-63, Al=1.
    #   block0: coef +2 at k=1 (t=1, size 1), then EOB2 with 1 extra
    #   bit = 1 -> eobrun covers blocks 1 and 2 entirely
    #   block3: coef -2 at k=1, then plain EOB
    bw = _BitWriter()
    c, ln = ac_tab[0x01]; bw.put(c, ln); bw.put(1, 1)   # +1 << Al = +2
    c, ln = ac_tab[0x10]; bw.put(c, ln); bw.put(1, 1)   # EOBRUN = 2+1-1... (1<<1)-1+1 = 2
    c, ln = ac_tab[0x01]; bw.put(c, ln); bw.put(0, 1)   # -1 << Al = -2
    c, ln = ac_tab[0x00]; bw.put(c, ln)
    bw.pad_to_byte()
    sos_ac1 = seg(0xDA, bytes([1, 1, 0x10, 1, 63, 0x01])) + bytes(bw.buf)
    # scan 3: AC refine, Ah=1 Al=0.
    #   block0: newly-significant +1 at k=3 (run 1), correction bit 1
    #   for the k=1 history coef (2 -> 3), then EOB2 spanning blocks
    #   1-2 (no history there, no bits), block3 entered with eobrun=0:
    #   plain EOB + correction bit 0 for its history coef (-2 stays)
    bw = _BitWriter()
    c, ln = ac_tab[0x11]; bw.put(c, ln)  # (run=1, size=1)
    bw.put(1, 1)                         # sign: positive
    bw.put(1, 1)                         # correction bit for k=1
    c, ln = ac_tab[0x10]; bw.put(c, ln); bw.put(1, 1)  # EOB2
    c, ln = ac_tab[0x00]; bw.put(c, ln)  # block3 EOB
    bw.put(0, 1)                         # correction bit for k=1
    bw.pad_to_byte()
    sos_ac2 = seg(0xDA, bytes([1, 1, 0x10, 1, 63, 0x10])) + bytes(bw.buf)

    blob = head + sos_dc + sos_ac1 + sos_ac2 + b"\xff\xd9"
    dec = parse_jpeg(blob)
    assert dec.shape == (8, 32)

    # reference: same final coefficients through the SEQUENTIAL path
    zz0 = np.zeros(64, np.int64); zz0[1] = 3   # 2 refined by bit 1
    zz0[3] = 1                                  # newly significant
    zz3 = np.zeros(64, np.int64); zz3[1] = -2  # bit 0: unchanged
    from hyper_spark.kernel.media import _encode_block
    bw = _BitWriter()
    pred = 0
    for zz in (zz0, np.zeros(64, np.int64), np.zeros(64, np.int64), zz3):
        pred = _encode_block(bw, zz, pred, dc_tab, ac_tab)
    bw.pad_to_byte()
    seq_blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([1] * 64))
        + seg(0xC0, _struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0x00]))
        + bytes(bw.buf)
        + b"\xff\xd9"
    )
    assert np.array_equal(dec, parse_jpeg(seq_blob))
