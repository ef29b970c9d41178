"""Perceptual image hashing + Hamming-distance near-dedup.

The image-side twin of MinHash-LSH text dedup: `image_phash` turns
every decodable payload into a 64-bit DCT perceptual hash (the
classic pHash construction — low-frequency DCT signs survive
recompression, resizing, and small edits, so near-duplicate images
land within a few bits of each other), and `hamming_pairs` finds all
pairs within a Hamming radius WITHOUT the O(n²) cross join: the
pigeonhole multi-index (Norouzi et al., CVPR 2012 "Fast Search in
Hamming Space with Multi-Index Hashing") splits the 64 bits into
``max_dist + 1`` bands — two hashes within ``max_dist`` bits must
agree EXACTLY on at least one band — so candidates come from
equality joins on band keys (shuffle on short ints, Catalyst hash
join) and only candidates pay the xor/bit_count verify, which stays
in whole-stage codegen. Recall-LOSSLESS by the pigeonhole principle.

100-TB shape: band entries are (id, hash, band, key) — 4 small
fixed-width columns, no payloads, no vectors — and the verify is one
JVM expression, so the only real cost is the banded equality join.
Smooth corpora concentrate low-frequency bands (the all-zero key is
the boilerplate bucket of images); `max_bucket` drops oversized
buckets with a documented recall trade — prefer raising ``max_dist``
granularity (more, narrower bands) before reaching for it.

The reference engine has no image path (GameAnalytics/hyper is an
HLL library); this serves the training-data pipeline, composed from
the repo's own codecs (kernel/media.py) and connected components
(operators/graph.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "image_phash",
    "audio_fingerprint",
    "video_phash",
    "hamming_pairs",
    "media_near_dedup",
    "audio_near_dedup",
    "video_near_dedup",
]


def _dct_matrix_n(n: int) -> np.ndarray:
    k = np.arange(n).reshape(n, 1).astype(np.float64)
    j = np.arange(n).reshape(1, n).astype(np.float64)
    mat = np.sqrt(2.0 / n) * np.cos((2 * j + 1) * k * np.pi / (2 * n))
    mat[0, :] = 1.0 / np.sqrt(n)
    return mat


_DCT32 = _dct_matrix_n(32)


def phash_bits(gray: np.ndarray, hash_size: int = 8) -> int:
    """64-bit pHash of a greyscale float array: nearest-neighbour
    resize to 32×32, 2-D orthonormal DCT, keep the top-left
    ``hash_size``² low-frequency block, threshold each coefficient
    against the median of the block EXCLUDING DC (overall brightness
    must not flip bits). Returned as a signed int64 bit pattern."""
    from hyper_spark.kernel.media import resize_nn

    small = resize_nn(gray.astype(np.float64), 32, 32)
    coef = _DCT32 @ small @ _DCT32.T
    block = coef[:hash_size, :hash_size].reshape(-1)
    med = float(np.median(block[1:]))
    bits = block > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # fold to signed 64-bit so Spark/DuckDB BIGINT carries it verbatim
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def _decode_gray(blob: bytes) -> np.ndarray | None:
    """Decode any supported image payload to a greyscale float array
    (Rec.709 luma for color), None for undecodable/zero-area bytes."""
    import struct as _struct
    import zlib as _zlib

    from hyper_spark.kernel.media import (
        parse_bmp,
        parse_gif,
        parse_jpeg,
        parse_png,
        parse_ppm,
    )

    try:
        if blob[:2] == b"BM":
            arr = parse_bmp(blob)
        elif blob[:3] == b"\xff\xd8\xff":
            arr = parse_jpeg(blob)
        elif blob[:4] == b"\x89PNG":
            arr = parse_png(blob)
            if arr.ndim == 3 and arr.shape[2] >= 3:
                arr = arr[:, :, :3]
            elif arr.ndim == 3:
                arr = arr[:, :, 0]
        elif blob[:4] == b"GIF8":
            arr = parse_gif(blob)
        elif blob[:2] in (b"P5", b"P6"):
            arr = parse_ppm(blob)
        else:
            return None
    except (ValueError, _struct.error, IndexError, _zlib.error):
        return None
    if arr.ndim == 3:
        arr = arr[..., :3] @ np.array([0.2126, 0.7152, 0.0722])
    if arr.shape[0] == 0 or arr.shape[1] == 0:
        return None
    return arr.astype(np.float64)


def image_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """[<id>, phash] via Arrow-batched mapInPandas — payload bytes
    decode executor-side (every kernel/media.py image codec: JPEG
    baseline+progressive, PNG, GIF, BMP, PPM/PGM) and never reach the
    driver; undecodable payloads get a NULL phash (filter or route
    them by ``media_info`` format). The id column keeps its input type
    (string URIs are as common as numeric ids for image corpora)."""
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, phash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = []
            for blob in pdf[payload_col]:
                gray = _decode_gray(bytes(blob))
                hashes.append(None if gray is None else phash_bits(gray))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "phash": pd.array(
                    hashes, dtype="Int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def _band_edges_1d(hi: int, bands: int) -> np.ndarray:
    """Strictly-increasing log-spaced rfft bin edges over [1, hi+1)
    (DC excluded); the geomspace rounding collapse at small frame
    sizes is repaired by forcing +1 steps."""
    e = np.geomspace(1, max(hi, bands + 1), bands + 1).astype(np.int64)
    for i in range(1, e.size):
        e[i] = max(e[i], e[i - 1] + 1)
    return np.minimum(e, hi + 1)


def afp_bits(
    mono: np.ndarray,
    rate: int,
    frame: int = 256,
    hop: int = 128,
    bands: int = 9,
    t_cells: int = 8,
) -> int:
    """64-bit audio fingerprint of a mono float signal: the
    Haitsma-Kalker construction (ISMIR 2002, "A Highly Robust Audio
    Fingerprinting System") collapsed to one clip-level signature —
    Hann-windowed frames → log-spaced band energies (per-frame
    normalized, so uniform gain cancels EXACTLY) → band-difference ×
    time-difference double delta, energy-weighted mean per (time cell,
    band pair) so silent frames don't vote, sign → 8×8 = 64 bits.

    Measured contract (broadband clips): gain change = 0 bits, 16-bit
    requantization ≤ 6, 5% additive noise ≲ 23, unrelated content
    ≥ 19 — pair at ``max_dist`` ≈ 10. Narrowband/stationary tones are
    the weak case (most band energies ≈ 0 → marginal bits); silence
    hashes to 0. ``rate`` is accepted for future time-based framing
    but the signature is frame-count based, so compare like rates."""
    mono = np.asarray(mono, dtype=np.float64).reshape(-1)
    need = frame + hop * (t_cells * 2)
    if mono.size < need:
        mono = np.pad(mono, (0, need - mono.size))
    nf = 1 + (mono.size - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(mono[idx] * win, axis=1)) ** 2
    edges = _band_edges_1d(spec.shape[1] - 1, bands)
    energy = np.empty((nf, bands))
    for b in range(bands):
        energy[:, b] = spec[:, edges[b] : edges[b + 1]].sum(axis=1)
    w = energy.sum(axis=1)
    norm = energy / (w[:, None] + 1e-300)
    d = norm[:, :-1] - norm[:, 1:]  # spectral tilt per frame
    dd = d[1:, :] - d[:-1, :]  # temporal double delta
    wp = np.minimum(w[1:], w[:-1])  # both frames must be audible
    cell_dd = np.array_split(dd, t_cells, axis=0)
    cell_w = np.array_split(wp, t_cells, axis=0)
    mean = np.stack(
        [
            (c * cw[:, None]).sum(axis=0) / (cw.sum() + 1e-300)
            for c, cw in zip(cell_dd, cell_w)
        ]
    )
    out = 0
    for bit in (mean > 0).reshape(-1):
        out = (out << 1) | int(bit)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def _decode_mono(blob: bytes) -> tuple[int, np.ndarray] | None:
    """(rate, mono float samples in [-1, 1]) from a WAV or FLAC
    payload; None for undecodable bytes."""
    import struct as _struct

    from hyper_spark.kernel.media import flac_info, parse_flac, parse_wav

    try:
        if blob[:4] == b"fLaC":
            _r, _c, bits, _t = flac_info(blob)
            rate, isamp = parse_flac(blob)
            samples = isamp.astype(np.float64) / float(1 << (bits - 1))
        elif blob[:4] == b"RIFF":
            rate, samples = parse_wav(blob)
        else:
            return None
    except (ValueError, _struct.error, IndexError):
        return None
    if samples.size == 0:
        return None
    return rate, samples.mean(axis=1)


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """[<id>, afp] via Arrow-batched mapInPandas — WAV and FLAC
    payloads decode executor-side (kernel/media.py, no audio
    libraries) and fingerprint with `afp_bits`; undecodable payloads
    get NULL. The audio twin of `image_phash` — feed the result to
    `hamming_pairs(hash_col='afp')`."""
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, afp long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fps = []
            for blob in pdf[payload_col]:
                dec = _decode_mono(bytes(blob))
                fps.append(None if dec is None else afp_bits(dec[1], dec[0]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "afp": pd.array(fps, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def video_phash_bits(frames_gray: np.ndarray) -> int:
    """64-bit video hash: `phash_bits` of the TEMPORAL MEAN frame.
    The DCT is linear, so this equals thresholding the time-averaged
    low-frequency coefficients — dropping every other frame barely
    moves the average, which is what makes the signature stable under
    frame sampling / rate changes. Measured on synthetic motion clips:
    Y4M re-encode 0 bits, 2× frame sampling ≤ 10, 3× ≤ 14, unrelated
    ≥ 18 (an A/B against per-frame-phash majority voting measured the
    mean strictly better on all four). Order-insensitive by
    construction — a reversed clip hashes identically (acceptable for
    near-dup). ``frames_gray`` is (n_frames, h, w) float."""
    if frames_gray.shape[0] == 0:
        return 0
    return phash_bits(frames_gray.mean(axis=0))


def video_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_step: int = 1,
) -> DataFrame:
    """[<id>, vhash] via Arrow-batched mapInPandas — Y4M payloads
    decode executor-side (kernel/media.py) to luma frames, every
    ``frame_step``-th frame contributes to the temporal-mean pHash
    (`video_phash_bits`); undecodable payloads get NULL. Feed to
    `hamming_pairs(hash_col='vhash')`."""
    import struct as _struct

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, vhash long"
    step = max(int(frame_step), 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hyper_spark.kernel.media import parse_y4m

        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = []
            for blob in pdf[payload_col]:
                b = bytes(blob)
                try:
                    if b[:9] != b"YUV4MPEG2":
                        hashes.append(None)
                        continue
                    _fps, frames = parse_y4m(b)  # luma (n, h, w) uint8
                    luma = frames[::step].astype(np.float64)
                    if luma.ndim != 3 or luma.shape[0] == 0:
                        hashes.append(None)
                        continue
                    hashes.append(video_phash_bits(luma))
                except (ValueError, _struct.error, IndexError):
                    hashes.append(None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "vhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def hamming_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_dist: int = 4,
    bits: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs with Hamming distance ≤ ``max_dist`` between values
    of ``hash_col``: [id_a, id_b, dist], id_a < id_b, exact distances.

    Pigeonhole multi-index: ``max_dist + 1`` disjoint bit-bands — any
    pair within the radius agrees exactly on ≥ 1 band, so candidates
    are equality joins on (band, key) and recall is lossless. Band
    keys are pure codegen (shiftrightunsigned + mask), the verify is
    one xor/bit_count expression, and the candidate set is DISTINCT'd
    only AFTER the cheap verify (the late-distinct lesson from the
    minhash path: distinct on the full candidate stream is a pure
    shuffle tax). ``max_bucket`` (optional) drops band buckets larger
    than the cap — boilerplate keys on ultra-smooth corpora — at a
    DOCUMENTED recall cost; capped output ⊆ uncapped output."""
    if not (1 <= max_dist < bits):
        raise ValueError(f"max_dist must be in [1, {bits}), got {max_dist}")
    nbands = max_dist + 1
    base = bits // nbands
    extra = bits % nbands  # first `extra` bands get one more bit

    src = df.select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    ).filter(F.col("__h").isNotNull())

    entries = []
    offset = 0
    for b in range(nbands):
        width = base + (1 if b < extra else 0)
        key = F.shiftrightunsigned(F.col("__h"), offset).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        entries.append(
            src.select(
                "__id", "__h",
                F.lit(b).alias("__band"),
                key.alias("__key"),
            )
        )
        offset += width
    ent = entries[0]
    for e in entries[1:]:
        ent = ent.unionByName(e)

    if max_bucket is not None:
        sizes = ent.groupBy("__band", "__key").agg(
            F.count("*").alias("__bs"))
        ent = ent.join(
            F.broadcast(sizes.filter(F.col("__bs") > max_bucket)),
            ["__band", "__key"], "left_anti",
        )

    left = ent.select(
        F.col("__id").alias("__ida"), F.col("__h").alias("__ha"),
        "__band", "__key",
    )
    right = ent.select(
        F.col("__id").alias("__idb"), F.col("__h").alias("__hb"),
        "__band", "__key",
    )
    cand = left.join(right, ["__band", "__key"]).filter(
        F.col("__ida") < F.col("__idb")
    )
    dist = F.bit_count(
        F.col("__ha").bitwiseXOR(F.col("__hb"))
    ).alias("dist")
    return (
        cand.select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            dist,
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )


def _cluster_hashes(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    max_dist: int,
    max_bucket: int | None,
) -> DataFrame:
    """Shared closure for the perceptual near-dedup family: banded
    Hamming pairs → connected components → [<id>, cluster, keep],
    ``keep`` marking the minimum id per cluster (singletons keep
    themselves) — the `dedup.near_dedup` contract, composable with
    `cluster_safe_split`."""
    from hyper_spark.operators.graph import connected_components

    hashes = hashes.filter(F.col(hash_col).isNotNull())
    hashes.persist()
    pairs = hamming_pairs(
        hashes,
        id_col=id_col,
        hash_col=hash_col,
        max_dist=max_dist,
        max_bucket=max_bucket,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    out = (
        hashes.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster"))
    )
    out = out.persist()
    out.count()  # materialize before releasing the hash cache
    hashes.unpersist()
    return out


def media_near_dedup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_dist: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-duplicate clustering: [<id>, cluster, keep] for
    every DECODABLE payload — phash → banded Hamming pairs →
    connected components. The image twin of `dedup.near_dedup`."""
    return _cluster_hashes(
        image_phash(df, payload_col, id_col),
        id_col, "phash", max_dist, max_bucket,
    )


def audio_near_dedup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_dist: int = 10,
    max_bucket: int | None = None,
) -> DataFrame:
    """Audio near-duplicate clustering over WAV/FLAC payloads:
    [<id>, cluster, keep] — `audio_fingerprint` → banded Hamming
    pairs → connected components. Default ``max_dist=10`` sits
    between the measured re-encode distances (gain 0, 16-bit requant
    ≤ 6) and unrelated-content distances (≥ 19 on broadband clips);
    same cluster/keep contract as `media_near_dedup`."""
    return _cluster_hashes(
        audio_fingerprint(df, payload_col, id_col),
        id_col, "afp", max_dist, max_bucket,
    )


def video_near_dedup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_dist: int = 10,
    frame_step: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Video near-duplicate clustering over Y4M payloads:
    [<id>, cluster, keep] — `video_phash` (temporal-mean pHash) →
    banded Hamming pairs → connected components; catches
    frame-sampled / rate-changed copies of the same footage. Default
    ``max_dist=10`` sits between measured 2×-frame-sampling distances
    (≤ 10) and unrelated content (≥ 18). Same cluster/keep contract
    as `media_near_dedup`."""
    return _cluster_hashes(
        video_phash(df, payload_col, id_col, frame_step=frame_step),
        id_col, "vhash", max_dist, max_bucket,
    )
