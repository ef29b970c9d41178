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

__all__ = ["image_phash", "hamming_pairs", "media_near_dedup"]


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


def media_near_dedup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_dist: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-duplicate clustering: [<id>, cluster, keep] for
    every DECODABLE payload — phash → banded Hamming pairs →
    connected components; ``keep`` marks the minimum id per cluster
    (singletons keep themselves). The image twin of
    `dedup.near_dedup`: same cluster/keep contract, composable with
    `cluster_safe_split`."""
    from hyper_spark.operators.graph import connected_components

    hashes = image_phash(df, payload_col, id_col).filter(
        F.col("phash").isNotNull()
    )
    hashes.persist()
    pairs = hamming_pairs(
        hashes, id_col=id_col, max_dist=max_dist, max_bucket=max_bucket
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
