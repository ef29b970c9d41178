"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns beside a typed
metadata struct; all transforms are ``mapInPandas`` stages over Arrow
batches so payload bytes stream through Python exactly once per stage and
never materialize on the driver. Decode is STUBBED in this environment
(no image/audio libraries in the container — the stub is clearly marked
and deterministic), but the Spark-side plumbing — schema, batch shape,
partition flow — is real and tested:

* ``attach_payload_metadata`` — JVM-only: payload size, md5, magic-byte
  format sniffing
* ``decode_features`` — per-payload fixed-width feature vector.
  ``fake_decoder`` (default) computes a deterministic 16-bin byte
  histogram (stands in for a real CNN/FFT featurizer); ``strict=True``
  raises NotImplementedError where a real decoder would plug in.
* ``frame_sample`` — selects every nth chunk of a payload as "frames",
  the batch-shape analogue of video frame sampling.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_payload_metadata",
    "decode_features",
    "frame_sample",
    "fake_decoder",
]

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"OggS": "ogg",
    b"fLaC": "flac",
}


def attach_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-native metadata: byte size, md5, magic-byte format guess."""
    p = F.col(payload_col)
    fmt = F.lit("unknown")
    for magic, name in _MAGIC.items():
        hex_prefix = magic.hex()
        fmt = F.when(
            F.hex(F.substring(p, 1, len(magic))) == hex_prefix.upper(), F.lit(name)
        ).otherwise(fmt)
    return df.withColumn(
        "payload_meta",
        F.struct(
            F.length(p).alias("n_bytes"),
            F.md5(p).alias("digest"),
            fmt.alias("format"),
        ),
    )


def fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in featurizer: 16-bin byte histogram, L1
    normalized. Replace with a real decode (PIL/librosa/av) outside this
    sandbox."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(16, dtype=np.float32)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / hist.sum()


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], np.ndarray] = fake_decoder,
    feature_dim: int = 16,
    strict: bool = False,
) -> DataFrame:
    """One feature vector per payload via mapInPandas (Arrow-batched;
    payload bytes cross into Python once, never to the driver)."""
    if strict:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; pass a decoder= callable or use the "
            "default fake_decoder for plumbing tests"
        )

    schema = f"{id_col} long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                decoder(bytes(b)).astype(np.float32).tolist()
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    every_nth: int = 4,
) -> DataFrame:
    """Split payloads into fixed-size 'frames' and keep every nth — the
    distribution shape of video frame sampling (explodes rows, preserves
    partitioning; a real implementation swaps the chunker for a container
    demuxer)."""
    schema = f"{id_col} long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for did, blob in zip(pdf[id_col], pdf[payload_col]):
                blob = bytes(blob)
                frames = [
                    blob[o : o + frame_bytes]
                    for o in range(0, len(blob), frame_bytes)
                ]
                for i in range(0, len(frames), every_nth):
                    out_ids.append(did)
                    out_idx.append(i)
                    out_frames.append(frames[i])
            if out_ids:
                yield pd.DataFrame(
                    {id_col: out_ids, "frame_idx": out_idx, "frame": out_frames}
                )

    return df.select(id_col, payload_col).mapInPandas(run, schema)
