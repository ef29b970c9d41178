"""Pure-numpy media codecs for UNCOMPRESSED containers.

This sandbox has no image/audio libraries, but the uncompressed
container formats need none — WAV/PCM, PPM/PGM, and 24-bit BMP are
header + raw samples, fully parseable with struct offsets and
``np.frombuffer``. These are REAL decoders (byte-exact round-trip
tested), not stand-ins; compressed formats (png/jpeg/ogg/flac) still
need external codecs and stay pluggable via ``decode_features``'s
``decoder=`` parameter.

Encoders live here too: tests and gates synthesize deterministic
payloads with them, so the decode path is verified against known
ground truth without shipping binary fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "make_wav",
    "parse_wav",
    "make_ppm",
    "parse_ppm",
    "make_bmp",
    "parse_bmp",
    "make_y4m",
    "parse_y4m",
    "resize_nn",
]


# --------------------------------------------------------------------- WAV

_WAV_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def make_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] (shape (n,) mono or
    (n, channels)) as a canonical PCM RIFF/WAVE blob."""
    if bits not in _WAV_DTYPES:
        raise ValueError(f"bits must be one of {sorted(_WAV_DTYPES)}")
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if bits == 8:  # unsigned, biased at 128
        pcm = np.clip(np.round(arr * 127.0 + 128.0), 0, 255).astype(np.uint8)
    else:
        full = float(1 << (bits - 1))
        lo, hi = -full, full - 1
        pcm = np.clip(np.round(arr * full), lo, hi).astype(_WAV_DTYPES[bits])
    data = pcm.reshape(-1).tobytes()  # interleaved frames
    block = ch * bits // 8
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, rate, rate * block, block, bits
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def parse_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, float64 samples of shape (n, channels) in [-1, 1])
    from a PCM (format 1) or IEEE-float (format 3) RIFF/WAVE blob.
    Walks the chunk list, so extra chunks (LIST/fact/...) are fine."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _brate, _block, bits = fmt
    if audio_fmt == 3 and bits == 32:
        raw = np.frombuffer(data, dtype=np.float32).astype(np.float64)
    elif audio_fmt == 1 and bits in _WAV_DTYPES:
        raw = np.frombuffer(data, dtype=_WAV_DTYPES[bits]).astype(np.float64)
        if bits == 8:
            raw = (raw - 128.0) / 127.0
        else:
            raw = raw / float(1 << (bits - 1))
    else:
        raise ValueError(f"unsupported wav format {audio_fmt}/{bits}-bit")
    n = raw.size // ch
    return int(rate), raw[: n * ch].reshape(n, ch)


# --------------------------------------------------------------------- PPM

def make_ppm(arr: np.ndarray) -> bytes:
    """Encode a (h, w, 3) uint8 array as binary PPM (P6), or (h, w) as
    binary PGM (P5)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h, w, 3) or (h, w), got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def parse_ppm(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from P6, (h, w) from P5 — comment- and
    whitespace-tolerant header parse."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if blob[:2] == b"P6" else 1
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raw = np.frombuffer(blob, dtype=np.uint8, count=w * h * channels, offset=pos)
    return raw.reshape((h, w, 3) if channels == 3 else (h, w)).copy()


# --------------------------------------------------------------------- BMP

def make_bmp(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 24-bit uncompressed BMP
    (bottom-up rows, BGR byte order, 4-byte row padding — the format's
    canonical quirks)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = arr[::-1, :, ::-1]  # bottom-up, BGR
    for r in range(h):
        body += bgr[r].tobytes() + b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + bytes(body)


def parse_bmp(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a 24-bit uncompressed (BI_RGB) BMP."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", blob, 10)[0]
    hsize, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported, got {bpp}/{comp}")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    raw = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=pixel_off)
    px = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return (px[::-1] if flip else px).copy()


# --------------------------------------------------------------------- Y4M

def make_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode luma frames (n, h, w) uint8 as YUV4MPEG2 C420 with
    neutral chroma — a real, tool-readable (ffmpeg/mplayer) video
    stream; luma round-trips byte-exact. h and w must be even (420
    chroma subsampling)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"expected (n, h, w) luma frames, got {frames.shape}")
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even frame dimensions")
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()
    chroma = b"\x80" * ((h // 2) * (w // 2))
    out = bytearray(hdr)
    for i in range(n):
        out += b"FRAME\n" + frames[i].tobytes() + chroma + chroma
    return bytes(out)


def parse_y4m(blob: bytes) -> tuple[tuple[int, int], np.ndarray]:
    """((fps_num, fps_den), luma frames (n, h, w) uint8) from a
    YUV4MPEG2 C420* stream (chroma planes are skipped — features here
    are luma-based; extend per-plane if color matters)."""
    nl = blob.find(b"\n")
    if nl < 0 or not blob.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    colorspace = "420jpeg"
    for tok in blob[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode()
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == b"C":
            colorspace = val
    if w is None or h is None:
        raise ValueError("missing W/H in stream header")
    if not colorspace.startswith("420"):
        raise ValueError(f"only C420* supported, got C{colorspace}")
    luma_n, chroma_n = w * h, 2 * ((w // 2) * ((h + 1) // 2))
    frames = []
    pos = nl + 1
    while pos < len(blob):
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or blob[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        start = fnl + 1
        frames.append(
            np.frombuffer(blob, dtype=np.uint8, count=luma_n, offset=start)
            .reshape(h, w)
        )
        pos = start + luma_n + chroma_n
    return fps, (
        np.stack(frames) if frames else np.zeros((0, h, w), dtype=np.uint8)
    )


# ------------------------------------------------------------------ resize

def resize_nn(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index sampling (pixel-center
    convention) — deterministic, allocation-bounded, no interpolation
    libraries."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return arr[rows][:, cols].copy()
