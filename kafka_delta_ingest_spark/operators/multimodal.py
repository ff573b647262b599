"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): the
default codec is a deterministic fake that derives "features" from the
byte content, so the Spark-side plumbing — schema, batch shape, partition
behavior — is real and tested, and a real codec (PIL/librosa/ffmpeg) drops
in by replacing one function."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Real decoder. Uncompressed formats that need no external libraries
    — BMP (24/32-bit, BITMAPINFOHEADER) and PCM WAV — are decoded here in
    pure Python/numpy, so the mapInPandas plumbing is exercised on real
    media bytes even in this container. Compressed formats (PNG/JPEG/MP3/
    MP4...) require PIL / soundfile / av, not present here."""
    if payload is not None and len(payload) >= 12:
        b = bytes(payload)
        if b[:2] == b"BM":
            return decode_bmp(b).reshape(-1).astype(np.float32)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            samples, _rate = decode_wav(b)
            return samples.astype(np.float32)
    raise NotImplementedError(
        "media decoding beyond uncompressed BMP/WAV requires image/audio "
        "libraries not present in this environment; use fake_decode or "
        "plug a codec in extract_features"
    )


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (height, width, 3) uint8 RGB array.
    Pure stdlib+numpy: 14-byte file header ('BM', data offset at byte 10),
    BITMAPINFOHEADER (width/height/bpp), BI_RGB only; rows are stored
    bottom-up, 4-byte aligned, in BGR order."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiihHI", b, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if compression != 0:
        raise ValueError(f"only BI_RGB (uncompressed) supported, got {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"only 24/32-bit BMP supported, got {bpp}")
    bottom_up = height > 0
    height = abs(height)
    bypp = bpp // 8
    stride = (width * bypp + 3) & ~3
    rows = []
    for r in range(height):
        off = data_off + r * stride
        row = np.frombuffer(b, dtype=np.uint8, count=width * bypp, offset=off)
        rows.append(row.reshape(width, bypp)[:, :3][:, ::-1])  # BGR -> RGB
    px = np.stack(rows[::-1] if bottom_up else rows)
    return px


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float32 samples in [-1, 1] interleaved, sample_rate).
    Walks RIFF chunks (fmt / data may be preceded by LIST etc.); 8-bit
    unsigned and 16-bit signed PCM supported."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE magic")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, _channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported, got format {audio_format}")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
    return samples, int(sample_rate)


def fake_decode(payload: bytes, kind: str, n_features: int = 8) -> np.ndarray:
    """Deterministic stand-in: features are byte-statistics of the payload.
    Stable across runs and partitionings — used by tests and the bench."""
    if payload is None or len(payload) == 0:
        return np.zeros(n_features, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    chunks = np.array_split(arr, n_features)
    return np.array([float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(
    df: DataFrame,
    decode: Callable[[bytes, str], np.ndarray] = fake_decode,
    batch_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    ``mapInPandas`` streams record batches through the codec — payloads
    never materialize on the driver, and each task handles its partition's
    batches independently (embarrassingly parallel at any scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if p is None else decode(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image resample: nearest-neighbor
    re-index of the byte array to exactly w*h bytes. A real codec
    (PIL ``Image.resize``) replaces this one function."""
    if payload is None or len(payload) == 0:
        return bytes(w * h)
    arr = np.frombuffer(payload, dtype=np.uint8)
    idx = (np.arange(w * h) * len(arr) // (w * h)).clip(0, len(arr) - 1)
    return arr[idx].tobytes()


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resize: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Resize every image row to ``width``×``height``; non-image rows pass
    through untouched. Same MEDIA_SCHEMA out as in, meta.width/height
    updated — so resize composes with extract_features / table writes.
    ``mapInPandas`` keeps payloads on executors; 1 row in → 1 row out, so
    the operator preserves partitioning (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            is_img = out["kind"] == "image"
            out.loc[is_img, "payload"] = out.loc[is_img, "payload"].map(
                lambda p: None if p is None else resize(bytes(p), width, height)
            )
            out.loc[is_img, "meta"] = out.loc[is_img, "meta"].map(
                lambda m: {**(m if isinstance(m, dict) else m.asDict()),
                           "width": width, "height": height}
            )
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    split: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video row: one output row
    per kept frame (1→N batch expansion through ``mapInPandas``). The
    default ``split`` slices the payload into ``meta.n_frames`` equal
    chunks — a real demuxer (PyAV) replaces it; the Spark-side shape
    (schema, expansion, executor-local payloads) is what's under test."""

    def default_split(payload: bytes, n_frames: int) -> list[bytes]:
        if payload is None or n_frames in (None, 0):
            return []
        arr = np.frombuffer(payload, dtype=np.uint8)
        return [c.tobytes() for c in np.array_split(arr, n_frames)]

    split = split or default_split

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            vids = pdf[pdf["kind"] == "video"]
            for mid, p, m in zip(vids["media_id"], vids["payload"], vids["meta"]):
                meta = m if isinstance(m, dict) else (m.asDict() if m is not None else {})
                frames = split(None if p is None else bytes(p), meta.get("n_frames"))
                for i in range(0, len(frames), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(frames[i])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "payload": payloads}
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rows = []
    state = seed
    for i in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        size = 64 + state % 1024
        payload = bytes(((state >> (j % 48)) + j) % 256 for j in range(size))
        kind = ["image", "audio", "video"][i % 3]
        meta = (
            (64, 64, None, None, "image/png")
            if kind == "image"
            else (None, None, 16000, None, "audio/wav")
            if kind == "audio"
            else (None, None, None, 30, "video/mp4")
        )
        rows.append((f"m-{i:06d}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
