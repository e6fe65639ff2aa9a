"""Multimodal (image/audio/video) columns for the training-data pipeline.

Media travels as opaque ``binary`` columns with a typed metadata struct;
all transforms are Arrow-batched ``mapInPandas`` stages.

REAL codecs (no dependencies beyond the stdlib):

- BMP images: ``decode_bmp`` / ``encode_bmp`` — struct-parsed
  uncompressed 24-bit Windows bitmaps (BITMAPFILEHEADER +
  BITMAPINFOHEADER, 4-byte row padding, bottom-up rows).
- WAV audio: ``decode_wav`` / ``encode_wav`` — stdlib ``wave`` module,
  16-bit PCM mono.

Formats this container cannot decode (JPEG/PNG/MP4 — no PIL/ffmpeg)
fall back to ``_decode_image_stub``, which derives deterministic
dimensions/pixels from a hash of the bytes so the plumbing stays
testable; ``decode_image`` dispatches by magic bytes. Swap the stub for
PIL / torchvision / pyav in production via ``decode_fn``.

Design for 100 TB: media bytes never pass through a Python row loop —
they move Arrow-batch-at-a-time; metadata-only plans never deserialize
the binary column at all (Parquet column pruning drops it at the scan).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as sty

IMAGE_FEATURE_SCHEMA = sty.StructType(
    [
        sty.StructField("media_id", sty.LongType()),
        sty.StructField("width", sty.IntegerType()),
        sty.StructField("height", sty.IntegerType()),
        sty.StructField("n_bytes", sty.LongType()),
        sty.StructField("sha256", sty.StringType()),
        sty.StructField("mean_intensity", sty.DoubleType()),
        sty.StructField("feature", sty.ArrayType(sty.FloatType())),
    ]
)


# ------------------------------------------------------------ real codecs


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode a (height, width) uint8 grayscale array as an uncompressed
    24-bit BMP (R=G=B). Rows are bottom-up and padded to 4 bytes, per the
    format; total size = 54 + height * ceil(3*width / 4) * 4."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    row_size = (3 * w + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = np.repeat(px[y], 3).tobytes()  # B, G, R all = gray value
        rows += row + b"\x00" * (row_size - len(row))
    return header + info + bytes(rows)


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """Struct-parse an uncompressed 24-bit BMP into (width, height,
    grayscale uint8 array). Grayscale is ITU-R BT.601 luma rounded to
    int (for R=G=B inputs this recovers the exact channel value).
    Raises ValueError on non-BMP bytes or unsupported variants
    (compressed, palette, != 24 bpp)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if header_size < 40 or compression != 0 or bpp != 24:
        raise ValueError(
            f"unsupported BMP variant (header {header_size}, {bpp} bpp, compression {compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_size = (3 * w + 3) // 4 * 4
    if len(data) < pixel_offset + row_size * h:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(data, dtype=np.uint8, offset=pixel_offset, count=row_size * h)
    rows = raw.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    bgr = rows.astype(np.float64)
    gray = np.round(0.114 * bgr[:, :, 0] + 0.587 * bgr[:, :, 1] + 0.299 * bgr[:, :, 2])
    return w, h, gray.astype(np.uint8)


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode an int16 mono sample array as a WAV container (stdlib
    ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM mono WAV container to (sample_rate, int16
    samples) via the stdlib ``wave`` reader. Raises on non-WAV bytes,
    non-16-bit or multi-channel streams."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError(
                f"only 16-bit mono PCM supported, got width={wf.getsampwidth()} "
                f"channels={wf.getnchannels()}"
            )
        rate = wf.getframerate()
        samples = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    return rate, samples


def _decode_image_stub(data: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decoder: (width, height, gray pixel array).

    Real implementation would be PIL.Image.open(io.BytesIO(data)); see
    module docstring. NOT a real codec — dimensions/pixels are derived
    from a hash of the bytes so the plumbing is testable.
    """
    h = hashlib.sha256(data).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    pixels = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
    return width, height, pixels


def byte_sum(col):
    """Column helper: sum of unsigned bytes in a binary payload — the
    minimal per-frame 'feature extraction' stage a real video pipeline
    would run (vectorized Arrow batches, one frombuffer+sum per row,
    never a per-row Python UDF)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sum_u8(payload: pd.Series) -> pd.Series:
        return pd.Series(
            [int(np.frombuffer(b, dtype=np.uint8).sum()) for b in payload],
            dtype="int64",
        )

    return _sum_u8(col)


def sum_pcm16(col):
    """Column helper: sum of 16-bit LE PCM samples in a binary payload
    (vectorized Arrow batches, one frombuffer+sum per row)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sum_i16(payload: pd.Series) -> pd.Series:
        return pd.Series(
            [int(np.frombuffer(b, dtype="<i2").sum()) for b in payload], dtype="int64"
        )

    return _sum_i16(col)


def decode_image(data: bytes) -> tuple[int, int, np.ndarray]:
    """Magic-byte dispatch: BMP decodes for real; other formats (JPEG/PNG
    — no PIL in this container) fall back to the deterministic stub."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    return _decode_image_stub(data)


def image_features(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    feature_dim: int = 8,
    decode_fn: Callable[[bytes], tuple[int, int, np.ndarray]] = decode_image,
) -> DataFrame:
    """decode -> resize-pool -> feature-extract, one Arrow batch at a time.

    Output feature = ``feature_dim`` coarse intensity-histogram bins
    (stands in for an embedding model's output; identical batch shape).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                raw = bytes(data)
                w, hgt, px = decode_fn(raw)
                hist, _ = np.histogram(px, bins=feature_dim, range=(0, 256))
                feat = (hist / px.size).astype(np.float32)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": hgt,
                        "n_bytes": len(raw),
                        "sha256": hashlib.sha256(raw).hexdigest(),
                        "mean_intensity": float(px.mean()),
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]) if rows else (
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in IMAGE_FEATURE_SCHEMA.fields})
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(_batches, schema=IMAGE_FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling plumbing: one media row -> N frame rows.

    The stub treats the payload as ``n_frames = len(bytes) // 1024`` and
    emits every ``every_n``-th frame index with a sliced payload; a real
    implementation decodes with pyav and yields encoded frames. The
    expansion (1 row -> many) is the part that matters for partition
    sizing, and it is real.
    """
    schema = sty.StructType(
        [
            sty.StructField("media_id", sty.LongType()),
            sty.StructField("frame_idx", sty.IntegerType()),
            sty.StructField("frame_bytes", sty.BinaryType()),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                raw = bytes(data)
                n_frames = max(len(raw) // 1024, 1)
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "frame_bytes": raw[i * 1024 : (i + 1) * 1024],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"]) if rows else (
                pd.DataFrame({"media_id": pd.Series(dtype="int64"), "frame_idx": pd.Series(dtype="int32"), "frame_bytes": pd.Series(dtype="object")})
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(_batches, schema=schema)


def audio_windows(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    sample_rate: int = 16_000,
    window_s: float = 1.0,
    hop_s: float = 0.5,
    decode_fn: Callable[[bytes], tuple[int, np.ndarray]] | None = None,
) -> DataFrame:
    """Audio windowing: one clip row -> overlapping fixed-duration window
    rows (the ASR/audio-embedding prep step).

    ``decode_fn=None`` (raw mode) treats the payload as headerless 16-bit
    mono PCM at ``sample_rate`` and slices byte ranges per window.
    ``decode_fn=decode_wav`` decodes a real WAV container first and
    windows by the CONTAINER's sample rate (``sample_rate`` is ignored);
    swap in soundfile/ffmpeg for other formats. The 1->N expansion and
    the (id, offset) addressing scheme are what matter for partition
    sizing. Windows shorter than half a window (the tail) are dropped, so
    every emitted row is analysis-worthy.
    """
    schema = sty.StructType(
        [
            sty.StructField("media_id", sty.LongType()),
            sty.StructField("window_idx", sty.IntegerType()),
            sty.StructField("start_sample", sty.LongType()),
            sty.StructField("n_samples", sty.IntegerType()),
            sty.StructField("window_bytes", sty.BinaryType()),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, lens, payloads = [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                raw = bytes(data)
                if decode_fn is None:
                    rate = sample_rate
                    samples = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
                else:
                    rate, samples = decode_fn(raw)
                win = int(rate * window_s)
                hop = int(rate * hop_s)
                n_samples = len(samples)
                w = 0
                for start in range(0, max(n_samples, 1), hop):
                    n = min(win, n_samples - start)
                    if n < win // 2:
                        break
                    ids.append(int(mid))
                    idxs.append(w)
                    starts.append(start)
                    lens.append(n)
                    payloads.append(samples[start : start + n].tobytes())
                    w += 1
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "start_sample": pd.Series(starts, dtype="int64"),
                    "n_samples": pd.Series(lens, dtype="int32"),
                    "window_bytes": pd.Series(payloads, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(_batches, schema=schema)


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize with FLOOR index mapping: out[i, j] =
    in[i*h // out_h, j*w // out_w]. Integer-exact and therefore
    SQL-expressible — the q133 oracle recomputes every resized pixel of
    the synthetic corpus arithmetically, so the whole decode -> resize
    path is value-checked end-to-end, not just shape-checked."""
    h, w = px.shape
    ri = (np.arange(out_h, dtype=np.int64) * h) // out_h
    rj = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[np.ix_(ri, rj)]


IMAGE_RESIZE_SCHEMA = sty.StructType(
    [
        sty.StructField("media_id", sty.LongType()),
        sty.StructField("src_w", sty.IntegerType()),
        sty.StructField("src_h", sty.IntegerType()),
        sty.StructField("out_w", sty.IntegerType()),
        sty.StructField("out_h", sty.IntegerType()),
        sty.StructField("resized_bmp", sty.BinaryType()),
        sty.StructField("resized_sum", sty.LongType()),
        sty.StructField("p_first", sty.IntegerType()),
        sty.StructField("p_last", sty.IntegerType()),
    ]
)


def image_resize(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    out_h: int = 4,
    out_w: int = 4,
    decode_fn: Callable[[bytes], tuple[int, int, np.ndarray]] = decode_image,
) -> DataFrame:
    """Thumbnail stage of a multimodal ingest: decode -> nearest-neighbor
    downsample -> re-encode (real BMP bytes out, round-trip-tested) plus
    integer stats (pixel sum, first/last corner) for cheap downstream
    filtering. One Arrow batch at a time via mapInPandas — the same
    batch shape as ``image_features``, so the stage slots into the same
    pipeline; output rows are ~out_h*out_w bytes regardless of source
    size, which is what makes the thumbnail column safe to carry through
    later shuffles at corpus scale."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                w, hgt, px = decode_fn(bytes(data))
                small = resize_nearest(px, out_h, out_w)
                rows.append(
                    {
                        "media_id": int(mid),
                        "src_w": w,
                        "src_h": hgt,
                        "out_w": out_w,
                        "out_h": out_h,
                        "resized_bmp": encode_bmp(small),
                        "resized_sum": int(small.sum(dtype=np.int64)),
                        "p_first": int(small[0, 0]),
                        "p_last": int(small[-1, -1]),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_RESIZE_SCHEMA.fields]) if rows else (
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in IMAGE_RESIZE_SCHEMA.fields})
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(_batches, schema=IMAGE_RESIZE_SCHEMA)


IMAGE_AHASH_SCHEMA = sty.StructType(
    [
        sty.StructField("media_id", sty.LongType()),
        sty.StructField("width", sty.IntegerType()),
        sty.StructField("height", sty.IntegerType()),
        sty.StructField("ahash", sty.LongType()),
    ]
)


def image_ahash(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    grid: int = 4,
    decode_fn: Callable[[bytes], tuple[int, int, np.ndarray]] = decode_image,
) -> DataFrame:
    """Perceptual average-hash (aHash) over decoded images: decode ->
    nearest-neighbor resize to ``grid`` x ``grid`` (floor index mapping,
    the ``resize_nearest`` contract) -> threshold each cell against the
    FLOOR of the grid mean -> pack bits row-major (cell k = bit k).
    Integer-exact end to end, so a SQL oracle can recompute every hash
    from synthetic-pixel arithmetic — the same proof device as q86/q133.
    Near-duplicate images (rescaled/re-encoded copies) collide on the
    hash, which turns image dedup into the exact-dedup groupBy shape:
    one Arrow-batched map over media bytes, then an 8-byte-key
    aggregation — media bytes never shuffle. ``grid`` <= 8 (64 bits);
    bit 63 is reinterpreted into the signed long like xxhash64."""
    if grid > 8:
        raise ValueError(f"grid must be <= 8 (64-bit hash), got {grid}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                w, hgt, px = decode_fn(bytes(data))
                small = resize_nearest(px, grid, grid).astype(np.int64)
                mean_floor = int(small.sum()) // (grid * grid)
                ah = 0
                for k, bit in enumerate((small >= mean_floor).flatten()):
                    if bit:
                        ah |= 1 << k
                if ah >= 1 << 63:  # bit-reinterpret, not cast
                    ah -= 1 << 64
                rows.append(
                    {"media_id": int(mid), "width": w, "height": hgt, "ahash": ah}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_AHASH_SCHEMA.fields]) if rows else (
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in IMAGE_AHASH_SCHEMA.fields})
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(_batches, schema=IMAGE_AHASH_SCHEMA)


AUDIO_FPRINT_SCHEMA = sty.StructType(
    [
        sty.StructField("media_id", sty.LongType()),
        sty.StructField("n_samples", sty.LongType()),
        sty.StructField("n_frames", sty.IntegerType()),
        sty.StructField("fhash", sty.LongType()),
    ]
)


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    frame: int = 500,
    decode_fn: Callable[[bytes], tuple[int, np.ndarray]] = decode_wav,
) -> DataFrame:
    """Energy-profile audio fingerprint — the WAV twin of
    ``image_ahash``: decode -> split into full ``frame``-sample frames
    (short tail dropped) -> per-frame energy (sum of squared int16
    samples, exact int64) -> threshold each frame against the FLOOR of
    the mean frame energy -> pack bits in frame order. Re-encoded /
    re-containered copies of the same signal collide, so audio dedup
    becomes the exact-dedup groupBy shape over 8-byte keys; media bytes
    never shuffle. Integer-exact end to end (SQL-oracle-recomputable
    from synthetic-sample arithmetic). Clips with >= 64 full frames (or
    none) refuse loudly rather than truncating the profile silently."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                _, samples = decode_fn(bytes(data))
                n_frames = len(samples) // frame
                if not 1 <= n_frames <= 64:
                    raise ValueError(
                        f"media {mid}: {n_frames} frames of {frame} samples "
                        "(need 1..64 for a 64-bit fingerprint) — choose a "
                        "frame size matched to the clip length"
                    )
                s = samples[: n_frames * frame].astype(np.int64).reshape(n_frames, frame)
                energy = (s * s).sum(axis=1)
                mean_floor = int(energy.sum()) // n_frames
                fh = 0
                for k, bit in enumerate(energy >= mean_floor):
                    if bit:
                        fh |= 1 << k
                if fh >= 1 << 63:  # bit-reinterpret, not cast
                    fh -= 1 << 64
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": int(len(samples)),
                        "n_frames": int(n_frames),
                        "fhash": fh,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FPRINT_SCHEMA.fields]) if rows else (
                pd.DataFrame({f.name: pd.Series(dtype="object") for f in AUDIO_FPRINT_SCHEMA.fields})
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(_batches, schema=AUDIO_FPRINT_SCHEMA)
