"""Multimodal (image/audio/video) columns for the training-data pipeline.

Media travels as opaque ``binary`` columns with a typed metadata struct;
all transforms are Arrow-batched ``mapInPandas`` stages so the pipeline
shape (schema, partitioning, batch flow) is real and benchmarkable even
though the actual codecs are STUBBED in this container (no PIL/ffmpeg) —
``_decode_image_stub`` derives deterministic dimensions/pixels from the
bytes so tests are stable; swap it for a real decoder (PIL / torchvision /
pyav) in production by passing ``decode_fn``.

Design for 100 TB: media bytes never pass through a Python row loop —
they move Arrow-batch-at-a-time; metadata-only plans never deserialize
the binary column at all (Parquet column pruning drops it at the scan).
"""

from __future__ import annotations

import hashlib
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


def image_features(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    feature_dim: int = 8,
    decode_fn: Callable[[bytes], tuple[int, int, np.ndarray]] = _decode_image_stub,
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
) -> DataFrame:
    """Audio windowing plumbing: one clip row -> overlapping fixed-duration
    window rows (the ASR/audio-embedding prep step).

    The stub treats the payload as 16-bit mono PCM (``n_samples =
    len(bytes) // 2``) and slices byte ranges per window; a real
    implementation decodes with soundfile/ffmpeg first. As with
    ``frame_sample``, the 1->N expansion and the (id, offset) addressing
    scheme are the parts that matter for partition sizing, and they are
    real. Windows shorter than half a window (the tail) are dropped, so
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
    win = int(sample_rate * window_s)
    hop = int(sample_rate * hop_s)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, lens, payloads = [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                raw = bytes(data)
                n_samples = len(raw) // 2
                w = 0
                for start in range(0, max(n_samples, 1), hop):
                    n = min(win, n_samples - start)
                    if n < win // 2:
                        break
                    ids.append(int(mid))
                    idxs.append(w)
                    starts.append(start)
                    lens.append(n)
                    payloads.append(raw[start * 2 : (start + n) * 2])
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
