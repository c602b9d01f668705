"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns with typed metadata — exactly
the engine's tile model generalized.  Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` UDFs.

The image/audio codec libraries are NOT available in this container, so the
decode step is STUBBED: ``decode_media`` raises ``NotImplementedError`` for
real codecs and supplies a deterministic fake for the ``raw-f32`` codec the
engine's own tiles use.  The Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from homonim_spark.tiles import decode_tile

MEDIA_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("codec", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean", T.DoubleType(), True),
    T.StructField("std", T.DoubleType(), True),
    T.StructField("p_valid", T.DoubleType(), True),
])


def decode_media(data: bytes, codec: str, h: int | None = None, w: int | None = None) -> np.ndarray:
    """Decode a media payload to a numpy array.

    ``raw-f32``: the engine's native float32-LE tile codec (real).
    Anything else (jpeg/png/wav/mp4...) requires codec libraries not present
    in this environment — STUB, clearly marked.
    """
    if codec == "raw-f32":
        if h is None or w is None:
            raise ValueError("raw-f32 requires h and w")
        return decode_tile(data, h, w)
    raise NotImplementedError(
        f"codec {codec!r}: image/audio decode libraries are not available in "
        "this container; plug a decoder in here (the Spark plumbing around "
        "this function is complete)"
    )


def media_features(
    media: DataFrame,
    codec: str = "raw-f32",
) -> DataFrame:
    """Per-payload feature extraction: byte size, dims, mean/std/valid-share.

    Input schema: (media_ref, h, w, data). Batches stream through Arrow;
    nothing is collected.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = {"media_ref": r.media_ref, "codec": codec,
                       "n_bytes": len(r.data), "width": None, "height": None,
                       "mean": None, "std": None, "p_valid": None}
                try:
                    arr = decode_media(r.data, codec, r.h, r.w)
                    valid = ~np.isnan(arr)
                    rec.update(
                        width=int(arr.shape[1]), height=int(arr.shape[0]),
                        mean=float(np.nanmean(arr)) if valid.any() else None,
                        std=float(np.nanstd(arr)) if valid.any() else None,
                        p_valid=float(valid.mean()),
                    )
                except NotImplementedError:
                    pass  # undecodable codec: byte-level features only
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields])

    return media.select("media_ref", "h", "w", "data").mapInPandas(
        extract, schema=MEDIA_FEATURES_SCHEMA
    )


def resize_media(media: DataFrame, out_h: int, out_w: int, codec: str = "raw-f32") -> DataFrame:
    """Resize payloads to (out_h, out_w) — real for raw-f32 (block mean /
    nearest), stubbed for compressed codecs."""
    from homonim_spark.kernel import ops

    schema = T.StructType([
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from homonim_spark.tiles import encode_tile
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode_media(r.data, codec, r.h, r.w)
                if arr.shape[0] >= out_h:
                    f = (arr.shape[0] // out_h, arr.shape[1] // out_w)
                    out = ops.downsample_average(arr, f)
                else:
                    f = (out_h // arr.shape[0], out_w // arr.shape[1])
                    out = ops.upsample_nearest(arr, f)
                rows.append({"media_ref": r.media_ref, "h": out.shape[0],
                             "w": out.shape[1], "data": encode_tile(out)})
            yield pd.DataFrame(rows, columns=["media_ref", "h", "w", "data"])

    return media.select("media_ref", "h", "w", "data").mapInPandas(resize, schema=schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame sampling for video-like sequences: keep payloads
    whose frame index ≡ 0 (mod every_n). Pure column pruning+filter — the
    scan never reads dropped payload bytes (parquet row-group pruning)."""
    return media.filter(F.pmod(F.col("frame_idx"), F.lit(every_n)) == 0)
