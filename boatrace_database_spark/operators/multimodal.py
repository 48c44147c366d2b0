"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not in this container, so the
decode step is a clearly-marked deterministic stub — but the Spark-side
contract is real and tested: binary columns travel as `binary`, feature
extraction runs as Arrow-batched `mapInPandas` over (id, payload,
metadata-struct) rows, output schema is typed, and partitioning is by
id so payload bytes never shuffle twice.

At 100 TB: payloads live in parquet binary columns (or object-store
pointers); `spark.sql.files.maxPartitionBytes` bounds scan partitions;
the per-batch kernel bounds executor memory via
`spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def to_media_table(
    df: DataFrame, id_col: str, text_col: str, source_col: str
) -> DataFrame:
    """Wrap any table into the canonical media layout (binary + metadata).

    Here the payload is the utf-8 encoding of a text column (the
    container has no real media); with real data this is
    `spark.read.format('binaryFile')` output mapped to the same schema.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col(source_col).alias("source"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


def _pil_image():
    """Optional-import hook: Pillow if installed, else None. The
    container this repo is developed in ships no media libraries, so
    every real-decode path degrades to a clear NotImplementedError —
    but when Pillow IS present (a real deployment), `use_stub=False`
    decodes actual image bytes with no code change."""
    try:  # pragma: no cover - exercised only where Pillow exists
        from PIL import Image

        return Image
    except ImportError:
        return None


def _decode_real(payload: bytes) -> tuple[int, int]:
    """Real decode: Pillow when available (width, height), else a
    clearly-marked NotImplementedError — see extract_features' stub."""
    image_mod = _pil_image()
    if image_mod is None:
        raise NotImplementedError("media decode libraries not installed")
    import io  # pragma: no cover - Pillow-only path

    with image_mod.open(io.BytesIO(payload)) as im:  # pragma: no cover
        return im.width, im.height


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, use_stub: bool = True
) -> DataFrame:
    """Resize transform: binary in -> binary out, same media layout.

    STUB resample: the payload is truncated/cycled to exactly
    width*height bytes (a real implementation decodes, resamples with
    PIL/ffmpeg, re-encodes — same signature). The plumbing is the real
    pattern: payload bytes stay inside one Arrow batch, metadata updates
    in place, output schema identical so resize stages compose.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            if use_stub:
                def _resize(b: bytes) -> bytes:
                    if not b:
                        return bytes(target)
                    reps = -(-target // len(b))  # ceil
                    return (bytes(b) * reps)[:target]
            else:
                image_mod = _pil_image()
                if image_mod is None:
                    raise NotImplementedError(
                        "real media resample needs Pillow installed"
                    )

                def _resize(b: bytes) -> bytes:  # pragma: no cover
                    import io

                    with image_mod.open(io.BytesIO(bytes(b))) as im:
                        buf = io.BytesIO()
                        im.resize((width, height)).save(buf, format="PNG")
                        return buf.getvalue()

            out = pdf.copy()
            out["payload"] = pdf["payload"].map(_resize)
            out["meta"] = [
                {**m, "n_bytes": len(p)}
                for m, p in zip(out["meta"], out["payload"])
            ]
            yield out

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 4,
    use_stub: bool = True,
) -> DataFrame:
    """Frame sampling: one media row -> many frame rows (the video
    pattern). STUB decode: the payload is treated as a container of
    fixed-size frames and every n-th one is emitted; real ffmpeg
    keyframe extraction has the same one-to-many mapInPandas shape.
    Partitioning stays by media_id — frames of one clip never split
    across tasks, so downstream per-clip ops need no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_stub:  # pragma: no cover
                raise NotImplementedError("real frame decode not available")
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(len(b) // frame_bytes, 1)
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(b[fno * frame_bytes:(fno + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.mapInPandas(batches, schema=FRAMES_SCHEMA)


def extract_features(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    STUB decode: width/height are deterministic functions of the id and
    the checksum is a byte-sum — fake values, REAL plumbing (binary in,
    typed struct out, bounded batches).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            if use_stub:
                width = (pdf["media_id"] % 640 + 1).astype("int32")
                height = (pdf["media_id"] % 480 + 1).astype("int32")
            else:
                # true dimensions via Pillow when installed; a clear
                # NotImplementedError (from _decode_real) otherwise
                dims = [_decode_real(bytes(b)) for b in payloads]
                width = pd.Series(
                    [d[0] for d in dims], index=pdf.index, dtype="int32"
                )
                height = pd.Series(
                    [d[1] for d in dims], index=pdf.index, dtype="int32"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "width": width,
                    "height": height,
                    "checksum": payloads.map(lambda b: sum(b) % 2**31).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)
