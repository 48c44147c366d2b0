"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The real-decode path (`use_stub=False`) is NATIVE for BMP / PPM-PGM /
PNG / JPEG (baseline + progressive) / GIF / TIFF / WAV via the
pure-Python codecs
in `media_codecs` (no Pillow/ffmpeg needed — bytes in, pixels/samples
out, golden-tested — PNG covers palette/16-bit/Adam7 too), with
Pillow as an optional fallback for the last corners (lossless/CMYK
JPEG).
`use_stub=True` keeps the deterministic fake for corpora whose
payloads aren't media at all (e.g. the test tables' utf-8 text). The
Spark-side contract is identical either way: binary columns travel as
`binary`, feature extraction runs as Arrow-batched `mapInPandas` over
(id, payload, metadata-struct) rows, output schema is typed, and
partitioning is by id so payload bytes never shuffle twice.

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

from boatrace_database_spark.operators import media_codecs

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
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("content_mean", T.DoubleType()),
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


def _decode_real(payload: bytes) -> dict:
    """Real decode: the native pure-Python codecs (BMP/PPM/WAV) first,
    Pillow for anything else it can open, else a clear ValueError
    naming the sniffed format. Returns the `media_codecs.decode_features`
    dict either way."""
    try:
        return media_codecs.decode_features(payload)
    except ValueError as native_err:
        image_mod = _pil_image()
        if image_mod is None:
            raise ValueError(
                f"{native_err} (and Pillow is not installed for a fallback)"
            ) from native_err
        import io  # pragma: no cover - Pillow-only path

        with image_mod.open(io.BytesIO(payload)) as im:  # pragma: no cover
            return {
                "mime": image_mod.MIME.get(im.format, "image/unknown"),
                "width": im.width,
                "height": im.height,
                "channels": len(im.getbands()),
                "duration_ms": None,
                "content_mean": None,
            }


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, use_stub: bool = True
) -> DataFrame:
    """Resize transform: binary in -> binary out, same media layout.

    Real resample (``use_stub=False``): native decode
    (BMP/PPM-PGM/PNG/baseline JPEG) -> nearest-neighbor resample ->
    re-encode in the SAME format, pure Python; Pillow fallback for
    other image formats; audio payloads raise ValueError (resize of
    PCM is not defined — use `sample_frames` to window audio).

    STUB resample: the payload is truncated/cycled to exactly
    width*height bytes. Either way the plumbing is the real pattern:
    payload bytes stay inside one Arrow batch, metadata updates in
    place, output schema identical so resize stages compose.
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
                def _resize(b: bytes) -> bytes:
                    b = bytes(b)
                    mime = media_codecs.sniff_mime(b)
                    if mime == "image/bmp":
                        px = media_codecs.decode_bmp(b)["pixels"]
                        return media_codecs.encode_bmp(
                            media_codecs.resize_nearest(px, width, height)
                        )
                    if mime == "image/x-portable-pixmap":
                        px = media_codecs.decode_ppm(b)["pixels"]
                        return media_codecs.encode_ppm(
                            media_codecs.resize_nearest(px, width, height)
                        )
                    if mime == "image/x-portable-graymap":
                        px = media_codecs.decode_ppm(b)["pixels"]
                        return media_codecs.encode_pgm(
                            media_codecs.resize_nearest(px, width, height)
                        )
                    if mime == "image/png":
                        px = media_codecs.decode_png(b)["pixels"]
                        return media_codecs.encode_png(
                            media_codecs.resize_nearest(px, width, height)
                        )
                    if mime == "image/jpeg":
                        from boatrace_database_spark.operators.jpeg import (
                            decode_jpeg,
                            encode_jpeg,
                        )

                        px = decode_jpeg(b)["pixels"]
                        return encode_jpeg(
                            media_codecs.resize_nearest(px, width, height)
                        )
                    if mime == "image/gif":
                        # animated inputs resize as their first frame
                        # (the standard thumbnailer convention)
                        px = media_codecs.decode_gif(b)["pixels"]
                        return media_codecs.encode_gif(
                            media_codecs.resize_nearest(px, width, height)
                        )
                    if mime == "image/tiff":
                        px = media_codecs.decode_tiff(b)["pixels"]
                        return media_codecs.encode_tiff(
                            media_codecs.resize_nearest(px, width, height),
                            compression=5,
                        )
                    if mime == "audio/wav":
                        raise ValueError(
                            "resize_media: audio payloads have no resize "
                            "semantics — window them with sample_frames"
                        )
                    image_mod = _pil_image()
                    if image_mod is None:
                        raise ValueError(
                            f"resize_media: no native resampler for {mime} "
                            "and Pillow is not installed"
                        )
                    import io  # pragma: no cover - Pillow-only path

                    with image_mod.open(io.BytesIO(b)) as im:  # pragma: no cover
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
    pattern). Partitioning stays by media_id — frames of one clip
    never split across tasks, so downstream per-clip ops need no
    shuffle.

    Real decode (``use_stub=False``), native both ways:
    - concatenated-P6 streams (the classic raw animation container:
      frames simply appended) split on their headers — every n-th
      frame is emitted as a standalone P6 payload;
    - animated GIF: frames composited (disposal + transparency), every
      n-th emitted re-encoded as a standalone single-frame GIF;
    - multi-page TIFF: IFD-chain pages, every n-th re-encoded as a
      standalone single-page TIFF;
    - WAV: the PCM data chunk windows into ``frame_bytes``-sized
      sample blocks (block-align rounded) — audio chunking for
      feature pipelines;
    - anything else raises ValueError naming the sniffed format.

    STUB decode: the payload is treated as a container of fixed-size
    byte frames and every n-th one is emitted — same one-to-many
    mapInPandas shape as real ffmpeg keyframe extraction.
    """

    def _stub_frames(b: bytes) -> list[tuple[int, bytes]]:
        n_frames = max(len(b) // frame_bytes, 1)
        return [
            (fno, b[fno * frame_bytes : (fno + 1) * frame_bytes])
            for fno in range(0, n_frames, every_n)
        ]

    def _real_frames(b: bytes) -> list[tuple[int, bytes]]:
        mime = media_codecs.sniff_mime(b)
        if mime == "image/x-portable-pixmap":
            all_frames = media_codecs.split_ppm_stream(b)
            return [
                (fno, all_frames[fno])
                for fno in range(0, len(all_frames), every_n)
            ]
        if mime == "image/gif":
            d = media_codecs.decode_gif_frames(b)
            out = []
            for fno in range(0, len(d["frames"]), every_n):
                frame = d["frames"][fno]
                try:
                    enc = media_codecs.encode_gif(frame)
                except ValueError:
                    # an animation mixing global/local palettes (plus
                    # background fill) can legitimately composite to
                    # >256 colors on one canvas (r10 ADVICE #4) —
                    # emit the frame lossless as PNG instead of
                    # failing the sampler (downstream consumers
                    # sniff per-frame payloads anyway)
                    enc = media_codecs.encode_png(frame)
                out.append((fno, enc))
            return out
        if mime == "image/tiff":
            pages = media_codecs.decode_tiff_pages(b)
            return [
                (fno, media_codecs.encode_tiff(pages[fno]["pixels"],
                                               compression=5))
                for fno in range(0, len(pages), every_n)
            ]
        if mime == "audio/wav":
            d = media_codecs.decode_wav(b)
            block = d["n_channels"] * 2
            step = max(frame_bytes // block, 1)  # samples per window
            raw = d["samples"].tobytes()
            n_frames = max(-(-d["n_samples"] // step), 1)
            return [
                (fno, raw[fno * step * block : (fno + 1) * step * block])
                for fno in range(0, n_frames, every_n)
            ]
        raise ValueError(f"sample_frames: no native frame decoder for {mime}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        split = _stub_frames if use_stub else _real_frames
        for pdf in it:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for fno, frame in split(bytes(payload)):
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(frame)
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

    Real decode (``use_stub=False``): native BMP/PPM/WAV codecs (pure
    Python, no libraries), Pillow fallback for other image formats —
    true dimensions/channels for images, duration/channels for audio,
    plus a content mean (pixel value or |sample|). Sniffed mime
    replaces the metadata's claim.

    STUB decode: width/height are deterministic functions of the id and
    the checksum is a byte-sum — fake values, REAL plumbing (binary in,
    typed struct out, bounded batches) for corpora whose payloads
    aren't media at all.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            if use_stub:
                out = pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "n_bytes": payloads.map(len).astype("int32"),
                        "mime": pdf["meta"].map(lambda m: m["mime"]),
                        "width": (pdf["media_id"] % 640 + 1).astype("int32"),
                        "height": (pdf["media_id"] % 480 + 1).astype("int32"),
                        "channels": pd.Series(
                            [None] * len(pdf), index=pdf.index, dtype="object"
                        ),
                        "duration_ms": pd.Series(
                            [None] * len(pdf), index=pdf.index, dtype="object"
                        ),
                        "content_mean": pd.Series(
                            [None] * len(pdf), index=pdf.index, dtype="object"
                        ),
                    }
                )
            else:
                feats = [_decode_real(bytes(b)) for b in payloads]
                out = pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "n_bytes": payloads.map(len).astype("int32"),
                        "mime": [f["mime"] for f in feats],
                        "width": pd.Series(
                            [f["width"] for f in feats],
                            index=pdf.index,
                            dtype="object",
                        ),
                        "height": pd.Series(
                            [f["height"] for f in feats],
                            index=pdf.index,
                            dtype="object",
                        ),
                        "channels": pd.Series(
                            [f["channels"] for f in feats],
                            index=pdf.index,
                            dtype="object",
                        ),
                        "duration_ms": pd.Series(
                            [f["duration_ms"] for f in feats],
                            index=pdf.index,
                            dtype="object",
                        ),
                        "content_mean": pd.Series(
                            [f["content_mean"] for f in feats],
                            index=pdf.index,
                            dtype="object",
                        ),
                    }
                )
            out["checksum"] = payloads.map(lambda b: sum(b) % 2**31).astype(
                "int64"
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def dhash_media(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) per image payload — the
    standard near-duplicate fingerprint for IMAGE corpora (crops,
    re-encodes, brightness shifts hash close; unrelated images hash
    ~bits/2 apart): decode natively (`media_codecs.decode_pixels` —
    BMP/PPM-PGM/PNG/baseline JPEG, real bytes→pixels), integer-mean
    grayscale,
    nearest-neighbor resample to (hash_size+1) × hash_size, then bit
    k = r·hash_size + c set iff g[r,c] > g[r,c+1]. Returns
    (media_id, dhash LONG) with hash_size² bits.

    Every step is integer arithmetic on deterministic indices, so for
    closed-form pixel content the hash is SQL-re-derivable — the
    `media_dedup_dhash` catalog entry exploits exactly that. Pair
    generation composes with `dedup.hamming_pairs_banded` (the
    simhash blocking, reused verbatim): banded equi-join, never
    all-pairs, with the pigeonhole completeness guarantee when
    max_hamming < n_chunks.

    Scale shape: one Arrow-batched decode+hash pass, no shuffle; the
    resample is index arithmetic (`media_codecs.resize_nearest`), the
    comparisons one vectorized numpy expression per image.
    """
    import numpy as np

    if hash_size * hash_size > 64:
        # mirrors stream_dedup_dhash's chunk_bits validation: bit index
        # k = hash_size²-1 must fit a 64-bit lane (uint64 shifts beyond
        # 63 are undefined in numpy) and the declared LONG column
        raise ValueError(
            f"dhash_media: hash_size={hash_size} needs {hash_size * hash_size} "
            "bits; the dhash LONG column holds at most 64 (hash_size <= 8)"
        )

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            hashes = []
            for payload in pdf["payload"]:
                px = media_codecs.decode_pixels(bytes(payload))
                if px.ndim == 3:
                    # integer-mean grayscale (floor), SQL-replicable
                    g = px.astype(np.int64).sum(axis=2) // px.shape[2]
                else:
                    g = px.astype(np.int64)
                want = (hash_size, hash_size + 1)
                if g.shape != want:
                    g = media_codecs.resize_nearest(
                        g, width=hash_size + 1, height=hash_size
                    )
                bits = g[:, :-1] > g[:, 1:]
                k = np.arange(hash_size * hash_size, dtype=np.uint64)
                h = int((bits.reshape(-1).astype(np.uint64) << k).sum())
                # two's-complement into LONG for hash_size=8's bit 63
                hashes.append(h - (1 << 64) if h >= 1 << 63 else h)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "dhash": pd.Series(hashes, dtype="int64")}
            )

    id_type = media.schema["media_id"].dataType.simpleString()
    return media.mapInPandas(batches, f"media_id {id_type}, dhash LONG")


# ---------------------------------------------------------------------------
# audio fingerprinting (round 10) — the audio face of perceptual dedup


def _hk_subfingerprints(
    samples: "np.ndarray",
    frame_len: int = 1024,
    hop: int = 512,
    n_bands: int = 33,
) -> "np.ndarray":
    """Haitsma–Kalker sub-fingerprints (the published 'robust audio
    hashing' scheme): Hann-windowed overlapping frames -> power
    spectrum -> 33 log-spaced bands -> bit(m) = sign of the
    time-derivative of the band-energy difference
    (E(n,m)−E(n,m+1)) − (E(n−1,m)−E(n−1,m+1)). Returns
    (n_frames−1, 32) bool — one 32-bit fingerprint per frame
    transition, robust to gain, mild noise, and re-encoding, which is
    exactly what audio near-dup needs. Band edges are log-spaced over
    FFT bins frame_len/32..frame_len/4 (sample-rate independent by
    construction; the relative analog of the paper's absolute
    300–2000 Hz band, whose absolute form would make the hash depend
    on the clip's sr metadata). Starting at frame_len/32 rather than
    bin 2 keeps the geometric step above one bin for every practical
    frame_len, so the bands really ARE log-spaced (r10 ADVICE #1: a
    bin-2 start always collided after integer rounding and silently
    fell back to linear spacing) and the noise-dominated 1-bin bottom
    bands that broke exact-word candidate lookup are excluded — the
    same reason the paper cuts below 300 Hz. Residual rounding
    collisions (small frame_len) push each edge one past its
    predecessor, keeping the edges strictly increasing with the last
    edge exactly frame_len/4."""
    import numpy as _np

    # frame_len >= 32 keeps frame_len//32 >= 1 — below that, geomspace
    # would be fed a 0 start and raise an opaque "cannot include zero"
    # instead of this contract error (r11 ADVICE #3)
    if frame_len < 32 or frame_len // 4 - frame_len // 32 < n_bands + 1:
        raise ValueError(
            f"_hk_subfingerprints: frame_len={frame_len} cannot fit "
            f"{n_bands} strictly increasing bands in bins "
            "frame_len/32..frame_len/4 (frame_len must be >= 32)"
        )
    x = _np.asarray(samples, dtype=_np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if len(x) < 2 * frame_len:
        x = _np.pad(x, (0, 2 * frame_len - len(x)))
    n_frames = (len(x) - frame_len) // hop + 1
    idx = _np.arange(frame_len)[None, :] + hop * _np.arange(n_frames)[:, None]
    win = _np.hanning(frame_len)
    spec = _np.abs(_np.fft.rfft(x[idx] * win, axis=1)) ** 2
    edges = _np.empty(n_bands + 1, dtype=_np.int64)
    prev = frame_len // 32 - 1
    for j, v in enumerate(
        _np.geomspace(frame_len // 32, frame_len // 4, n_bands + 1)
    ):
        prev = max(prev + 1, int(round(v)))
        edges[j] = prev
    # the forward +1 cascade can overshoot the top edge by a step when
    # rounding collisions pile up near frame_len/4 (small frame_len);
    # a backward clamp restores the documented invariant — strictly
    # increasing edges ending EXACTLY at frame_len//4 — and is a no-op
    # for the default 1024/33 geometry (r11 ADVICE #3). Feasibility is
    # the guard above: span >= n_bands+1 bins leaves room for every
    # edge after clamping.
    edges[n_bands] = frame_len // 4
    for j in range(n_bands - 1, -1, -1):
        edges[j] = min(edges[j], edges[j + 1] - 1)
    energies = _np.add.reduceat(spec, edges[:-1], axis=1)
    diff = energies[:, :-1] - energies[:, 1:]  # (n_frames, n_bands-1)
    return (diff[1:] - diff[:-1]) > 0


def audio_fingerprints(
    media: DataFrame,
    frame_len: int = 1024,
    hop: int = 512,
) -> DataFrame:
    """Per-frame 32-bit Haitsma–Kalker sub-fingerprints for WAV
    payloads: (media_id, frame_no, fp LONG — the unsigned 32-bit word,
    kept non-negative because Spark's bit_count sign-extends a
    negative INT to 64 bits, which would add 32 phantom bits to every
    mixed-sign xor). One Arrow batch per task, no shuffle — downstream
    per-clip matching groups on media_id, which the media table is
    already partitioned by."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        for pdf in it:
            ids, nos, fps = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.decode_wav(bytes(payload))
                bits = _hk_subfingerprints(d["samples"], frame_len, hop)
                words = _np.packbits(
                    bits.astype(_np.uint8), axis=1
                ).view(">u4")[:, 0]
                for fno, w in enumerate(words):
                    ids.append(mid)
                    nos.append(fno)
                    fps.append(int(w))  # unsigned word in the LONG lane
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "fp": pd.Series(fps, dtype="int64"),
                }
            )

    return media.mapInPandas(
        batches, "media_id LONG, frame_no INT, fp LONG"
    )


def audio_dedup_pairs(
    media: DataFrame,
    max_ber: float = 0.25,
    frame_len: int = 1024,
    hop: int = 512,
) -> DataFrame:
    """Audio near-dup pairs over aligned WAV clips — the audio twin of
    the dHash image path, using the PAPER's own lookup design rather
    than a folded clip hash (the H–K derivative bits average toward
    0.5 over a stationary clip, so a majority fold has no margin;
    measured before this design was chosen):

    1. candidates: clips sharing at least ONE EXACT 32-bit
       sub-fingerprint — an equi-join on the fp value, never
       all-pairs. Under mild distortion some frame survives bit-exact
       with high probability (the scheme's published lookup premise).
    2. verify: for candidate pairs only, join the two fingerprint
       streams frame-by-frame and compute the bit error rate; keep
       pairs with BER <= max_ber (the paper's decision rule, 0.35 in
       the original; tighter default here since clips are aligned).

    Returns (id_a, id_b, ber). Scope: equal-length, time-aligned
    clips (re-takes/re-encodes of the same recording). Offset-robust
    matching = the paper's block search over frame windows — compose
    `audio_fingerprints` with a window join if needed.

    At scale: the fp equi-join shuffles (fp, id) postings; hot fps
    (silence) can be capped upstream with a frequency filter, the
    standard posting-list guard."""
    fps = audio_fingerprints(media, frame_len, hop).localCheckpoint(
        eager=False
    )
    a = fps.select(
        F.col("media_id").alias("id_a"),
        F.col("frame_no").alias("fno_a"),
        "fp",
    )
    b = fps.select(
        F.col("media_id").alias("id_b"),
        F.col("frame_no").alias("fno_b"),
        "fp",
    )
    cands = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    fa = fps.select(
        F.col("media_id").alias("id_a"),
        "frame_no",
        F.col("fp").alias("fp_a"),
    )
    fb = fps.select(
        F.col("media_id").alias("id_b"),
        "frame_no",
        F.col("fp").alias("fp_b"),
    )
    return (
        cands.join(fa, "id_a")
        .join(fb, ["id_b", "frame_no"])
        .groupBy("id_a", "id_b")
        .agg(
            (
                F.sum(F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
                / (F.count("*") * 32)
            ).alias("ber")
        )
        .where(F.col("ber") <= max_ber)
    )


def audio_fingerprint_arrays(
    media: DataFrame,
    frame_len: int = 1024,
    hop: int = 512,
) -> DataFrame:
    """One row per clip carrying its WHOLE fingerprint stream:
    (media_id, fps ARRAY<LONG>). The long-format `audio_fingerprints`
    is the join-friendly batch face; this array face is what the
    STREAMING twin needs — a clip's stream must travel with the row so
    a stateful exact-fp bucket can verify bit-error rates without a
    second lookup."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        for pdf in it:
            arrs = []
            for payload in pdf["payload"]:
                d = media_codecs.decode_wav(bytes(payload))
                bits = _hk_subfingerprints(d["samples"], frame_len, hop)
                words = _np.packbits(
                    bits.astype(_np.uint8), axis=1
                ).view(">u4")[:, 0]
                arrs.append([int(w) for w in words])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fps": pd.Series(arrs, dtype="object"),
                }
            )

    id_type = media.schema["media_id"].dataType.simpleString()
    return media.mapInPandas(batches, f"media_id {id_type}, fps ARRAY<LONG>")


def audio_features(
    media: DataFrame,
    frame_len: int = 1024,
    hop: int = 512,
    rolloff_frac: float = 0.85,
) -> DataFrame:
    """Per-clip audio descriptors for WAV payloads — the audio analog
    of image `extract_features`: (media_id, duration_ms, rms, zcr,
    centroid_hz, rolloff_hz). rms is in full-scale units (int16 /
    32768); zcr is the sign-change fraction; centroid and rolloff are
    the standard power-spectrum statistics (mean over Hann frames),
    in Hz via the clip's own sample rate. One Arrow batch per task,
    deterministic numpy — no librosa needed for the classic
    descriptors."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.decode_wav(bytes(payload))
                x = d["samples"].astype(_np.float64).mean(axis=1) / 32768.0
                n = len(x)
                rms = float(_np.sqrt((x**2).mean())) if n else 0.0
                zcr = (
                    float((_np.diff(_np.signbit(x)) != 0).mean())
                    if n > 1
                    else 0.0
                )
                if n >= frame_len:
                    nf = (n - frame_len) // hop + 1
                    idx = (
                        _np.arange(frame_len)[None, :]
                        + hop * _np.arange(nf)[:, None]
                    )
                    spec = (
                        _np.abs(
                            _np.fft.rfft(x[idx] * _np.hanning(frame_len),
                                         axis=1)
                        )
                        ** 2
                    ).mean(axis=0)
                else:
                    spec = _np.abs(_np.fft.rfft(x, n=frame_len)) ** 2
                freqs = _np.fft.rfftfreq(frame_len, 1.0 / d["sample_rate"])
                total = spec.sum()
                if total > 0:
                    centroid = float((freqs * spec).sum() / total)
                    cum = _np.cumsum(spec)
                    k = int(_np.searchsorted(cum, rolloff_frac * total))
                    rolloff = float(freqs[min(k, len(freqs) - 1)])
                else:
                    centroid = rolloff = 0.0
                rows.append(
                    (mid, d["duration_ms"], round(rms, 6), round(zcr, 6),
                     round(centroid, 3), round(rolloff, 3))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_ms", "rms", "zcr",
                         "centroid_hz", "rolloff_hz"],
            )

    id_type = media.schema["media_id"].dataType.simpleString()
    return media.mapInPandas(
        batches,
        f"media_id {id_type}, duration_ms LONG, rms DOUBLE, zcr DOUBLE, "
        "centroid_hz DOUBLE, rolloff_hz DOUBLE",
    )
