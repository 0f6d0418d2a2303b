"""Multimodal columns (SURVEY.md §2.9 X5; BASELINE.json north star).

Media (image/audio/video/PDF pages) are opaque ``binary`` columns
with a typed metadata struct alongside. The Spark-side plumbing —
schema, Arrow batch shape, partition sizing, UDF signatures — is real
and tested; the actual codec work (JPEG decode, resampling, frame
sampling) requires media libraries absent from this container, so
each codec is pluggable: production passes a PIL/ffmpeg-backed
callable, tests use the deterministic fake codec.

Scale shape: ``mapInPandas`` over batches of binary rows keeps the
pipeline streaming (never materializes a partition of decoded media
in memory at once — Arrow batches bound the working set). Media
tables partition by content size so a few giant videos don't skew
tasks: ``repartitionByRange("n_bytes")`` before heavy decode stages.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video | pdf_page
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


try:  # detect-and-register: the real codec activates when the env has PIL
    from PIL import Image as _PILImage  # noqa: N812

    HAS_PIL = True
except ImportError:  # this container ships no media libs — fake codec path
    _PILImage = None
    HAS_PIL = False


def fake_image_codec(content: bytes) -> dict:
    """Deterministic stand-in for an image decoder: 'dimensions' and an
    8-dim 'embedding' derived from the content hash. Real deployments
    pass a PIL/torchvision-backed callable with the same contract."""
    h = hashlib.sha256(content).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "feature": [((b / 255.0) * 2 - 1) for b in h[2:10]],
    }


def pil_image_codec(content: bytes) -> dict:
    """PIL-backed decode: true dimensions plus an 8-bin luminance
    histogram (mass-normalized) as the feature — deterministic, no ML
    dependency. Same contract as :func:`fake_image_codec`, so the two
    are drop-in interchangeable and every downstream test/plan holds
    on either.

    PIL is imported HERE, not from the module-global probe: the probe
    runs on the driver, but this function executes inside executor
    tasks — on a cluster whose executor images lack PIL the global
    would be None and every task would die with a bare AttributeError
    deep in the Arrow loop. The local import turns that into one clear
    error naming the real problem."""
    import io

    try:
        from PIL import Image  # noqa: N817 — executor-side import
    except ImportError as e:  # driver had PIL, this executor does not
        raise RuntimeError(
            "pil_image_codec needs PIL on the EXECUTORS (the driver-side "
            "probe saw it, this task's environment does not); install "
            "Pillow in the executor image or pass codec=fake_image_codec."
        ) from e
    with Image.open(io.BytesIO(content)) as img:
        width, height = img.size
        hist = img.convert("L").histogram()  # 256 luminance bins
    total = float(sum(hist)) or 1.0
    feature = [sum(hist[i * 32 : (i + 1) * 32]) / total for i in range(8)]
    return {"width": width, "height": height, "feature": feature}


def numpy_image_codec(content: bytes) -> dict:
    """REAL image decode with no media library at all — numpy + struct
    only — for the uncompressed formats whose bit layout is public and
    trivial: BMP (24/32-bit BI_RGB, BITMAPINFOHEADER family) and binary
    PPM/PGM (P6/P5, maxval ≤ 255).

    Same contract and same feature definition as :func:`pil_image_codec`
    (8-bin mass-normalized luminance histogram, ITU-R 601-2 luma with
    PIL's fixed-point rounding ``(19595R + 38470G + 7471B + 2^15) >> 16``),
    so the two codecs agree on any image both can read and are drop-in
    interchangeable. This is the sandbox-executable real path: unlike
    :func:`pil_image_codec` it needs nothing beyond numpy, which Arrow
    already requires.

    Raises ``ValueError`` naming the format on anything else (JPEG/PNG
    need entropy decoders — that's what the PIL path is for).
    """
    import struct

    import numpy as np

    if content[:2] == b"BM":
        if len(content) < 54:
            raise ValueError("BMP truncated before BITMAPINFOHEADER")
        data_off = struct.unpack_from("<I", content, 10)[0]
        hdr_size = struct.unpack_from("<I", content, 14)[0]
        if hdr_size < 40:
            raise ValueError(f"BMP with {hdr_size}-byte DIB header not supported (BITMAPCOREHEADER)")
        width, height_raw = struct.unpack_from("<ii", content, 18)
        bpp, compression = struct.unpack_from("<H", content, 28)[0], struct.unpack_from("<I", content, 30)[0]
        if compression not in (0, 3) or bpp not in (24, 32):
            raise ValueError(
                f"BMP bpp={bpp} compression={compression} not supported "
                "(BI_RGB 24/32, or BI_BITFIELDS with the standard BGRA masks)"
            )
        if compression == 3:
            # BI_BITFIELDS: the decode below assumes little-endian BGRA
            # byte order, i.e. masks R=0x00FF0000 G=0x0000FF00
            # B=0x000000FF. Parse the mask dwords (they follow the
            # 40-byte BITMAPINFOHEADER / live at the same offset inside
            # V4/V5 headers) and refuse any other layout rather than
            # decode silently wrong (ADVICE r5: an RGBA-masked file put
            # pure red in the blue luma bin).
            if len(content) < 66:
                raise ValueError("BMP BI_BITFIELDS truncated before channel masks")
            rmask, gmask, bmask = struct.unpack_from("<III", content, 54)
            if bpp != 32 or (rmask, gmask, bmask) != (0x00FF0000, 0x0000FF00, 0x000000FF):
                raise ValueError(
                    f"BMP BI_BITFIELDS masks R={rmask:#010x} G={gmask:#010x} "
                    f"B={bmask:#010x} bpp={bpp} not supported (standard "
                    "BGRA 0x00FF0000/0x0000FF00/0x000000FF 32-bpp only)"
                )
        height, top_down = abs(height_raw), height_raw < 0
        stride = ((bpp * width + 31) // 32) * 4
        raw = np.frombuffer(content, dtype=np.uint8, count=stride * height, offset=data_off)
        rows = raw.reshape(height, stride)[:, : width * (bpp // 8)].reshape(height, width, bpp // 8)
        if not top_down:
            rows = rows[::-1]
        rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    elif content[:2] in (b"P6", b"P5"):
        channels = 3 if content[:2] == b"P6" else 1
        pos, fields = 2, []
        while len(fields) < 3:  # width, height, maxval; '#' comments allowed
            while pos < len(content) and content[pos : pos + 1].isspace():
                pos += 1
            if content[pos : pos + 1] == b"#":
                pos = content.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(content) and not content[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(content[start:pos]))
        pos += 1  # single whitespace after maxval, then raster
        width, height, maxval = fields
        if maxval > 255:
            raise ValueError(f"PNM maxval={maxval} (16-bit) not supported")
        raw = np.frombuffer(content, dtype=np.uint8, count=width * height * channels, offset=pos)
        pix = raw.reshape(height, width, channels)
        rgb = pix if channels == 3 else np.repeat(pix, 3, axis=2)
    else:
        raise ValueError(
            f"numpy_image_codec reads BMP/P6/P5 only; got magic {content[:4]!r} "
            "(compressed formats need the PIL-backed codec)"
        )
    r, g, b = (rgb[:, :, i].astype(np.uint32) for i in range(3))
    lum = (19595 * r + 38470 * g + 7471 * b + (1 << 15)) >> 16
    hist = np.bincount(lum.ravel() >> 5, minlength=8)  # 8 bins of 32 levels
    total = float(hist.sum()) or 1.0
    return {"width": int(width), "height": int(height), "feature": [float(v) / total for v in hist]}


# image magics numpy_image_codec can decode without any media library
_NUMPY_DECODABLE = (b"BM", b"P6", b"P5")


def real_image_codec(content: bytes) -> dict:
    """The real-decode dispatcher: PIL when the environment has it
    (all formats), else the numpy decoder for the formats it covers.
    Only a compressed format in a PIL-less environment is undecodable."""
    if HAS_PIL:
        return pil_image_codec(content)
    if content[:2] in _NUMPY_DECODABLE:
        return numpy_image_codec(content)
    raise NotImplementedError(
        "No image library in this environment and content is not BMP/PPM/PGM; "
        "pass codec=fake_image_codec or a PIL-backed callable returning "
        "{'width','height','feature'}."
    )


# what extract_media_features uses when the caller passes no codec:
# the real decoder when the environment provides one, else the
# deterministic fake — the pipeline shape is identical either way.
default_image_codec = real_image_codec if HAS_PIL else fake_image_codec


def extract_media_features(
    media: DataFrame,
    codec: Callable[[bytes], dict] | None = None,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode/feature-extract media via an Arrow-batched pandas UDF.

    One output row per media row: content hash, dimensions, embedding.
    The codec runs once per row inside the batch loop — no Python
    round-trip per column. With no explicit codec this uses
    :data:`default_image_codec` — PIL-backed when the environment has
    PIL, the deterministic fake otherwise — so the operator is usable
    (not a stub) in every environment.
    """
    decode = codec or default_image_codec

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            # per-item loop is inherent to decoding; zip over columns
            # avoids iterrows' per-row Series construction
            for mid, kind, content in zip(batch["media_id"], batch["kind"], batch["content"]):
                content = bytes(content)
                d = decode(content)
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "content_sha": hashlib.sha256(content).hexdigest(),
                        "width": d["width"],
                        "height": d["height"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    cols = media.select("media_id", "kind", "content")
    return cols.mapInPandas(process, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def y4m_video_codec(content: bytes, sample_every: int = 1, max_frames: int | None = None) -> dict:
    """REAL video decode with numpy only: YUV4MPEG2 (.y4m) is raw
    frames behind a one-line text header — the uncompressed interchange
    format every codec toolchain (ffmpeg, x264, VMAF) reads and writes.
    Returns dims/rate plus one 8-bin LUMA histogram per sampled frame
    (the Y plane IS luminance — no color math needed).

    ``sample_every``/``max_frames`` implement frame sampling at the
    codec layer, so a 10k-frame clip decodes only what the pipeline
    keeps. Compressed containers (mp4/webm) need ffmpeg — pass a codec
    with this same contract there.
    """
    import numpy as np

    if content[:9] != b"YUV4MPEG2":
        raise ValueError(f"not a YUV4MPEG2 stream (magic {content[:9]!r})")
    nl = content.index(b"\n")
    header = content[:nl].split(b" ")
    width = height = 0
    fps_num, fps_den, subsampling = 0, 1, b"420"
    for tok in header[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"F":
            fps_num, fps_den = (int(x) for x in tok[1:].split(b":"))
        elif tok[:1] == b"C":
            subsampling = tok[1:]
    if not width or not height:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if subsampling.startswith(b"420"):
        frame_bytes = width * height + 2 * ((width // 2) * (height // 2))
    elif subsampling.startswith(b"422"):
        frame_bytes = width * height + 2 * ((width // 2) * height)
    elif subsampling.startswith(b"444"):
        frame_bytes = 3 * width * height
    elif subsampling.startswith(b"mono"):
        frame_bytes = width * height
    else:
        raise ValueError(f"YUV4MPEG2 subsampling {subsampling!r} not supported")

    pos, frame_idx, frames = nl + 1, 0, []
    luma = width * height
    while pos < len(content):
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = content.index(b"\n", pos) + 1  # FRAME line may carry params
        if frame_idx % sample_every == 0 and (max_frames is None or len(frames) < max_frames):
            y = np.frombuffer(content, dtype=np.uint8, count=luma, offset=pos)
            hist = np.bincount(y >> 5, minlength=8)
            total = float(hist.sum()) or 1.0
            frames.append(
                {"frame_idx": frame_idx, "feature": [float(v) / total for v in hist]}
            )
        pos += frame_bytes
        frame_idx += 1
    return {
        "width": width,
        "height": height,
        "fps": fps_num / fps_den if fps_den else 0.0,
        "n_frames": frame_idx,
        "frames": frames,
    }


def sample_video_frames(
    media: DataFrame,
    sample_every: int = 1,
    max_frames: int | None = None,
    codec: Callable[..., dict] | None = None,
) -> DataFrame:
    """Frame sampling over a video column: one output row per KEPT
    frame (media_id, frame_idx, dims, per-frame feature), Arrow-batched
    via ``mapInPandas`` like the image/audio paths. Defaults to the
    library-free :func:`y4m_video_codec`; an ffmpeg-backed callable
    with the same contract handles compressed containers.

    Scale shape: sampling happens INSIDE the codec (skipped frames are
    never materialized), and the fan-out (rows per video) is bounded by
    ``max_frames`` — so output size is controlled even for hour-long
    clips. Partition by ``n_bytes`` first (:func:`skew_balanced`) when
    clip sizes vary wildly.
    """
    decode = codec or y4m_video_codec

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, content in zip(batch["media_id"], batch["content"]):
                d = decode(bytes(content), sample_every=sample_every, max_frames=max_frames)
                for fr in d["frames"]:
                    out.append(
                        {
                            "media_id": mid,
                            "frame_idx": fr["frame_idx"],
                            "width": d["width"],
                            "height": d["height"],
                            "feature": fr["feature"],
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(process, schema=FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def wav_audio_codec(content: bytes) -> dict:
    """REAL audio decode with the stdlib ``wave`` module + numpy — no
    media library. PCM 8/16/24/32-bit, any channel count. The feature
    is an 8-segment RMS envelope (mono mixdown, equal time slices,
    normalized to full scale) — deterministic and library-free.

    Compressed audio (mp3/ogg/aac) needs an entropy decoder; pass an
    ffmpeg/soundfile-backed callable with this same contract there.
    """
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content)) as w:
        n_channels, sampwidth = w.getnchannels(), w.getsampwidth()
        sample_rate, n_frames = w.getframerate(), w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 1:  # PCM 8-bit is unsigned
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        full_scale = 128.0
    elif sampwidth in (2, 4):
        samples = np.frombuffer(raw, dtype=f"<i{sampwidth}").astype(np.float64)
        full_scale = float(1 << (8 * sampwidth - 1))
    elif sampwidth == 3:  # 24-bit: widen each triple to int32 via a zero pad + shift
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        widened = np.zeros((b.shape[0], 4), dtype=np.uint8)
        widened[:, 1:] = b
        samples = (widened.view("<i4").ravel() >> 8).astype(np.float64)
        full_scale = float(1 << 23)
    else:
        raise ValueError(f"WAV sample width {sampwidth} not supported")
    mono = samples.reshape(-1, n_channels).mean(axis=1) if n_channels > 1 else samples
    feature = []
    for seg in np.array_split(mono, 8):
        rms = float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0
        feature.append(rms / full_scale)
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": n_frames,
        "duration_s": n_frames / sample_rate if sample_rate else 0.0,
        "feature": feature,
    }


def extract_audio_features(
    media: DataFrame,
    codec: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Audio twin of :func:`extract_media_features`: Arrow-batched
    decode via ``mapInPandas``, one row per media row with rate /
    channels / duration and the RMS-envelope feature. Defaults to the
    library-free :func:`wav_audio_codec`."""
    decode = codec or wav_audio_codec

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, content in zip(batch["media_id"], batch["content"]):
                content = bytes(content)
                d = decode(content)
                out.append(
                    {
                        "media_id": mid,
                        "content_sha": hashlib.sha256(content).hexdigest(),
                        "sample_rate": d["sample_rate"],
                        "n_channels": d["n_channels"],
                        "n_frames": d["n_frames"],
                        "duration_s": d["duration_s"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(process, schema=AUDIO_FEATURE_SCHEMA)


# magic-byte prefixes → mime, longest first (hex of the leading bytes)
_MAGIC_MIME = [
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("494433", "audio/mpeg"),  # ID3-tagged mp3
    ("fffb", "audio/mpeg"),
    ("1a45dfa3", "video/webm"),
    ("59555634", "video/x-yuv4mpeg"),  # YUV4MPEG2
    ("424d", "image/bmp"),
    ("5036", "image/x-portable-pixmap"),  # P6
    ("5035", "image/x-portable-graymap"),  # P5
]


def sniff_mime(content: F.Column | str) -> F.Column:
    """MIME from magic bytes as a pure JVM expression (hex prefix
    match) — metadata derivation must NOT ride the Python codec path.
    RIFF containers disambiguate on bytes 8-11 (WAVE vs AVI)."""
    c = F.col(content) if isinstance(content, str) else content
    head = F.lower(F.hex(F.substring(c, 1, 12)))
    expr = F.lit("application/octet-stream")
    for prefix, mime in reversed(_MAGIC_MIME):
        expr = F.when(head.startswith(prefix), F.lit(mime)).otherwise(expr)
    riff = head.startswith("52494646")
    expr = (
        F.when(riff & (F.substring(head, 17, 8) == F.lit("57415645")), F.lit("audio/wav"))
        .when(riff & (F.substring(head, 17, 8) == F.lit("41564920")), F.lit("video/x-msvideo"))
        .otherwise(expr)
    )
    return expr


def with_media_metadata(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Metadata-only pass, entirely JVM-side (no Arrow round-trip, no
    Python workers): payload size, sniffed MIME, content hash. Use
    this — not extract_media_features — when downstream needs only
    metadata (dedup keys, size-based routing, format filtering)."""
    c = F.col(content_col)
    return (
        media.withColumn("n_bytes", F.length(c).cast("long"))
        .withColumn("mime", sniff_mime(c))
        .withColumn("content_sha", F.sha2(c, 256))
    )


def dedup_media_exact(media: DataFrame) -> DataFrame:
    """Exact media dedup by content hash — JVM-side sha2 over the
    binary column, then one-per-hash (lowest media_id). The binary
    never leaves the JVM."""
    from waterdata_spark.operators.dedup import priority_dedup

    with_hash = media.withColumn("__sha", F.sha2(F.col("content"), 256))
    return priority_dedup(with_hash, ["__sha"], [F.col("media_id").asc()]).drop("__sha")


def skew_balanced(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Range-partition by payload size before a heavy decode stage so a
    handful of giant blobs don't serialize one task."""
    n = partitions or media.sparkSession.sparkContext.defaultParallelism
    return media.repartitionByRange(n, F.col("n_bytes"))
