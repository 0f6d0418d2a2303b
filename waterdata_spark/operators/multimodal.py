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


def real_image_codec(content: bytes) -> dict:
    if not HAS_PIL:
        raise NotImplementedError(
            "No image library in this environment; pass codec=fake_image_codec "
            "or a PIL-backed callable returning {'width','height','feature'}."
        )
    return pil_image_codec(content)


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


# magic-byte prefixes → mime, longest first (hex of the leading bytes)
_MAGIC_MIME = [
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("494433", "audio/mpeg"),  # ID3-tagged mp3
    ("fffb", "audio/mpeg"),
    ("1a45dfa3", "video/webm"),
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
