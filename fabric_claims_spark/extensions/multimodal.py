"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern (north-star spec): media lives in a ``binary`` column (or a
pointer struct for >row-size assets), with decode / feature-extract /
resize / frame-sample as Arrow-batched mapInPandas stages. The real
codecs (PIL/librosa/av) are NOT in this environment, so the decode
body is gated: with the library present it decodes; without, it
produces a deterministic fake (or raises when ``strict``) — the Spark
plumbing (schema, batching, partitioning) is identical either way and
is what the tests pin down.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size, and
decode parallelism is just partition count; repartition upstream by
payload-size histogram if assets are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover — not installed in this environment
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    Image = None
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "source_uri string, n_bytes long"
)

IMAGE_META_SCHEMA = (
    "media_id long, n_bytes long, format string, width int, height int, "
    "sha256 string"
)


def wrap_as_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Lift any binary column into the media-table shape."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).alias("payload"),
        F.lit(None).cast("string").alias("source_uri"),
        F.length(payload_col).cast("long").alias("n_bytes"),
    )


def _fake_dims(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real decode: pseudo-dimensions
    derived from the content hash (stable across runs/partitions)."""
    h = hashlib.sha256(payload).digest()
    return "FAKE", 64 + h[0] % 192, 64 + h[1] % 192


def decode_image_metadata(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode stage: payload → (format, width, height, sha256).

    With PIL installed this opens the real image; otherwise it emits
    the deterministic fake (or raises NotImplementedError if
    ``strict`` — mark clearly that decode is stubbed here).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            fmts, widths, heights, hashes = [], [], [], []
            for payload in pdf["payload"]:
                data = bytes(payload)
                hashes.append(hashlib.sha256(data).hexdigest())
                if _HAS_PIL:
                    with Image.open(io.BytesIO(data)) as im:
                        fmts.append(im.format or "UNKNOWN")
                        widths.append(im.width)
                        heights.append(im.height)
                elif strict:
                    raise NotImplementedError(
                        "image decode requires PIL; not available in this environment"
                    )
                else:
                    f, w, h = _fake_dims(data)
                    fmts.append(f)
                    widths.append(w)
                    heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "format": fmts,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "sha256": hashes,
                }
            )

    return media.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: expands each asset into frame-index
    rows (the decode of each frame is another mapInPandas stage). The
    expansion itself is pure Catalyst — no Python."""
    n_frames = (F.col("n_bytes") / 1024).cast("int") + 1  # stub: 1 frame/KiB
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


RESIZED_SCHEMA = (
    "media_id long, payload binary, width int, height int, resized boolean"
)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, strict: bool = False
) -> DataFrame:
    """Resize stage: payload → fixed-``width``×``height`` payload (the
    training-set normalization step). With PIL present it resizes for
    real; without, it emits a deterministic fake payload of the
    canonical byte size (3·w·h, as an RGB raster would be) derived
    from the content hash — or raises if ``strict``. Either way the
    Spark side is identical: Arrow-batched mapInPandas, bounded by
    maxRecordsPerBatch × payload size."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                data = bytes(payload)
                if _HAS_PIL:
                    with Image.open(io.BytesIO(data)) as im:
                        buf = io.BytesIO()
                        im.resize((width, height)).save(buf, format=im.format)
                        out.append(buf.getvalue())
                elif strict:
                    raise NotImplementedError(
                        "image resize requires PIL; not available in this environment"
                    )
                else:
                    seed = hashlib.sha256(data).digest()
                    reps = (3 * width * height) // len(seed) + 1
                    out.append((seed * reps)[: 3 * width * height])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": pd.array([width] * len(pdf), dtype="int32"),
                    "height": pd.array([height] * len(pdf), dtype="int32"),
                    "resized": [True] * len(pdf),
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


FEATURES_SCHEMA = "media_id long, embedding array<float>"


def extract_features(
    media: DataFrame, dim: int = 16, strict: bool = False
) -> DataFrame:
    """Feature-extraction stage: payload → ``dim``-float embedding.
    The real model (CLIP/ViT/wav2vec) is NOT in this environment, so
    the stub derives a deterministic unit-norm vector from the
    content hash (identical content → identical embedding, so the
    downstream dedup/ANN operators behave like they would on real
    features) — or raises if ``strict``. Output feeds the similarity
    suite directly (kmeans_assignments, ivf_index_build,
    hyperplane_neardup_pairs)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                if strict:
                    raise NotImplementedError(
                        "feature extraction requires a model runtime; "
                        "not available in this environment"
                    )
                h = hashlib.sha256(bytes(payload)).digest()
                # offsets step 4 mod 29 (prime): 16 DISTINCT 4-byte
                # windows over the 32-byte digest — a %28 modulus
                # would cycle after 7 slots, duplicating components
                # 7.. and leaving the embedding rank-deficient for
                # the downstream kmeans/IVF/LSH consumers
                raw = [
                    int.from_bytes(h[(4 * i) % 29 : (4 * i) % 29 + 4], "big")
                    / 2**32
                    - 0.5
                    for i in range(dim)
                ]
                norm = sum(x * x for x in raw) ** 0.5 or 1.0
                vecs.append([float(x / norm) for x in raw])
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)
