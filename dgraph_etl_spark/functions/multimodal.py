"""Multimodal column plumbing (SURVEY.md C9 + north star "multimodal
columns").

Media payloads are opaque ``binary`` columns with a typed metadata
struct riding alongside. The Spark-side machinery -- schema, batch
iteration, partition sizing, UDF signatures -- is real and tested; the
actual codec work (image decode, audio resample, video frame-sample)
is stubbed behind ``decoder=`` injection because the media libraries
aren't in this container. A production deployment passes
``decoder=pillow_decode`` (or similar) without touching the dataflow.

Scale notes:
- blobs stay in the binary column end-to-end; mapInPandas streams
  Arrow record batches so one task never materializes its partition's
  blobs at once.
- decode/feature-extract parallelizes per-partition; repartition by a
  size-balancing key (here blob length bucket) before heavy codecs so
  skewed media sizes don't straggle.
- metadata (width/height/mime/...) is a plain struct column: filter
  and prune WITHOUT touching bytes (column pruning keeps blob IO zero
  for metadata-only queries).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, "
    "meta struct<mime: string, n_bytes: bigint, kind: string>"
)

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, feature array<double>"


def to_media_table(docs: DataFrame) -> DataFrame:
    """Wrap fixture text as opaque media blobs (binary + metadata
    struct) -- the documents table standing in for an image/audio
    corpus. In production this is `spark.read.format('binaryFile')` or
    a lakehouse table with a binary column."""
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        blob.alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col("text")).cast("bigint").alias("n_bytes"),
            F.lit("blob").alias("kind"),
        ).alias("meta"),
    )


def stub_decoder(blob: bytes) -> list[float]:
    """Deterministic fake 'decode + feature extract': real codecs are
    not in this container. Production injects a real decoder; tests
    assert the plumbing (batching, schema, sizes) with this stub."""
    if blob is None:
        return [0.0, 0.0, 0.0]
    n = len(blob)
    return [float(n), float(blob[0]) if n else 0.0, float(blob[-1]) if n else 0.0]


def unavailable_decoder(blob: bytes) -> list[float]:
    """The honest production stub: fails loudly until a codec lib is
    installed (Pillow / torchaudio / pyav)."""
    raise NotImplementedError(
        "media decode requires a codec library not present in this "
        "container; inject decoder=... (see stub_decoder for the contract)"
    )


def pillow_decoder(blob: bytes) -> list[float]:
    """The REAL image lane, gated on Pillow being installed: decode the
    blob, resize to 8x8 grayscale (Image.resize -- the real resample
    the stubs stand in for), return the 64 pixel intensities as the
    feature vector (the classic average-hash embedding). Slots into
    extract_features(decoder=pillow_decoder) without touching the
    dataflow; tests/test_multimodal.py runs it under
    skipif(find_spec('PIL') is None) so the lane certifies itself the
    moment the dependency lands in the image."""
    import io

    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "pillow_decoder requires Pillow; this container has no "
            "package installs -- use stub_decoder for the plumbing tests"
        ) from None

    if blob is None:
        return [0.0] * 64
    img = Image.open(io.BytesIO(bytes(blob))).convert("L").resize((8, 8))
    return [float(p) for p in img.getdata()]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = stub_decoder,
    size_balance_partitions: int | None = None,
) -> DataFrame:
    """Decode/feature-extract over Arrow batches (mapInPandas). The
    iterator contract keeps memory at one record batch per task.

    NULL media yields NULL n_bytes/feature (the family-wide
    NULL-singleton contract; the c09 oracle's octet_length/ascii of a
    NULL likewise return NULL) -- the decoder is never called for a
    NULL blob, so injected decoders need no None branch. Columns are
    pruned to (doc_id, media) BEFORE the Arrow boundary: the meta
    struct is unused here and would otherwise be serialized per row
    (and shuffled, under size_balance_partitions) for nothing."""
    media = media.select("doc_id", "media")
    if size_balance_partitions:
        # spread rows uniformly by a per-row hash: keying on blob SIZE
        # (the previous pmod(n_bytes, 64)) co-located every same-size
        # blob -- a fixed-resolution image corpus all landed on ONE
        # straggler task, and >64 requested partitions sat idle. A
        # uniform random spread is the size-balance a decode stage
        # wants (expected bytes per partition equalize).
        media = media.repartition(
            size_balance_partitions, F.xxhash64(F.col("doc_id"))
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "feature": pdf["media"].map(
                        lambda b: decoder(b) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def metadata_only_stats(media: DataFrame) -> DataFrame:
    """Metadata-path query: must not read blob bytes (column pruning --
    check ReadSchema in explain excludes `media`)."""
    return media.groupBy("meta.kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx int, byte_off bigint, frame_md5 string"


def sample_frames(
    media: DataFrame,
    frame_size: int = 32,
    stride: int = 64,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling plumbing: every ``stride`` bytes, slice a
    ``frame_size``-byte "frame" from the opaque media blob (up to
    ``max_frames`` per asset) and emit its digest. The SLICE is the
    deterministic stand-in for the codec's keyframe extraction -- a
    real deployment swaps the slice for pyav/ffmpeg frame decode
    without touching the dataflow, exactly like extract_features'
    decoder injection.

    The Spark-side machinery is the production shape: mapInPandas
    streams Arrow batches (one batch of blobs in memory per task,
    never the whole partition), the output is a narrow explode (rows
    multiply ~max_frames x but carry digests, not frames), and
    upstream metadata filters prune whole assets before any byte is
    touched. Certified byte-exact: the oracle recomputes the same
    slices from the source text the media table was staged from."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "byte_off": [],
                "frame_md5": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                if blob is None:
                    continue  # NULL media: no frames (same dataflow
                    # tolerance as extract_features' None guard)
                n = len(blob)
                for idx in range(max_frames):
                    off = idx * stride
                    if off + frame_size > n:
                        break
                    frame = bytes(blob[off : off + frame_size])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["byte_off"].append(off)
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.select("doc_id", "media").mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, orig_bytes bigint, resized_bytes bigint, "
    "resized_md5 string"
)


def resize_media(media: DataFrame, factor: int = 4) -> DataFrame:
    """Image-resize plumbing: downsample each blob by keeping every
    ``factor``-th byte -- the deterministic stand-in for a real
    Pillow/thumbnail resample (swap the slice for
    ``Image.open(...).resize(...)`` without touching the dataflow).
    Emits the resized payload's size and digest; the full resized
    blob would flow the same way as a binary column. Same mapInPandas
    Arrow-batch discipline as extract_features / sample_frames.

    NULL media emits the row with NULL size/digest -- the c62 oracle
    has no WHERE clause, so its length/md5 of a NULL text yield a
    NULL-valued row that this side must match (dropping the row was a
    latent row-count divergence; contrast sample_frames, whose oracle
    DOES filter and whose Spark side drops consistently)."""
    if not isinstance(factor, int) or factor < 1:
        # fail before any job runs: factor=0 would otherwise die deep
        # in an executor as a slice-step ValueError, and factor<0
        # would silently 'resize' to a reversed blob
        raise ValueError(f"factor must be a positive int, got {factor!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "doc_id": [],
                "orig_bytes": [],
                "resized_bytes": [],
                "resized_md5": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                out["doc_id"].append(doc_id)
                if blob is None:
                    out["orig_bytes"].append(None)
                    out["resized_bytes"].append(None)
                    out["resized_md5"].append(None)
                    continue
                b = bytes(blob)
                small = b[::factor]
                out["orig_bytes"].append(len(b))
                out["resized_bytes"].append(len(small))
                out["resized_md5"].append(hashlib.md5(small).hexdigest())
            yield pd.DataFrame(out)

    return media.select("doc_id", "media").mapInPandas(run, RESIZE_SCHEMA)
