"""Multimodal plumbing tests (SURVEY.md C9): Arrow batch iteration,
decoder injection, and the blob-free metadata path."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dgraph_etl_spark.catalog import register_views
from tests.oracle_utils import formatted_plan
from dgraph_etl_spark.functions.multimodal import (
    extract_features,
    metadata_only_stats,
    stub_decoder,
    to_media_table,
    unavailable_decoder,
)


def _media(spark, sf_small):
    register_views(spark, sf_small)
    return to_media_table(spark.table("documents"))


def test_feature_extraction_schema_and_values(spark, sf_small):
    media = _media(spark, sf_small)
    feats = extract_features(media)
    assert [f.simpleString() for f in feats.schema.fields] == [
        "doc_id:bigint",
        "n_bytes:bigint",
        "feature:array<double>",
    ]
    row = feats.filter(F.col("doc_id") == 0).collect()[0]
    doc = spark.table("documents").filter("doc_id = 0").collect()[0]
    blob = doc.text.encode("utf-8")
    assert row.n_bytes == len(blob)
    assert row.feature == stub_decoder(blob)


def test_decoder_injection_surfaces_errors(spark, sf_small):
    """The honest production stub must fail loudly through the Arrow
    batch path, not silently produce rows."""
    media = _media(spark, sf_small)
    feats = extract_features(media, decoder=unavailable_decoder)
    with pytest.raises(Exception, match="codec library"):
        feats.collect()


def test_size_balanced_repartition_path(spark, sf_small):
    media = _media(spark, sf_small)
    feats = extract_features(media, size_balance_partitions=4)
    assert feats.count() == media.count()


def test_metadata_query_never_reads_blob_column(spark, sf_small, tmp_path):
    """Persist the media table (binary column on disk, as in a real
    deployment), then run the metadata-only query: ReadSchema must
    exclude the blob column entirely — metadata queries over a 100 TB
    media corpus must do zero blob IO."""
    media = _media(spark, sf_small)
    path = str(tmp_path / "media")
    media.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    stats = metadata_only_stats(back)
    plan = formatted_plan(stats)
    read_schema = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert read_schema and all("media" not in ln for ln in read_schema), plan
    assert stats.collect()[0].n_items == media.count()


def test_frame_sampling_offsets_and_caps(spark, sf_small):
    """Frames start at exact stride multiples, never overrun the blob,
    and cap at max_frames; a blob shorter than one frame yields no
    rows (not a short frame)."""
    from dgraph_etl_spark.functions.multimodal import sample_frames

    media = _media(spark, sf_small)
    frames = sample_frames(media, frame_size=32, stride=64, max_frames=4)
    rows = frames.collect()
    assert rows
    sizes = {
        r["doc_id"]: r["meta"]["n_bytes"] for r in media.collect()
    }
    per_doc: dict[int, list] = {}
    for r in rows:
        assert r.byte_off % 64 == 0
        assert r.byte_off + 32 <= sizes[r.doc_id]
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc, idxs in per_doc.items():
        assert sorted(idxs) == list(range(len(idxs)))  # dense from 0
        assert len(idxs) <= 4
    for doc, n in sizes.items():
        # n is None for a NULL blob (octet_length(NULL)): the library
        # contract is "NULL media -> no rows", same as too-short blobs
        if n is None or n < 32:
            assert doc not in per_doc


def test_resize_preserves_every_kth_byte(spark, sf_small):
    """The resized digest equals md5 of blob[::4] computed locally --
    the plumbing moves exactly the bytes the stand-in defines."""
    import hashlib

    from dgraph_etl_spark.functions.multimodal import resize_media

    media = _media(spark, sf_small)
    out = {r.doc_id: r for r in resize_media(media, factor=4).collect()}
    for r in media.limit(20).collect():
        if r["media"] is None:
            # NULL blobs are SKIPPED by resize_media (no output row),
            # not resized to an empty digest
            assert r["doc_id"] not in out
            continue
        b = bytes(r["media"])
        got = out[r["doc_id"]]
        assert got.orig_bytes == len(b)
        assert got.resized_bytes == len(b[::4])
        assert got.resized_md5 == hashlib.md5(b[::4]).hexdigest()


import importlib.util

_HAS_PIL = importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(_HAS_PIL, reason="PIL present: the real lane runs instead")
def test_pillow_decoder_gates_loudly_without_pil():
    """Without Pillow the real image lane must fail LOUDLY at first use
    (NotImplementedError naming the dependency), never degrade to fake
    features -- the same honest-gating contract as unavailable_decoder."""
    from dgraph_etl_spark.functions.multimodal import pillow_decoder

    with pytest.raises(NotImplementedError, match="Pillow"):
        pillow_decoder(b"\x89PNG")


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not in this container")
def test_pillow_decoder_real_lane(spark):
    """With Pillow installed, the real lane self-certifies: a generated
    PNG flows through extract_features(decoder=pillow_decoder) and the
    64-dim 8x8-grayscale feature matches a driver-side PIL reference.
    This test starts running the moment the dependency lands in the
    image (round-5 verdict ask #8) -- no code change needed."""
    import io

    from PIL import Image

    from dgraph_etl_spark.functions.multimodal import (
        extract_features,
        pillow_decoder,
    )

    buf = io.BytesIO()
    Image.new("RGB", (31, 17), (200, 10, 60)).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, png, ("image/png", len(png), "image"))],
        "doc_id bigint, media binary, "
        "meta struct<mime: string, n_bytes: bigint, kind: string>",
    )
    out = extract_features(media, decoder=pillow_decoder).collect()
    assert len(out) == 1 and len(out[0].feature) == 64
    ref = Image.open(io.BytesIO(png)).convert("L").resize((8, 8))
    assert out[0].feature == [float(p) for p in ref.getdata()]


def test_size_balance_spreads_uniform_size_corpus(spark, sf_small):
    """The size-balance key must spread a SAME-SIZE corpus across
    tasks: keying on blob size co-located every fixed-resolution blob
    on one straggler partition."""
    from pyspark.sql import functions as F

    media = _media(spark, sf_small).withColumn(
        "meta", F.named_struct(
            F.lit("kind"), F.col("meta.kind"),
            F.lit("n_bytes"), F.lit(4096).cast("long"),
        )
    )
    parts = (
        extract_features(media, size_balance_partitions=4)
        .withColumn("p", F.spark_partition_id())
        .select("p").distinct().count()
    )
    assert parts > 1, "uniform-size corpus collapsed to one partition"


def test_null_media_yields_null_not_fabricated_zeros(spark):
    """Family-wide NULL-singleton contract: a NULL blob must surface
    as NULL n_bytes/feature (extract_features) and a NULL-valued row
    (resize_media) -- matching the c09/c62 oracles, whose
    octet_length/md5 of NULL return NULL. Fabricated 0s / dropped
    rows were latent certification divergences."""
    from dgraph_etl_spark.functions.multimodal import resize_media

    media = spark.createDataFrame(
        [(1, bytearray(b"abcd")), (2, None)], "doc_id bigint, media binary"
    )
    feats = {r.doc_id: r for r in extract_features(media).collect()}
    assert feats[1].n_bytes == 4 and feats[1].feature is not None
    assert feats[2].n_bytes is None and feats[2].feature is None

    rs = {r.doc_id: r for r in resize_media(media, factor=2).collect()}
    assert set(rs) == {1, 2}, "NULL media row must be emitted, not dropped"
    assert rs[2].orig_bytes is None and rs[2].resized_md5 is None
    assert rs[1].resized_bytes == 2


def test_resize_media_validates_factor_preflight(spark):
    """factor=0 must raise the loud ValueError before any job runs,
    not a slice-step error deep in an executor; factor=-1 must not
    silently 'resize' to a reversed blob."""
    from dgraph_etl_spark.functions.multimodal import resize_media

    media = spark.createDataFrame(
        [(1, bytearray(b"abcd"))], "doc_id bigint, media binary"
    )
    for bad in (0, -1, 2.5):
        with pytest.raises(ValueError, match="factor"):
            resize_media(media, factor=bad)
