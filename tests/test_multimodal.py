"""Blob column-group + multimodal operator tests."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_df(spark):
    from lance_spark.operators.multimodal import pack_fake_image

    rows = [
        (i, f"doc {i}", pack_fake_image(64 + i, 48 + i, 3, seed=i)) for i in range(50)
    ]
    return spark.createDataFrame(rows, "id long, title string, img binary")


def test_blob_column_group_roundtrip(spark, media_df, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "media")
    write_dataset(media_df.repartition(2), uri, mode="create", blob_columns=["img"])
    ds = dataset(uri)
    # blob file is a separate column group
    assert any(len(f.files) == 2 for f in ds.manifest.fragments)
    assert ds.manifest.blob_columns == ["img"]

    # full scan reconstitutes all columns
    full = ds.to_df(spark)
    assert full.count() == 50 and set(full.columns) == {"id", "title", "img"}
    row = full.filter("id = 7").first()
    from lance_spark.operators.multimodal import pack_fake_image

    assert bytes(row["img"]) == pack_fake_image(71, 55, 3, seed=7)

    # narrow scan must not touch the blob file
    plan = ds.scanner(spark, columns=["id", "title"])._jdf.queryExecution().executedPlan().toString()
    assert "-blob-" not in plan

    # descriptors read sizes without bytes; take_blobs fetches bytes
    desc = ds.blob_descriptors(spark, "img")
    assert desc.count() == 50 and desc.first()["size"] > 16
    rid = ds.to_df(spark, with_row_id=True).filter("id = 3").first()["_rowid"]
    got = ds.take_blobs(spark, [rid], "img").collect()
    assert len(got) == 1 and bytes(got[0]["img"]) == pack_fake_image(67, 51, 3, seed=3)


def test_decode_image_meta(spark, media_df):
    from lance_spark.operators.multimodal import decode_image_meta

    out = decode_image_meta(media_df, "img").select("id", "meta.*")
    r = out.filter("id = 10").first()
    assert (r["width"], r["height"], r["channels"], r["format"]) == (74, 58, 3, "fake")
    with pytest.raises(NotImplementedError):
        decode_image_meta(media_df, "img", codec="pil")


def test_image_features_deterministic(spark, media_df):
    from lance_spark.operators.multimodal import image_features

    f1 = image_features(media_df, "img", "id").orderBy("id").collect()
    f2 = image_features(media_df.repartition(8), "img", "id").orderBy("id").collect()
    assert [r["feature"] for r in f1] == [r["feature"] for r in f2]  # partition-invariant
    assert all(len(r["feature"]) == 8 for r in f1)


def test_resize_and_frames(spark, media_df):
    from lance_spark.operators.multimodal import decode_image_meta, resize_images, sample_frames

    resized = resize_images(media_df, "img", 32, 32)
    meta = decode_image_meta(resized, "img").select("meta.width", "meta.height").distinct().collect()
    assert [(r["width"], r["height"]) for r in meta] == [(32, 32)]

    frames = sample_frames(media_df, "img", "id", every_n=2, frame_size=64)
    counts = frames.groupBy("id").count().collect()
    assert all(r["count"] >= 1 for r in counts)
    assert frames.filter("frame_idx % 2 != 0").count() == 0
