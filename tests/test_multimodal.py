"""Multimodal plumbing: schema, batch shape, error isolation, and the
size-adaptive codec / resize / frame-sample column logic."""

import pytest
from pyspark.sql import functions as F

from xs_vlm_ocr_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    choose_codec,
    decode_image,
    decode_media_batch,
    frame_sample_plan,
    plan_resize,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (f"img://m/{i}", "image", bytes([i % 251]) * (10 + i), (100, 100, "png"))
        for i in range(20)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")


def test_decode_batch_deterministic(spark, media_df):
    a = sorted(map(tuple, decode_media_batch(media_df).collect()))
    b = sorted(map(tuple, decode_media_batch(media_df.repartition(5)).collect()))
    assert a == b
    assert len(a) == 20
    assert all(r[2] for r in a)  # ok=True
    # features have the declared dim and stable values per payload
    row = next(r for r in a if r[0] == "img://m/0")
    assert len(row[8]) == 8


def test_decode_matches_local_oracle(spark, media_df):
    rows = {r["media_ref"]: r for r in decode_media_batch(media_df).collect()}
    payload = bytes([3]) * 13
    exp = decode_image(payload, fake=True)
    got = rows["img://m/3"]
    assert (got["width"], got["height"], got["mode"]) == (
        exp["width"], exp["height"], exp["mode"]
    )


def test_codec_resize_frame_columns(spark):
    df = spark.createDataFrame(
        [(1, 4000, 2000, 100), (2, 640, 480, 5), (3, 1920, 1080, 0)],
        "id int, w int, h int, frames int",
    )
    out = df.select(
        "id",
        choose_codec(F.col("w"), F.col("h")).alias("codec"),
        plan_resize(F.col("w")).alias("scale"),
        frame_sample_plan(F.col("frames")).alias("picks"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["codec"] == "jpeg85" and by_id[2]["codec"] == "png"
    assert by_id[3]["codec"] == "png"  # boundary: exactly 1920x1080 stays png
    assert by_id[1]["scale"] == 1 and by_id[2]["scale"] == 2
    assert by_id[1]["picks"] == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]
    assert by_id[3]["picks"] == []
