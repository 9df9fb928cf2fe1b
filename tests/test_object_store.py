"""Object-store round-trip for the medallion layer (VERDICT r9 item 8).

The reference runs its lake against MinIO/S3 (reference
tasks/bronze.py:15-20: an S3 client + bucket layout; silver/gold read
and write whole-table objects under the ``brz_/slv_/gld_`` key
convention). The rebuild documents ``s3a://`` URIs as the cluster
drop-in (`sources/parquet_io.py` module docstring) — but this sandbox
ships no hadoop-aws jar, so Spark's own s3a FileSystem genuinely
cannot run here. What CAN be exercised, and is, against a real S3 API
(moto server):

- the reference's object-key convention (`layer_key`) addressing a
  Spark-WRITTEN multi-file parquet table in a bucket,
- byte-lossless round-trip: upload the written layer, download into a
  fresh prefix, read back through Spark with identical rows,
- the list-bucket existence check shape (reference
  tasks/silver.py:25-30) expressed over the S3 API, matching
  `parquet_exists`' local answer.

When a cluster provides hadoop-aws, `write_parquet_layer` /
`read_parquet` take the `s3a://bucket/...` path directly and none of
this plumbing changes — that final hop is the documented deployment
axis this sandbox cannot cover.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

boto3 = pytest.importorskip("boto3")
moto_server = pytest.importorskip("moto.server")

from etl_acordos_spark.sources.parquet_io import (  # noqa: E402
    layer_key,
    parquet_exists,
    read_parquet,
    write_parquet_layer,
)


@pytest.fixture(scope="module")
def s3():
    server = moto_server.ThreadedMotoServer(port=0, verbose=False)
    server.start()
    port = server._server.socket.getsockname()[1]
    client = boto3.client(
        "s3",
        endpoint_url=f"http://127.0.0.1:{port}",
        aws_access_key_id="test",
        aws_secret_access_key="test",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket="lake")
    yield client
    server.stop()


def _upload_dir(s3, local: str, bucket: str, prefix: str) -> list[str]:
    keys = []
    for p in sorted(Path(local).rglob("*")):
        if p.is_file():
            key = f"{prefix}/{p.relative_to(local)}"
            s3.upload_file(str(p), bucket, key)
            keys.append(key)
    return keys


def _download_prefix(s3, bucket: str, prefix: str, local: str) -> None:
    for obj in s3.list_objects_v2(Bucket=bucket, Prefix=prefix)["Contents"]:
        rel = obj["Key"][len(prefix) + 1 :]
        tgt = Path(local) / rel
        tgt.parent.mkdir(parents=True, exist_ok=True)
        s3.download_file(bucket, obj["Key"], str(tgt))


def test_layer_roundtrips_through_s3_api(spark, sf_oracle, s3, tmp_path):
    """Write the gold layer with the production writer, push it under
    the reference's object-key convention, pull it into a fresh
    prefix, and read it back through Spark — rows must be identical
    (multi-file layout and _SUCCESS markers included)."""
    orders = read_parquet(
        spark, os.path.join(sf_oracle, "orders.parquet")
    ).select("o_orderkey", "o_custkey", "o_orderpriority")
    local = write_parquet_layer(
        orders, str(tmp_path / "lake"), "gold", "orders_slim"
    )
    key_prefix = layer_key("gold", "orders_slim")
    assert key_prefix == "gold/gld_orders_slim"

    uploaded = _upload_dir(s3, local, "lake", key_prefix)
    assert any(k.endswith(".parquet") for k in uploaded)

    back = tmp_path / "restored"
    _download_prefix(s3, "lake", key_prefix, str(back))
    got = read_parquet(spark, str(back))
    assert got.count() == orders.count()
    assert sorted(got.columns) == sorted(orders.columns)
    assert got.exceptAll(orders).count() == 0
    assert orders.exceptAll(got).count() == 0


def test_existence_check_matches_reference_list_bucket_shape(
    spark, s3, tmp_path
):
    """The reference checks list-bucket-with-prefix before each read
    (tasks/silver.py:25-30); `parquet_exists` answers the same
    question over the Hadoop FS API for whatever scheme the session's
    FileSystem supports. Both must agree on present/absent."""
    df = spark.range(3).withColumnRenamed("id", "k")
    local = write_parquet_layer(df, str(tmp_path / "lake"), "silver", "tiny")
    _upload_dir(s3, local, "lake", layer_key("silver", "tiny"))

    def s3_exists(prefix: str) -> bool:
        resp = s3.list_objects_v2(Bucket="lake", Prefix=prefix, MaxKeys=1)
        return resp["KeyCount"] > 0

    assert s3_exists(layer_key("silver", "tiny"))
    assert not s3_exists(layer_key("silver", "missing"))
    assert parquet_exists(spark, local)
    assert not parquet_exists(spark, str(tmp_path / "lake/silver/slv_missing"))
