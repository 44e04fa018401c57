"""S3-native ingestion (S1/S2: the reference lists and downloads from S3,
app/s3_manager.py:160-251). The rebuild reads the same data through
``ray.data.read_parquet("s3://…")`` with a pyarrow S3FileSystem — exercised
here against a local moto S3 server (no network): same URI plumbing,
column pruning and filtering as the local-path tests.

Write-side note: arrow's S3 writer uses multipart uploads, whose moto
response triggers an arrow-side retry loop — so the write path is not
testable against moto; ``Dataset.write_parquet("s3://…", filesystem=fs)``
is the identical pass-through plumbing and needs a real S3 endpoint.
"""

import io

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.fs as pafs
import pyarrow.parquet as pq
import pytest
import ray.data as rd

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")


@pytest.fixture(scope="module")
def s3_env():
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    ep = f"http://127.0.0.1:{port}"
    client = boto3.client(
        "s3", endpoint_url=ep, region_name="us-east-1",
        aws_access_key_id="test", aws_secret_access_key="test")
    client.create_bucket(Bucket="pages-bucket")
    fs = pafs.S3FileSystem(endpoint_override=ep, access_key="test",
                           secret_key="test", region="us-east-1")
    yield client, fs
    srv.stop()


def _upload_parquet(client, key: str, tbl: pa.Table) -> None:
    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    client.put_object(Bucket="pages-bucket", Key=key, Body=buf.getvalue())


def test_ray_reads_partitioned_s3_prefix(s3_env):
    client, fs = s3_env
    for shard in range(3):
        _upload_parquet(client, f"pages/part-{shard:05d}.parquet", pa.table({
            "url": [f"https://h{shard}.example.com/p/{i}" for i in range(10)],
            "n_tokens": pa.array([shard * 10 + i for i in range(10)], pa.int64()),
        }))
    ds = rd.read_parquet("s3://pages-bucket/pages/", filesystem=fs,
                         columns=["url", "n_tokens"])
    assert ds.count() == 30
    assert sorted(ds.schema().names) == ["n_tokens", "url"]
    # a pruned+filtered pipeline over the S3 source behaves like local
    big = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tokens"], 20)),
        batch_format="pyarrow", zero_copy_batch=True)
    assert big.count() == 10


def test_s3_hive_partitioned_read_prunes_by_key(s3_env):
    """Hive-layout S3 prefix (the routed sink's event_class=… layout):
    ray.data reads the partition column back and a partition filter only
    touches the matching prefix."""
    client, fs = s3_env
    for cls in ["summaries", "auditable_events"]:
        _upload_parquet(client, f"routed/event_class={cls}/p0.parquet",
                        pa.table({"url": [f"u-{cls}-{i}" for i in range(5)]}))
    ds = rd.read_parquet("s3://pages-bucket/routed/", filesystem=fs)
    assert ds.count() == 10
    assert "event_class" in ds.schema().names
    one = rd.read_parquet("s3://pages-bucket/routed/event_class=summaries/",
                          filesystem=fs)
    assert one.count() == 5
