"""Live S3 write path against a local moto server — the in-process
equivalent of the reference's compose/localstack dev environment (`dev/`):
the SDK-upload repository (`internal/s3/repository.go:60-115` parity)
driven end-to-end through the snapshot pipeline, with the uploaded objects
downloaded back and verified row-for-row.
"""

from __future__ import annotations

import io
import os

import pytest

try:
    import boto3  # noqa: F401
    from moto.server import ThreadedMotoServer
except ImportError:  # pragma: no cover - both ship in this container
    ThreadedMotoServer = None

pytestmark = pytest.mark.skipif(
    ThreadedMotoServer is None, reason="moto/boto3 not installed"
)

_BUCKET = "librarian-test"


@pytest.fixture(scope="module")
def s3_endpoint():
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    boto3.client(
        "s3", endpoint_url=endpoint, region_name="us-east-1"
    ).create_bucket(Bucket=_BUCKET)
    yield endpoint
    server.stop()


def test_sdk_repository_object_round_trip(s3_endpoint, tmp_path):
    from librarian_spark.s3_repo import S3SdkRepository

    repo = S3SdkRepository(
        bucket=_BUCKET,
        prefix="unit/rt",
        region="us-east-1",
        endpoint=s3_endpoint,
        force_path_style=True,
    )
    p = tmp_path / "obj.bin"
    p.write_bytes(b"payload-bytes")
    key = repo.write_file(str(p), "obj.bin")
    assert key == "unit/rt/obj.bin"
    assert repo.read_bytes("obj.bin") == b"payload-bytes"
    assert repo.read_bytes("missing.bin") is None

    # recursive snapshot upload preserves hive-partition subdirs (a flat
    # walk silently uploaded ZERO data objects for partitioned layouts)
    part = tmp_path / "snap" / "status=O"
    part.mkdir(parents=True)
    (part / "part-0.parquet").write_bytes(b"pq0")
    (tmp_path / "snap" / "_SUCCESS").write_bytes(b"")
    keys = repo.upload_snapshot_dir(str(tmp_path / "snap"), dest="v1")
    assert keys == ["unit/rt/v1/status=O/part-0.parquet"]
    assert repo.read_bytes("v1/status=O/part-0.parquet") == b"pq0"

    # delete_prefix gives the overwrite semantics of the other write paths
    deleted = repo.delete_prefix()
    assert deleted >= 2
    assert repo.list_keys() == []


def test_prefix_boundary_and_root_guard(s3_endpoint):
    """Prefix matching is '/'-bounded — deleting under 'unit/bnd' must not
    touch the sibling 'unit/bnd-v2' — and an empty effective prefix refuses
    to delete without the explicit bucket-root opt-in."""
    from librarian_spark.s3_repo import S3SdkRepository

    mk = lambda prefix: S3SdkRepository(
        bucket=_BUCKET,
        prefix=prefix,
        region="us-east-1",
        endpoint=s3_endpoint,
        force_path_style=True,
    )
    repo, sibling = mk("unit/bnd"), mk("unit/bnd-v2")
    repo.write_bytes(b"a", "part-1")
    sibling.write_bytes(b"b", "part-1")
    assert repo.list_keys() == ["unit/bnd/part-1"]  # no sibling bleed
    repo.delete_prefix()
    assert repo.list_keys() == []
    assert sibling.read_bytes("part-1") == b"b"  # sibling untouched
    with pytest.raises(ValueError, match="ENTIRE bucket"):
        mk("").delete_prefix()
    sibling.delete_prefix()


def test_sdk_upload_is_upload_then_delete(s3_endpoint, tmp_path):
    """Crash-safety ordering: new objects (catalog last) land before stale
    ones are removed, so a failed upload leaves the old snapshot intact."""
    from librarian_spark.s3_repo import S3SdkRepository

    repo = S3SdkRepository(
        bucket=_BUCKET,
        prefix="unit/ord",
        region="us-east-1",
        endpoint=s3_endpoint,
        force_path_style=True,
    )
    snap = tmp_path / "snap2"
    snap.mkdir()
    (snap / "part-b.parquet").write_bytes(b"pb")
    (snap / "part-a.parquet").write_bytes(b"pa")
    (snap / "x_catalog.json").write_bytes(b"{}")
    keys = repo.upload_snapshot_dir(str(snap))
    # catalog uploads last even though it sorts first lexicographically
    assert keys[-1] == "unit/ord/x_catalog.json"
    assert keys[:2] == ["unit/ord/part-a.parquet", "unit/ord/part-b.parquet"]
    repo.delete_prefix()


def test_snapshot_pipeline_to_live_s3(spark, s3_endpoint):
    """Full YAML snapshot with repository.type s3 + upload sdk: parquet
    batches and the catalog land as objects; downloading them back yields
    the exact source rows (the reference's snapshot_test shape, against a
    real-wire S3 API)."""
    import json

    import pyarrow.parquet as pq

    from librarian_spark.config import load_config_str
    from librarian_spark.snapshot import run_snapshot_config

    cfg = f"""
archiver:
  name: s3-snap
  source:
    format: parquet
    path: /root/testdata/sf0.001/orders.parquet
    query: "SELECT o_orderkey, o_custkey, o_totalprice FROM source"
  repository:
    type: s3
    upload: sdk
    s3:
      bucket: {_BUCKET}
      prefix: snaps/orders
      region: us-east-1
      endpoint: {s3_endpoint}
      force_path_style: true
  preserver:
    batch_size_num_records: 500
"""
    rec = run_snapshot_config(spark, load_config_str(cfg))
    assert rec.success and rec.num_source_records > 0

    client = boto3.client(
        "s3", endpoint_url=s3_endpoint, region_name="us-east-1"
    )
    keys = [
        o["Key"]
        for o in client.list_objects_v2(
            Bucket=_BUCKET, Prefix="snaps/orders/"
        )["Contents"]
    ]
    parts = [k for k in keys if k.endswith(".parquet")]
    cats = [k for k in keys if k.endswith("_catalog.json")]
    assert len(parts) >= 2, keys  # batch_size 500 over 1500 rows
    assert len(cats) == 1, keys

    # catalog parity: the uploaded record matches the returned one
    cat = json.loads(
        client.get_object(Bucket=_BUCKET, Key=cats[0])["Body"].read()
    )
    assert cat["num_source_records"] == rec.num_source_records
    assert cat["success"] is True

    # object-level round trip: downloaded parquet re-reads to the source
    n = 0
    for k in parts:
        body = client.get_object(Bucket=_BUCKET, Key=k)["Body"].read()
        t = pq.read_table(io.BytesIO(body))
        n += t.num_rows
        assert set(t.column_names) == {"o_orderkey", "o_custkey", "o_totalprice"}
    assert n == rec.num_source_records

    # RE-RUN the same config: overwrite semantics — the prefix must hold
    # exactly one snapshot's rows, not accumulate the previous run's
    # uuid-named part files (the confirmed duplication bug)
    rec2 = run_snapshot_config(spark, load_config_str(cfg))
    assert rec2.success
    keys2 = [
        o["Key"]
        for o in client.list_objects_v2(
            Bucket=_BUCKET, Prefix="snaps/orders/"
        )["Contents"]
    ]
    n2 = sum(
        pq.read_table(
            io.BytesIO(client.get_object(Bucket=_BUCKET, Key=k)["Body"].read())
        ).num_rows
        for k in keys2
        if k.endswith(".parquet")
    )
    assert n2 == rec2.num_source_records


def test_snapshot_pipeline_partitioned_to_live_s3(spark, s3_endpoint):
    """Partitioned snapshot + SDK upload: the hive subdirectories must land
    as objects (the confirmed silent-zero-objects bug class)."""
    import io as _io

    import pyarrow.parquet as _pq

    from librarian_spark.config import load_config_str
    from librarian_spark.snapshot import run_snapshot_config

    cfg = f"""
archiver:
  name: s3-snap-part
  source:
    format: parquet
    path: /root/testdata/sf0.001/orders.parquet
    query: "SELECT o_orderkey, o_orderstatus FROM source"
  repository:
    type: s3
    upload: sdk
    partition_by: [o_orderstatus]
    s3:
      bucket: {_BUCKET}
      prefix: snaps/part
      region: us-east-1
      endpoint: {s3_endpoint}
      force_path_style: true
"""
    rec = run_snapshot_config(spark, load_config_str(cfg))
    assert rec.success and rec.num_source_records > 0
    client = boto3.client(
        "s3", endpoint_url=s3_endpoint, region_name="us-east-1"
    )
    keys = [
        o["Key"]
        for o in client.list_objects_v2(Bucket=_BUCKET, Prefix="snaps/part/")[
            "Contents"
        ]
    ]
    parts = [k for k in keys if k.endswith(".parquet")]
    assert any("o_orderstatus=" in k for k in parts), keys
    n = sum(
        _pq.read_table(
            _io.BytesIO(client.get_object(Bucket=_BUCKET, Key=k)["Body"].read())
        ).num_rows
        for k in parts
    )
    assert n == rec.num_source_records


def test_snapshot_sdk_rejects_incremental(spark, s3_endpoint):
    """The SDK path re-stages locally per run, so incremental snapshots must
    refuse loudly instead of silently losing append state."""
    from librarian_spark.config import load_config_str
    from librarian_spark.snapshot import run_snapshot_config

    cfg = f"""
archiver:
  name: s3-snap-incr
  source:
    format: parquet
    path: /root/testdata/sf0.001/orders.parquet
    query: "SELECT o_orderkey FROM source"
    incremental_column: o_orderkey
  repository:
    type: s3
    upload: sdk
    s3:
      bucket: {_BUCKET}
      prefix: snaps/incr
      region: us-east-1
      endpoint: {s3_endpoint}
      force_path_style: true
"""
    with pytest.raises(ValueError, match="upload: hadoop"):
        run_snapshot_config(spark, load_config_str(cfg))
