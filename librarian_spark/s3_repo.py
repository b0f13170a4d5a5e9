"""SDK-upload S3 repository — the reference's S3 writer at the same boundary.

The reference does NOT write to S3 through a filesystem layer: its
repository streams each object through the AWS SDK uploader
(`/root/reference/internal/s3/repository.go:60-115` — region, optional
endpoint, force-path-style, key = prefix + name). This module mirrors that
exactly with boto3: Spark writes the snapshot to LOCAL staging (the
distributed heavy lifting), and the repository uploads the committed part
files + catalog sidecars object-by-object.

Two write paths therefore exist for ``repository.type: s3``:

* ``upload: hadoop`` (default) — ``s3a://`` URI + hadoop conf passthrough;
  Spark executors stream directly to S3. Needs the hadoop-aws jars on the
  cluster; the scalable path for big snapshots.
* ``upload: sdk`` — this module; reference-parity behavior, no Hadoop S3
  filesystem needed, right-sized for snapshot-grade object counts (the
  reference uploads a handful of batched parquet files per snapshot —
  `internal/parquet/preserver.go:79-83`). Incremental state (the high
  watermark) lives in the bucket next to the data.

Driven end-to-end against a local moto S3 server in tests — the in-process
equivalent of the reference's compose/localstack dev environment (`dev/`).
"""

from __future__ import annotations

import json
import os

__all__ = ["S3SdkRepository"]


class S3SdkRepository:
    """boto3-backed object writer with the reference's addressing options."""

    def __init__(
        self,
        bucket: str,
        prefix: str = "",
        region: str = "",
        endpoint: str = "",
        force_path_style: bool = False,
    ):
        try:
            import boto3
            from botocore.config import Config
        except ImportError as e:  # optional dependency, loud guard
            raise NotImplementedError(
                "repository.upload: sdk requires boto3 (pip install boto3); "
                "use upload: hadoop with the hadoop-aws jars instead"
            ) from e
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        cfg = Config(
            s3={"addressing_style": "path" if force_path_style else "auto"}
        )
        self.client = boto3.client(
            "s3",
            region_name=region or None,
            endpoint_url=endpoint or None,
            config=cfg,
        )

    def _key(self, key: str) -> str:
        key = key.lstrip("/")
        return f"{self.prefix}/{key}" if self.prefix else key

    # -- objects -----------------------------------------------------------
    def write_file(self, local_path: str, key: str) -> str:
        """Upload one local file; returns the object key (reference Write,
        `repository.go:86-115`)."""
        k = self._key(key)
        with open(local_path, "rb") as fh:
            self.client.upload_fileobj(fh, self.bucket, k)
        return k

    def write_bytes(self, data: bytes, key: str) -> str:
        k = self._key(key)
        self.client.put_object(Bucket=self.bucket, Key=k, Body=data)
        return k

    def read_bytes(self, key: str) -> bytes | None:
        try:
            r = self.client.get_object(Bucket=self.bucket, Key=self._key(key))
        except self.client.exceptions.NoSuchKey:
            return None
        except self.client.exceptions.ClientError:
            return None
        return r["Body"].read()

    def list_keys(self, key_prefix: str = "") -> list[str]:
        kp = self._key(key_prefix) if key_prefix else (self.prefix or "")
        out: list[str] = []
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": kp}
            if token:
                kw["ContinuationToken"] = token
            r = self.client.list_objects_v2(**kw)
            out += [o["Key"] for o in r.get("Contents", [])]
            if not r.get("IsTruncated"):
                return sorted(out)
            token = r.get("NextContinuationToken")

    # -- snapshot layout ---------------------------------------------------
    def upload_snapshot_dir(self, local_dir: str, dest: str = "") -> int:
        """Upload a committed local snapshot dir (part files + sidecars,
        skipping Spark's _SUCCESS/_committed markers) under ``dest``;
        returns the number of data objects uploaded."""
        n = 0
        for name in sorted(os.listdir(local_dir)):
            p = os.path.join(local_dir, name)
            if not os.path.isfile(p) or name.startswith(("_SUCCESS", ".")):
                continue
            self.write_file(p, f"{dest}/{name}" if dest else name)
            n += 1
        return n

    # -- incremental watermark state (parity with the local sidecar) ------
    def load_watermark(self, dest: str = "") -> dict | None:
        raw = self.read_bytes(f"{dest}/_watermark.json" if dest else "_watermark.json")
        return json.loads(raw) if raw else None

    def save_watermark(self, wm: dict, dest: str = "") -> None:
        self.write_bytes(
            json.dumps(wm).encode(),
            f"{dest}/_watermark.json" if dest else "_watermark.json",
        )
