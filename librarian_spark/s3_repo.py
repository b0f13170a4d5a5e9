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
  `internal/parquet/preserver.go:79-83`). Full snapshots only: the
  pipeline rejects incremental configs on this path (it re-stages
  locally per run; append state needs the s3a path).

Driven end-to-end against a local moto S3 server in tests — the in-process
equivalent of the reference's compose/localstack dev environment (`dev/`).
"""

from __future__ import annotations

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
        """Object bytes, or None ONLY for genuine not-found — access errors,
        throttling, and wrong-region responses propagate (mapping them to
        None would make 'state missing' indistinguishable from 'state
        unreadable' and silently restart stateful callers from scratch)."""
        from botocore.exceptions import ClientError

        try:
            r = self.client.get_object(Bucket=self.bucket, Key=self._key(key))
        except ClientError as e:
            code = e.response.get("Error", {}).get("Code", "")
            if code in ("NoSuchKey", "404"):
                return None
            raise
        return r["Body"].read()

    def _boundary(self, key_prefix: str = "") -> str:
        """Directory-style listing prefix: '/'-terminated when non-empty, so
        prefix ``snaps/orders`` can never match a sibling key like
        ``snaps/orders-v2/...`` (raw string-prefix listing would — and
        delete_prefix() would then delete the sibling's objects)."""
        kp = self._key(key_prefix) if key_prefix else (self.prefix or "")
        if kp and not kp.endswith("/"):
            kp += "/"
        return kp

    def list_keys(self, key_prefix: str = "") -> list[str]:
        kp = self._boundary(key_prefix)
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

    def delete_keys(self, keys: list[str]) -> int:
        """Delete the given absolute keys in DeleteObjects batches."""
        for i in range(0, len(keys), 1000):  # DeleteObjects batch limit
            self.client.delete_objects(
                Bucket=self.bucket,
                Delete={"Objects": [{"Key": k} for k in keys[i : i + 1000]]},
            )
        return len(keys)

    def delete_prefix(
        self, key_prefix: str = "", allow_bucket_root: bool = False
    ) -> int:
        """Delete every object under the '/'-bounded prefix (the overwrite
        semantics of the local/hadoop paths' mode('overwrite')); returns
        objects deleted. An empty EFFECTIVE prefix means "every object in
        the bucket" — that requires the explicit ``allow_bucket_root`` opt-in
        so a blank config prefix can't silently wipe a shared bucket."""
        if not self._boundary(key_prefix) and not allow_bucket_root:
            raise ValueError(
                "delete_prefix with an empty effective prefix would delete "
                "the ENTIRE bucket; pass allow_bucket_root=True if that is "
                "really intended"
            )
        return self.delete_keys(self.list_keys(key_prefix))

    # -- snapshot layout ---------------------------------------------------
    def upload_snapshot_dir(self, local_dir: str, dest: str = "") -> list[str]:
        """Upload a committed local snapshot dir RECURSIVELY (part files,
        sidecars, and hive-partitioned subdirectories, skipping Spark's
        _SUCCESS/_committed markers), preserving relative paths under
        ``dest``; returns the absolute object keys uploaded. Catalog
        sidecars upload LAST so a reader that sees the new catalog can rely
        on the data objects it describes already being present."""
        uploads: list[tuple[str, str]] = []
        for root, _dirs, files in os.walk(local_dir):
            rel_root = os.path.relpath(root, local_dir)
            for name in sorted(files):
                if name.startswith(("_SUCCESS", ".")):
                    continue
                rel = name if rel_root == "." else f"{rel_root}/{name}"
                uploads.append((os.path.join(root, name), rel))
        uploads.sort(key=lambda lr: (lr[1].endswith("_catalog.json"), lr[1]))
        keys = []
        for local, rel in uploads:
            keys.append(self.write_file(local, f"{dest}/{rel}" if dest else rel))
        return keys
