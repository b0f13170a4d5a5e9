"""Librarian-compatible YAML config.

Mirrors the reference config surface (`/root/reference/internal/config/config.go:10-85`)
so that its shipped example configs (e.g. ``dev/examples/property-sales.snapshot.yml``)
parse unchanged:

    global.logger.level
    archiver.name
    archiver.source.{connection_string, schema, table, query}
    archiver.repository.{type, local.path, s3.{bucket,region,prefix,endpoint,force_path_style}}
    archiver.preserver.{type, batch_size_num_records, parquet.schema[]}

Each ``parquet.schema`` entry carries the reference's Parquet-type vocabulary
(`internal/config/config.go:47-55`): name/type/converted_type/repetition_type/
scale/precision/length — mapped to a Spark ``StructType`` by
:mod:`librarian_spark.schema`.

Extensions beyond the reference (clearly additive, defaulting off):
``source.format`` (parquet/csv/json/orc/jdbc — the reference is JDBC-only),
``source.path`` for file sources, and ``repository.partition_by``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

__all__ = [
    "FieldConfig",
    "SourceConfig",
    "RepositoryConfig",
    "PreserverConfig",
    "ArchiverConfig",
    "LibrarianConfig",
    "load_config",
    "load_config_str",
]


@dataclass
class FieldConfig:
    """One declared column (`internal/config/config.go:47-55`)."""

    name: str
    type: str
    converted_type: str | None = None
    repetition_type: str | None = None
    scale: int | None = None
    precision: int | None = None
    length: int | None = None


@dataclass
class SourceConfig:
    connection_string: str = ""
    schema: str = ""
    table: str = ""
    query: str = ""
    # extensions (not in the reference):
    format: str = "jdbc"
    path: str = ""
    # extra JDBC reader options (e.g. {"driver": "org.duckdb.DuckDBDriver"});
    # the reference bakes the driver into the Go binary (database/sql import),
    # Spark resolves it from the session classpath by name
    properties: dict = field(default_factory=dict)
    # incremental snapshots: pull only rows where this monotone column exceeds
    # the high watermark persisted by the previous run (the reference re-reads
    # the full query every snapshot — delta pulls are what make periodic
    # snapshots viable on a 100 TB source)
    incremental_column: str = ""

    def effective_query(self) -> str:
        """Default projection (`internal/sql/source.go:163-177`):
        ``SELECT * FROM schema.table`` when no query is configured."""
        if self.query.strip():
            return self.query
        if self.schema and self.table:
            return f"SELECT * FROM {self.schema}.{self.table}"
        if self.table:
            return f"SELECT * FROM {self.table}"
        raise ValueError("source requires either a query or schema+table")


@dataclass
class RepositoryConfig:
    type: str = "local"
    path: str = ""
    bucket: str = ""
    region: str = ""
    prefix: str = ""
    endpoint: str = ""
    force_path_style: bool = False
    partition_by: list[str] = field(default_factory=list)
    # s3 write path: "hadoop" = s3a:// via hadoop-aws jars (executors stream
    # directly — the big-snapshot path); "sdk" = local staging + boto3
    # object uploads, the reference's own S3 writer behavior
    # (`internal/s3/repository.go:60-115`) and the only path that works
    # without the hadoop-aws filesystem on the cluster
    upload: str = "hadoop"

    def spark_path(self) -> str:
        """Resolve to a Hadoop-FS URI: local dir or s3a://bucket/prefix.

        The reference implements local (`internal/integrations/local/repository.go`)
        and S3 (`internal/s3/repository.go`) blob writers by hand; Spark's writers
        take a path scheme instead.
        """
        if self.type == "local":
            if not self.path:
                raise ValueError("local repository requires a path")
            return self.path
        if self.type == "s3":
            if not self.bucket:
                raise ValueError("s3 repository requires a bucket")
            key = f"{self.bucket}/{self.prefix}" if self.prefix else self.bucket
            return f"s3a://{key}"
        raise ValueError(f"unknown repository type: {self.type!r}")

    def hadoop_conf(self) -> dict[str, str]:
        """S3A client settings matching the reference's localstack-friendly knobs
        (`internal/s3/repository.go:64-84`: endpoint + force-path-style)."""
        conf: dict[str, str] = {}
        if self.type == "s3":
            if self.endpoint:
                conf["fs.s3a.endpoint"] = self.endpoint
            if self.force_path_style:
                conf["fs.s3a.path.style.access"] = "true"
        return conf


@dataclass
class PreserverConfig:
    type: str = "parquet"
    batch_size_num_records: int = 0  # 0 = single file (`internal/config/config.go:60-62`)
    fields: list[FieldConfig] = field(default_factory=list)
    # parquet codec (snappy/zstd/gzip/none); "" = Spark session default.
    # The reference hardcodes parquet-go's default; at 100 TB the
    # scan-rate-vs-size tradeoff is a per-dataset decision, so it belongs in
    # the config.
    compression: str = ""


@dataclass
class ArchiverConfig:
    name: str = ""
    source: SourceConfig = field(default_factory=SourceConfig)
    preserver: PreserverConfig = field(default_factory=PreserverConfig)
    repository: RepositoryConfig = field(default_factory=RepositoryConfig)


@dataclass
class LibrarianConfig:
    log_level: str = "info"
    archiver: ArchiverConfig = field(default_factory=ArchiverConfig)


def _field_from_dict(d: dict) -> FieldConfig:
    return FieldConfig(
        name=d.get("name", ""),
        type=d.get("type", ""),
        converted_type=d.get("converted_type"),
        repetition_type=d.get("repetition_type"),
        scale=d.get("scale"),
        precision=d.get("precision"),
        length=d.get("length"),
    )


def _valid_upload(v: str) -> str:
    """An unknown upload mode must fail at config load (like spark_path()
    does for unknown repository types) — a typo would otherwise silently
    route to the s3a path the operator explicitly chose to avoid."""
    if v not in ("hadoop", "sdk"):
        raise ValueError(f"repository.upload must be 'hadoop' or 'sdk', got {v!r}")
    return v


def load_config_str(text: str) -> LibrarianConfig:
    raw = yaml.safe_load(text) or {}
    arch = raw.get("archiver", {}) or {}
    src = arch.get("source", {}) or {}
    repo = arch.get("repository", {}) or {}
    pres = arch.get("preserver", {}) or {}
    s3 = repo.get("s3", {}) or {}
    local = repo.get("local", {}) or {}
    parquet = pres.get("parquet", {}) or {}

    return LibrarianConfig(
        log_level=((raw.get("global", {}) or {}).get("logger", {}) or {}).get(
            "level", "info"
        ),
        archiver=ArchiverConfig(
            name=arch.get("name", ""),
            source=SourceConfig(
                connection_string=src.get("connection_string", ""),
                schema=src.get("schema", ""),
                table=src.get("table", ""),
                query=src.get("query", ""),
                format=src.get("format", "jdbc"),
                path=src.get("path", ""),
                incremental_column=src.get("incremental_column", ""),
                properties=dict(src.get("properties", {}) or {}),
            ),
            repository=RepositoryConfig(
                type=repo.get("type", "local"),
                path=local.get("path", ""),
                bucket=s3.get("bucket", ""),
                region=s3.get("region", ""),
                prefix=s3.get("prefix", ""),
                endpoint=s3.get("endpoint", ""),
                force_path_style=bool(s3.get("force_path_style", False)),
                upload=_valid_upload(
                    str(repo.get("upload") or s3.get("upload") or "hadoop")
                ),
                # accepted at the repository level or nested under the
                # concrete repo block — both read naturally in YAML
                partition_by=list(
                    repo.get("partition_by")
                    or local.get("partition_by")
                    or s3.get("partition_by")
                    or []
                ),
            ),
            preserver=PreserverConfig(
                type=pres.get("type", "parquet"),
                batch_size_num_records=int(pres.get("batch_size_num_records", 0) or 0),
                fields=[_field_from_dict(f) for f in (parquet.get("schema") or [])],
                compression=str(pres.get("compression", "") or ""),
            ),
        ),
    )


def load_config(path: str) -> LibrarianConfig:
    """YAML file → config (`internal/config/config.go:68-85`)."""
    with open(path, encoding="utf-8") as fh:
        return load_config_str(fh.read())
