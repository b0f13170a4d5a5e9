"""Catalog audit records.

Reference contract (`/root/reference/internal/catalog/catalog.go:15-23`,
`internal/archiver/archiver.go:114-129`): after every snapshot, a ``catalog.json``
is written next to the data with::

    {"id", "start_time", "end_time", "source": {"schema","table","query"},
     "num_source_records", "num_records_processed", "success"}

Success requires ``num_source_records == num_records_processed`` — the count
pre-scan (`internal/sql/source.go:43-49`) vs rows actually preserved.

Spark mapping: the pre-scan count is ``df.count()`` on the source plan; the
processed count comes from the written files (read back cheaply from parquet
footers), so the parity check is real, not assumed.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import uuid
from dataclasses import asdict, dataclass, field

__all__ = ["CatalogRecord", "write_catalog"]


def _utcnow_iso() -> str:
    return _dt.datetime.now(_dt.timezone.utc).isoformat()


@dataclass
class CatalogRecord:
    id: str = field(default_factory=lambda: str(uuid.uuid4()))
    start_time: str = field(default_factory=_utcnow_iso)
    end_time: str = ""
    source: dict = field(default_factory=dict)
    num_source_records: int = 0
    num_records_processed: int = 0
    success: bool = False

    def finish(self, processed: int) -> "CatalogRecord":
        self.end_time = _utcnow_iso()
        self.num_records_processed = processed
        # parity check mirrors `internal/archiver/archiver.go:114-122`
        self.success = self.num_source_records == processed
        return self

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)


def write_catalog(record: CatalogRecord, out_dir: str, name: str = "_catalog.json") -> str:
    """Write the catalog record next to the data (local FS; for object stores the
    caller writes via the Hadoop FS API or driver-side boto — kept simple here).

    The reference names it ``catalog.json`` (`internal/archiver/archiver.go:126`);
    we default to ``_catalog.json`` because Hadoop/Spark directory readers skip
    ``_``-prefixed sidecars (like ``_SUCCESS``) — a bare catalog.json inside the
    output directory breaks every subsequent ``spark.read.parquet(dir)``. Pass
    ``name="catalog.json"`` for byte-level reference parity when the output is not
    consumed by Spark."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(record.to_json())
    return path
