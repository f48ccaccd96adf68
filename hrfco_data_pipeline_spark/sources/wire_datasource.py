"""Spark 4 Python DataSource for the HRFCO wire format (S2/S4).

The reference's ingestion edge is NiFi InvokeHTTP + Kafka
(`nifi/HRFCO_Data_Pipeline.json`; `HRFCOStreamsApp.java:85-89`): JSON
records of stringly-typed observations. This connector re-expresses
that edge as a first-class Spark source via the Python DataSource API
(pyspark >= 4.0): ``spark.read.format("hrfco_wire").load(dir)`` for
batch and ``spark.readStream.format("hrfco_wire")`` for streams —
executor-side, partition-per-file parallel reads (unlike the
driver-side `sources/http.py` loader, which models the API *fetch*
fan-in).

Scale/behavior notes:

- Batch: one ``InputPartition`` per file — a 100 TB landing dir scales
  to as many tasks as files; the per-file JSON parse runs on
  executors, never the driver.
- Equality/not-null filters on ``wlobscd`` are pushed into the reader
  (``pushFilters``) — rows for other stations are dropped before they
  reach Spark.
- Streaming: ``SimpleDataSourceStreamReader`` with the offset =
  count of files consumed from the sorted listing (append-only landing
  dir contract, the NiFi/Kafka cadence twin). Replays are exact:
  ``readBetweenOffsets`` re-reads the same file slice.
- Malformed JSON lines surface as all-null rows with the raw line in
  ``value`` — same PERMISSIVE + corrupt-record contract as
  `plans/wire.parsed_wire`, so `wire_dlq` routing works unchanged.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

WIRE_SCHEMA = "wlobscd string, ymdhm string, wl string, fw string, value string"

_FIELDS = ("wlobscd", "ymdhm", "wl", "fw")


def _list_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(path, f))
    )


def _parse_line(line: str):
    line = line.rstrip("\n")
    if not line.strip():
        return None
    try:
        d = json.loads(line)
        if not isinstance(d, dict):
            raise ValueError("not an object")
    except ValueError:
        # corrupt-record contract: nulls + raw line
        return (None, None, None, None, line)
    vals = tuple(
        v if isinstance(v, str) or v is None else str(v)
        for v in (d.get(k) for k in _FIELDS)
    )
    return vals + (line,)


def _read_file(fp: str, station_eq: str | None, station_notnull: bool):
    with open(fp, encoding="utf-8") as fh:
        for line in fh:
            row = _parse_line(line)
            if row is None:
                continue
            if station_notnull and row[0] is None:
                continue
            if station_eq is not None and row[0] != station_eq:
                continue
            yield row


class _WireBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hrfco_wire requires a path: .load(dir)")
        self.station_eq: str | None = None
        self.station_notnull = False

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("wlobscd",):
                self.station_eq = f.value
            elif isinstance(f, IsNotNull) and f.attribute == ("wlobscd",):
                self.station_notnull = True
            else:
                yield f

    def partitions(self):
        return [InputPartition(fp) for fp in _list_files(self.path)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from _read_file(partition.value, self.station_eq, self.station_notnull)


class _WireStreamReader(SimpleDataSourceStreamReader):
    """Offset = lexicographic high-water mark of consumed file names.

    Contract: the landing directory is append-only with monotonically
    increasing file names (timestamp-prefixed, the standard landing
    convention). A mark never double-reads a file under ANY naming —
    a late file sorting below the mark is skipped, not duplicated (a
    positional offset into a re-sorted listing would replay old files
    instead). For arbitrary naming use Spark's native file source,
    which keeps a full seen-files log, or the batch reader under
    foreachBatch.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hrfco_wire requires a path option")

    def initialOffset(self) -> dict:
        return {"mark": ""}

    def read(self, start: dict):
        new = [
            fp
            for fp in _list_files(self.path)
            if os.path.basename(fp) > start["mark"]
        ]
        end = {"mark": os.path.basename(new[-1])} if new else start
        return self._read_all(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        sel = [
            fp
            for fp in _list_files(self.path)
            if start["mark"] < os.path.basename(fp) <= end["mark"]
        ]
        return self._read_all(sel)

    @staticmethod
    def _read_all(files: list[str]):
        # a materialized list ITERATOR, not a generator: Spark's
        # prefetch cache copy.copy()s it (generators aren't copyable)
        # and next()s it to validate the no-new-data case (a bare list
        # isn't an iterator). SimpleDataSourceStreamReader buffers
        # batches driver-side by design — for executor-parallel
        # streaming reads use the Kafka binding (docs/KAFKA.md) or the
        # batch reader under foreachBatch.
        return iter(
            [row for fp in files for row in _read_file(fp, None, False)]
        )




class _WireWriteCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class _WireBatchWriter(DataSourceWriter):
    """Executor-side JSON-lines writer with the standard two-phase
    commit: each task writes a ``.tmp-`` file and reports it in its
    commit message; the driver's ``commit()`` renames every staged file
    to its final name, ``abort()`` deletes the staging files. A task
    retry overwrites its own tmp file, so speculative/retried tasks
    never double-publish — the same publish-by-rename discipline as
    ``plans/wire.py``'s stage handoff."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hrfco_wire writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> "_WireWriteCommit":
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-wire-{pid:05d}.json")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                rec = {k: row[k] for k in _FIELDS if row[k] is not None}
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
                n += 1
        return _WireWriteCommit(tmp, n)

    def commit(self, messages) -> None:
        # publish first, clean up after: the directory always holds a
        # SUPERSET of valid data — a crash between the renames and the
        # stale-file sweep leaves extra rows (at-least-once), never a
        # hole; os.replace atomically supersedes same-named files
        published = set()
        for m in messages:
            name = os.path.basename(m.tmp_path)[len(".tmp-"):]
            os.replace(m.tmp_path, os.path.join(self.path, name))
            published.add(name)
        if self.overwrite:
            for name in os.listdir(self.path):
                if (
                    name.endswith(".json")
                    and not name.startswith(".tmp-")
                    and name not in published
                ):
                    os.remove(os.path.join(self.path, name))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class HrfcoWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hrfco_wire"

    def schema(self) -> str:
        return WIRE_SCHEMA

    def reader(self, schema) -> _WireBatchReader:
        return _WireBatchReader(self.options)

    def simpleStreamReader(self, schema) -> _WireStreamReader:
        return _WireStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> _WireBatchWriter:
        return _WireBatchWriter(self.options, overwrite)


def register(spark) -> None:
    # Spark 4 refuses to plan a reader that overrides pushFilters() when
    # spark.sql.python.filterPushdown.enabled is false (DATA_SOURCE_
    # PUSHDOWN_DISABLED). It is a runtime SQLConf, so enable it here:
    # external sessions (e.g. the correctness driver's) don't carry the
    # builder's session.py defaults.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(HrfcoWireDataSource)
