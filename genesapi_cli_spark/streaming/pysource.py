"""Spark 4 Python STREAMING data source: a deterministic events-replay
stream (``spark.readStream.format("events_replay")``) that turns the static
events table into ordered micro-batches — the local stand-in for a Kafka
topic when developing/testing streaming jobs against recorded history.

API surface: ``SimpleDataSourceStreamReader`` — the driver-side variant of
the Python streaming source API (right for replay/control-plane rates; the
partition-based ``DataSourceStreamReader`` is the executor-parallel variant
for firehose rates). Offsets are row positions over the event_id ordering,
so every run replays the identical batch sequence: offset {i} → rows with
rank in [i, i+batch_rows). Exhaustion returns the same offset with an empty
batch, which is how ``processAllAvailable``/availableNow know to stop.

Batch ≡ stream equivalence is pytest-enforced (tests/test_streaming.py),
same as every other streaming transform in this repo.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENTS_REPLAY_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("events_replay: `path` option required")
        self.batch_rows = int(options.get("batch_rows", "1000"))
        self._rows = None  # lazily loaded, cached for the query's lifetime

    def _load(self):
        if self._rows is None:
            import pyarrow.parquet as pq

            t = pq.read_table(
                self.path, columns=["event_id", "user_id", "event_type", "value"]
            )
            rows = list(zip(*[t.column(c).to_pylist() for c in t.column_names]))
            rows.sort(key=lambda r: r[0])  # deterministic replay order
            self._rows = rows
        return self._rows

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start: dict):
        rows = self._load()
        i = start["idx"]
        j = min(i + self.batch_rows, len(rows))
        return iter(rows[i:j]), {"idx": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = self._load()
        return iter(rows[start["idx"] : end["idx"]])


class EventsReplayDataSource(DataSource):
    """Register per session: ``spark.dataSource.register(EventsReplayDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return EVENTS_REPLAY_SCHEMA

    def simpleStreamReader(self, schema) -> EventsReplayStreamReader:
        return EventsReplayStreamReader(self.options)
