"""Custom batch connector via the Spark 4 Python DataSource API.

The reference's only connector is bespoke gspread code glued to pandas
(tasks/bronze.py:22-47). `records_to_df` (records.py) covers the
small-payload path; THIS module is the real-connector shape: a
`DataSource` that plans N input partitions and has each executor read
its own split — the pattern for any paginated/partitioned external API
(Sheets ranges, REST cursors, warehouse export chunks) at cluster scale.

The demo source generates a deterministic "records feed" (row i →
typed columns derived from i), so correctness is oracle-checkable in
SQL against `range(n)` — the connector machinery is what's under test,
not the payload.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class RecordsFeedReader(DataSourceReader):
    """Reader half: plan splits driver-side, generate rows executor-side."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        """Driver-side split planning — each split is a row range, the
        stand-in for an API page/cursor window."""
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        """Executor-side: fetch ONE split. A real connector issues its
        paginated API call here; nothing but this split's rows ever
        lives in memory."""
        for i in range(partition.start, partition.end):
            yield (i, f"rec_{i}", float(i) * 0.5, i % 7 == 0)


class RecordsFeedDataSource(DataSource):
    """`spark.read.format("records_feed").option("rows", N)` source."""

    @classmethod
    def name(cls) -> str:
        return "records_feed"

    def schema(self) -> str:
        return "id bigint, name string, score double, flagged boolean"

    def reader(self, schema: StructType) -> RecordsFeedReader:
        return RecordsFeedReader(self.options)


def read_records_feed(
    spark: SparkSession, rows: int = 1000, partitions: int = 8
) -> DataFrame:
    """Register (idempotent) and read the demo connector."""
    spark.dataSource.register(RecordsFeedDataSource)
    return (
        spark.read.format("records_feed")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .load()
    )
