"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-transactions connector, the Spark-native
replacement for the reference's row-loop generator
(reference dags/simulate_data.py:225 — its Python loop builds
per-user frames and appends them on a single host).

``spark.read.format("clv_synthetic").option("n_rows", ...)`` plans one
InputPartition per ``partitions`` option; every partition generates its
slice independently executor-side from pure integer arithmetic — no
driver data path, no RNG state, linear scale-out.  The same arithmetic
is SQL-expressible, so the registered query carries a full DuckDB
oracle: a custom CONNECTOR whose output is hash-verified.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

#: affine-hash constants shared by the reader and the SQL oracle
A, B, P = 1103515245, 12345, 2147483647

SCHEMA_DDL = (
    "txn_id bigint, customer_id bigint, amount double, day_offset bigint"
)


def _row(i: int) -> tuple[int, int, float, int]:
    h = (i * A + B) % P
    return (
        i,
        h % 200,                      # customer
        (h % 99000) / 100.0 + 1.0,    # amount 1.00 .. 990.99
        h % 30,                       # day offset in the month
    )


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticTxnReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            _Partition(lo, hi)
            for lo, hi in zip(bounds, bounds[1:])
            if lo < hi
        ]

    def read(self, partition: _Partition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticTxnDataSource(DataSource):
    """``format("clv_synthetic")`` — options: n_rows, partitions."""

    @classmethod
    def name(cls) -> str:
        return "clv_synthetic"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SyntheticTxnReader:
        return SyntheticTxnReader(self.options)


def register(spark) -> None:
    """Idempotent datasource registration on a session."""
    if not getattr(spark, "_clv_pyds_registered", False):
        spark.dataSource.register(SyntheticTxnDataSource)
        spark._clv_pyds_registered = True
