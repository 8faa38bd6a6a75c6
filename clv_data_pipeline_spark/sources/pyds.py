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
oracle: a custom CONNECTOR whose output is hash-verified.  A streaming
reader (``spark.readStream.format("clv_synthetic")``) shares the same
arithmetic: offsets are row indices, reads are replayable.

All classes are built INSIDE :func:`_make_datasource` so cloudpickle
serializes them BY VALUE: Spark runs data-source code in dedicated
Python runner processes (separate from executor workers), and the
streaming runner does not inherit ``addPyFile`` paths — a module-level
class pickled by reference dies there with ModuleNotFoundError.
"""

from __future__ import annotations

#: affine-hash constants shared by the reader and the SQL oracle
A, B, P = 1103515245, 12345, 2147483647

SCHEMA_DDL = (
    "txn_id bigint, customer_id bigint, amount double, day_offset bigint"
)


def _row(i: int) -> tuple[int, int, float, int]:
    """Deterministic row i — module-level twin of the factory-local
    copy (kept in sync; tests compare connector output against this)."""
    h = (i * A + B) % P
    return (
        i,
        h % 200,                      # customer
        (h % 99000) / 100.0 + 1.0,    # amount 1.00 .. 990.99
        h % 30,                       # day offset in the month
    )


def _make_datasource():
    """Build the DataSource class tree with by-value picklability (see
    module docstring).  Everything the runner needs is defined in this
    scope — no references back to this module."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    a_, b_, p_ = 1103515245, 12345, 2147483647

    def row(i):
        h = (i * a_ + b_) % p_
        return (i, h % 200, (h % 99000) / 100.0 + 1.0, h % 30)

    class _Partition(InputPartition):
        def __init__(self, start, end):
            self.start, self.end = start, end

    def split(lo, hi, n_parts):
        step = max(1, (hi - lo) // n_parts)
        bounds = list(range(lo, hi, step)) + [hi]
        return [
            _Partition(a, b) for a, b in zip(bounds, bounds[1:]) if a < b
        ]

    class SyntheticTxnReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 1000))
            self.n_parts = int(options.get("partitions", 4))

        def partitions(self):
            return split(0, self.n_rows, self.n_parts)

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield row(i)

    class SyntheticTxnStreamReader(DataSourceStreamReader):
        """Streaming twin: offsets are plain row indices;
        ``partitions(start, end)`` splits the offset range exactly like
        the batch reader splits [0, n_rows), and ``read`` regenerates
        rows from the same pure integer arithmetic — so a restarted
        query re-reads any offset range identically (the replayability
        contract streaming sources must honor).  ``latestOffset``
        reports full availability (n_rows), which under
        Trigger.AvailableNow yields one catch-up batch; a live
        deployment would advance it per poll."""

        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 1000))
            self.n_parts = int(options.get("partitions", 4))

        def initialOffset(self):
            return {"i": 0}

        def latestOffset(self):
            return {"i": self.n_rows}

        def partitions(self, start, end):
            return split(int(start["i"]), int(end["i"]), self.n_parts)

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield row(i)

        def commit(self, end):
            pass

    class SyntheticTxnDataSource(DataSource):
        """``format("clv_synthetic")`` — options: n_rows, partitions."""

        @classmethod
        def name(cls):
            return "clv_synthetic"

        def schema(self):
            return (
                "txn_id bigint, customer_id bigint, "
                "amount double, day_offset bigint"
            )

        def reader(self, schema):
            return SyntheticTxnReader(self.options)

        def streamReader(self, schema):
            return SyntheticTxnStreamReader(self.options)

    return SyntheticTxnDataSource


def register(spark) -> None:
    """Idempotent datasource registration on a session."""
    if not getattr(spark, "_clv_pyds_registered", False):
        spark.dataSource.register(_make_datasource())
        spark._clv_pyds_registered = True
