"""Custom Python DataSource: partition-parallel synthetic generation
must be invariant to the partition count and cover exactly [0, n)."""

from __future__ import annotations


def _read(spark, n_rows, partitions):
    from clv_data_pipeline_spark.sources.pyds import register

    register(spark)
    return (
        spark.read.format("clv_synthetic")
        .option("n_rows", n_rows)
        .option("partitions", partitions)
        .load()
    )


def test_rows_cover_range_exactly(spark):
    df = _read(spark, 1000, 4)
    ids = sorted(r["txn_id"] for r in df.collect())
    assert ids == list(range(1000))


def test_partition_count_does_not_change_data(spark):
    a = {tuple(r) for r in _read(spark, 500, 1).collect()}
    b = {tuple(r) for r in _read(spark, 500, 7).collect()}
    assert a == b


def test_planned_input_partitions(spark):
    df = _read(spark, 1000, 8)
    assert df.rdd.getNumPartitions() == 8


def test_values_match_reference_arithmetic(spark):
    from clv_data_pipeline_spark.sources.pyds import _row

    rows = {r["txn_id"]: r for r in _read(spark, 50, 3).collect()}
    for i in range(50):
        txn_id, cust, amount, day = _row(i)
        r = rows[i]
        assert (r["customer_id"], r["amount"], r["day_offset"]) == (
            cust,
            amount,
            day,
        )
