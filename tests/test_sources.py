"""Schema-evolution ingestion (sources/readers.py::read_parquet_evolving):
mixed-generation parquet conformed to one declared target schema."""

from __future__ import annotations


def test_read_parquet_evolving_generations(spark, tmp_path):
    """Three schema generations of one table — v1 (amount int, cust),
    v2 (renames cust→customer_id, widens amount), v3 (adds channel) —
    read into ONE frame with the declared target schema: legacy names
    coalesce onto current ones, missing columns are typed NULLs, types
    are cast exactly."""
    from pyspark.sql import types as T

    from enterprise_data_quality_platform_spark.sources.readers import (
        read_parquet_evolving,
    )

    v1 = spark.createDataFrame([(1, 10, "a")], "id long, amount int, cust string")
    v2 = spark.createDataFrame(
        [(2, 20_000_000_000, "b")], "id long, amount long, customer_id string"
    )
    v3 = spark.createDataFrame(
        [(3, 30, "c", "web")],
        "id long, amount long, customer_id string, channel string",
    )
    p1, p2, p3 = (str(tmp_path / f"v{i}") for i in (1, 2, 3))
    v1.write.parquet(p1)
    v2.write.parquet(p2)
    v3.write.parquet(p3)

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.LongType()),
            T.StructField("customer_id", T.StringType()),
            T.StructField("channel", T.StringType()),
            T.StructField("never_written", T.IntegerType()),
        ]
    )
    out = read_parquet_evolving(
        spark, [p1, p2, p3], target, renames={"cust": "customer_id"}
    )
    assert [f.name for f in out.schema.fields] == [
        "id", "amount", "customer_id", "channel", "never_written",
    ]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].customer_id == "a" and rows[1].amount == 10
    assert rows[1].channel is None and rows[1].never_written is None
    assert rows[2].amount == 20_000_000_000
    assert rows[3].channel == "web"
