"""Write-side scale primitives: partitioned parquet layout with partition
pruning on re-read, and update output mode for streaming aggregations."""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_ibm_mq_spark.plans import formatted_explain
from spark_ibm_mq_spark.streaming.readers import events_file_stream
from spark_ibm_mq_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """partitionBy layout → reading one partition touches one directory:
    PartitionFilters in the scan, not a full-data filter. The physical
    layout decision that makes 100 TB date-range queries cheap."""
    out = str(tmp_path / "by_type")
    ev = load_table(spark, SF_DIR, "events")
    ev.write.partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    text = formatted_explain(back)
    assert "PartitionFilters" in text and "purchase" in text, text[:1500]
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert back.count() == expected > 0


def test_update_output_mode_emits_changed_groups(spark, tmp_path):
    """Update mode re-emits only groups changed in each micro-batch — the
    middle ground between append (withheld until watermark) and complete
    (everything every batch)."""
    src = str(tmp_path / "in")
    spark.createDataFrame([(i % 3, float(i)) for i in range(30)], "k bigint, v double") \
        .coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema("k bigint, v double")
        .parquet(src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("s"))
        .writeStream.format("memory")
        .queryName("updsink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.k: (r.n, r.s) for r in spark.sql("select * from updsink").collect()}
    assert rows == {0: (10, 135.0), 1: (10, 145.0), 2: (10, 155.0)}
