"""JDBC round-trip over the Derby embedded driver that ships with Spark —
closes S6's execution-coverage gap without an external database: write a
table through the JDBC sink, read it back through read_jdbc (plain and
partitioned), and compare exactly."""

import pyspark.sql.functions as F

from pinterest_data_pipeline218_spark.sources.batch import read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_roundtrip_derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    src = spark.range(0, 100).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 2).cast("double").alias("val"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "t_round")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )

    back = read_jdbc(spark, url, "t_round", properties={"driver": DRIVER})
    assert back.count() == 100
    assert {r.id: (r.val, r.name) for r in back.collect()} == {
        i: (float(i * 2), f"name_{i}") for i in range(100)
    }

    # partitioned read: same rows, but the scan fans out over N connections —
    # the shape that matters for a bulk extract at scale
    part = read_jdbc(
        spark, url, "t_round", properties={"driver": DRIVER},
        partition_column="id", num_partitions=4, lower_bound=0, upper_bound=100,
    )
    assert part.rdd.getNumPartitions() == 4
    assert sorted(r.id for r in part.collect()) == list(range(100))
