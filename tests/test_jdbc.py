"""JDBC source smoke test (sources/readers.read_jdbc, reference
rdd/JdbcRDD.scala) against embedded Apache Derby — the one database Spark
ships in its own jars directory, so the test needs no external service.
Covers the plain read and the partitioned (numPartitions/partitionColumn)
read path the JdbcRDD analogue documents."""

from pyspark.sql import functions as F

from samba_spark.sources.readers import read_jdbc

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_read_jdbc_embedded_derby_roundtrip(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    src = (
        spark.range(0, 100)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k") * 2)
    )
    src.write.jdbc(url, "t_smoke", mode="overwrite", properties=DERBY_PROPS)

    got = read_jdbc(spark, url, "t_smoke", properties=DERBY_PROPS)
    assert got.count() == 100
    assert got.where("k = 7").collect()[0].v == 14


def test_read_jdbc_partitioned(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/jdbcdb_part;create=true"
    spark.range(0, 1000).withColumnRenamed("id", "k").write.jdbc(
        url, "t_part", mode="overwrite", properties=DERBY_PROPS
    )
    part = spark.read.jdbc(
        url,
        "t_part",
        column="k",
        lowerBound=0,
        upperBound=1000,
        numPartitions=4,
        properties=DERBY_PROPS,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 1000
    # each stride actually carries rows (the split predicates are real)
    sizes = part.rdd.glom().map(len).collect()
    assert all(s > 0 for s in sizes)
