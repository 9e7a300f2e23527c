package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

class DelimitedSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("ctrl-A-delimited roundtrip with insert/delete split") {
    val dir = tmpDir("graft-delim")
    val df = Seq(
      (1L, "alpha", 10.5, "insert"),
      (2L, "beta", 20.0, "insert"),
      (3L, "gamma", 30.25, "delete")
    ).toDF("id", "name", "amount", "_op")
    Delimited.write(df, dir)
    val ins = Delimited.read(spark, s"$dir/insert", schema)
    val del = Delimited.read(spark, s"$dir/delete", schema)
    assert(ins.count() == 2 && del.count() == 1)
    assert(ins.filter($"id" === 1).select("name").as[String].head() == "alpha")
    assert(del.select("amount").as[Double].head() == 30.25)
  }

  test("partitioned load adds audit timestamp and partition dirs") {
    val dir = tmpDir("graft-load")
    val df = Seq((1L, "a", "2024-01"), (2L, "b", "2024-02")).toDF("id", "v", "month")
    Delimited.loadPartitioned(df, dir, Seq("month"))
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("load_timestamp"))
    assert(back.count() == 2)
    assert(graft.table.FileIO.exists(s"$dir/month=2024-01"))
  }
}
