package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Cluster

/** Temporary phase-timing probe for the cluster rewrite path.
  * Usage: runMain graft.run.Probe <stagedParquet> <cpus> */
object Probe {
  def main(args: Array[String]): Unit = {
    val staged = args(0)
    val cpus = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe $cpus] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    if (!graft.table.FileIO.exists(staged)) {
      Synth.pages(spark, 400000, hosts = 2000, partitions = 256, htmlRepeatMax = 64)
        .write.parquet(staged)
      println(s"[probe] generated $staged")
    }
    val df = spark.read.schema(Synth.pageSchema).parquet(staged)
    time("count-warm")(df.count())
    val heavy = time("heavyHosts") {
      df.select(Cluster.hostCol(col("url")).as("host"))
        .groupBy("host").count().filter(col("count") > 100000L)
        .collect().map(_.getString(0)).toSeq
    }
    val bounds = time("bounds")(Cluster.computeBounds(df))
    val salted = Cluster.withZKey(df, Cluster.ZDims(), bounds, heavy, 16)
    val out = java.nio.file.Files.createTempDirectory("probe").toString + "/out"
    time("zkey-only-agg") {
      salted.select(bit_xor(col("_zkey"))).first() // isolates zkey compute + scan
    }
    time("shuffle+sort+write") {
      salted.repartitionByRange(59, col("_zkey"), col("_salt"))
        .sortWithinPartitions("_zkey")
        .select(Synth.pageSchema.fieldNames.map(col).toSeq: _*)
        .write.parquet(out)
    }
    graft.table.FileIO.deleteRecursively(out)
    spark.stop()
  }
}
