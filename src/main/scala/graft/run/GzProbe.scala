package graft.run

import org.apache.spark.sql.SparkSession

import graft.ops.Cluster
import graft.table.GraftTable

/**
 * A/B probe: the tuned page-dims cluster path vs GENERIC `ZDims.columns`
 * clustering over the same staged input — evidence that the generic
 * embeddings ([[graft.functions.OrderedEncoding]]) cost the same as the
 * hand-tuned path (both are one codegen'd projection + one steered
 * exchange; only the dim expressions differ).
 *
 * Usage: runMain graft.run.GzProbe [urls=400000] [cpus=8]
 */
object GzProbe {
  def main(args: Array[String]): Unit = {
    val urls = args.lift(0).map(_.toInt).getOrElse(400000)
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val staged = s"/tmp/gzprobe-staged-$urls"
    if (!graft.table.FileIO.exists(staged)) {
      Synth.pages(spark, urls, hosts = 2000, partitions = 64, htmlRepeatMax = 64)
        .write.parquet(staged)
      println(s"[gzprobe] generated $staged")
    }
    val input = spark.read.schema(Synth.pageSchema).parquet(staged)
    val bytes = graft.table.FileIO.listFilesRecursively(staged, ".parquet")
      .map(p => new java.io.File(p.stripPrefix("file:")).length()).sum

    // same table state per mode; warm the reader/codegen before timing
    input.count()
    val all = Seq(
      "page" -> Cluster.ZDims(),
      "generic2" -> Cluster.ZDims(columns = Seq("url", "warc_ts")),
      "generic3" -> Cluster.ZDims(columns = Seq("lang", "url", "warc_ts")),
      "hilbert3" -> Cluster.ZDims(curve = "hilbert",
        columns = Seq("lang", "url", "warc_ts")))
    // first mode pays JVM/codegen/write-path warmup: rotate via arg 3 so
    // order effects are measurable, and report two passes per mode
    val rot = args.lift(2).map(_.toInt).getOrElse(0) % all.size
    val modes = all.drop(rot) ++ all.take(rot)
    for ((name, dims) <- modes ++ modes.take(1)) {
      val root = java.nio.file.Files.createTempDirectory(s"gzprobe-$name").toString + "/t"
      val t = GraftTable.create(spark, root, Synth.pageSchema)
      t.append(input)
      val t0 = System.nanoTime()
      val snap = Cluster.zorderRewrite(t, dims, targetFileBytes = 64L * 1024 * 1024,
        runId = s"gzprobe-$name")
      val wall = (System.nanoTime() - t0) / 1e9
      val files = t.files().size
      // pruning quality: planned fraction for a host-prefix + time-range stab
      val pred = org.apache.spark.sql.functions.col("url")
        .startsWith("https://host-11") &&
        org.apache.spark.sql.functions.col("warc_ts") <
          org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2025-01-05 00:00:00"))
      val planned = t.planFiles(Some(pred)).size
      println(f"[gzprobe $cpus] $name%-9s wall=$wall%7.2fs thru=${bytes / 1e9 / wall}%.3f GB/s " +
        f"files=$files%3d planned=$planned%3d snap=${snap.map(_.id).getOrElse(-1L)}")
      graft.table.FileIO.deleteRecursively(root)
    }
    spark.stop()
  }
}
