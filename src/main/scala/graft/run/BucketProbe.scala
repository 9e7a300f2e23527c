package graft.run

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Merge
import graft.table.{GraftTable, PartitionSpec}

/**
 * Shuffle-elimination probe for bucket-preserving merges: the SAME upsert
 * batch merged into the SAME corpus staged two ways — `bucket(n, url)`
 * (target scan reports HashPartitioning, only the source shuffles) vs
 * unpartitioned (both sides of the full-outer join shuffle). Prints one
 * JSON line with wall seconds and TOTAL shuffle-write bytes per layout;
 * the bytes delta is the touched-target volume the bucketed layout never
 * moves — the number that matters at 100 TB, where the merge shuffle IS
 * the job. Layouts alternate across rounds (mins reported) because this
 * host's timings vary by the minute.
 *
 * Usage: runMain graft.run.BucketProbe [nUrls=1000000] [changePermille=50]
 *   [buckets=32] [cpus=8] [rounds=2]
 */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val nUrls = args.headOption.map(_.toLong).getOrElse(1000000L)
    val changePermille = args.lift(1).map(_.toInt).getOrElse(50)
    val buckets = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = args.lift(3).map(_.toInt).getOrElse(8)
    val rounds = args.lift(4).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bucket-probe")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    // listener events drain asynchronously — settle before reading the sum
    def settledShuffle(): Long = { Thread.sleep(2000); shuffleBytes.get() }

    def stage(root: String, bucketed: Boolean): GraftTable = {
      val props =
        if (bucketed) Map(PartitionSpec.Property -> s"bucket($buckets, url)")
        else Map.empty[String, String]
      val t = GraftTable.create(spark, root, Synth.pageSchema, props)
      t.append(Synth.pages(spark, nUrls, hosts = 2000, partitions = 64, htmlRepeatMax = 64))
      // realistic maintained table: right-sized key-ordered files (the
      // bucketed append otherwise leaves 64 tasks × n bucket dirs of shards)
      graft.ops.Compact.run(t, targetBytes = 128L << 20, orderBy = Some("url"))
      t
    }

    def upserts(t: GraftTable, seed: Long) =
      t.read().filter(pmod(xxhash64(col("url"), lit(seed)), lit(1000)) < lit(changePermille))
        .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 100 DAYS"))
        .withColumn("text", concat(lit("UPD-"), col("text")))
        .withColumn("_deleted", lit(false))
        .localCheckpoint(true)

    val base = java.nio.file.Files.createTempDirectory("graft-bucketprobe").toString
    val acc = scala.collection.mutable.Map.empty[String, List[(Double, Long)]]
    for (r <- 0 until rounds; layout <- Seq("bucketed", "plain")) {
      val t = stage(s"$base/$layout-$r/t", layout == "bucketed")
      val src = upserts(t, 42L + r)
      val srcRows = src.count()
      val pre = settledShuffle()
      val t0 = System.nanoTime()
      Merge.into(t, src)
      val sec = (System.nanoTime() - t0) / 1e9
      val moved = settledShuffle() - pre
      println(f"[bucket-probe] round=$r layout=$layout src_rows=$srcRows " +
        f"merge_sec=$sec%.1f shuffle_write_mb=${moved / 1048576.0}%.0f")
      acc(layout) = (sec, moved) :: acc.getOrElse(layout, Nil)
      graft.table.FileIO.deleteRecursively(s"$base/$layout-$r")
    }
    val js = Seq("bucketed", "plain").map { l =>
      val best = acc(l).minBy(_._1)
      val minShuffle = acc(l).map(_._2).min
      f""""$l":{"merge_sec":${best._1}%.2f,"shuffle_write_bytes":$minShuffle}"""
    }.mkString(",")
    println(s"""{"probe":"bucket-merge-shuffle","n_urls":$nUrls,"change_permille":$changePermille,"buckets":$buckets,"cpus":$cpus,$js}""")
    graft.table.FileIO.deleteRecursively(base)
    spark.stop()
  }
}
