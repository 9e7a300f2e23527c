package graft.run

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Per-job wall-clock breakdown of ONE contract query: runs the query under a
 * listener that records every Spark job's (start, end, description), then
 * prints the job timeline INCLUDING the driver-side gaps between jobs —
 * which is where commit/planning/footer time hides. Diagnostic only; the
 * bench contract lives in [[graft.Bench]] and is untouched.
 *
 * Usage: sbt "runMain graft.run.JobProbe q30_merge_composite [q31...]"
 */
object JobProbe {
  private final case class J(id: Int, start: Long, var end: Long, desc: String)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", math.max(cpus, 16).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same warmup as Bench so first-query numbers aren't JIT noise
    spark.range(1).count()
    spark.read.parquet(s"$dir/nation.parquet").groupBy("n_regionkey").count().collect()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val d = Option(s.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(s.jobId, J(s.jobId, System.nanoTime(), 0L, d.take(90)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = System.nanoTime()
      }
    })

    for (q <- args) {
      jobs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // listener bus drain
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      var prevEnd = t0
      var jobSum = 0.0
      println(f"[jobprobe] ==== $q wall=$wall%.2f s, ${js.size} jobs ====")
      for (j <- js) {
        val gap = (j.start - prevEnd) / 1e9
        val dur = if (j.end == 0) -1.0 else (j.end - j.start) / 1e9
        if (dur >= 0) jobSum += dur
        println(f"[jobprobe]   gap=$gap%6.3f job=${j.id}%3d dur=$dur%6.3f  ${j.desc}")
        prevEnd = if (j.end == 0) j.start else j.end
      }
      val tailGap = "%.3f".format(((t0 + (wall * 1e9).toLong) - prevEnd) / 1e9)
      println(f"[jobprobe]   jobs=$jobSum%.2f s, driver gaps=${wall - jobSum}%.2f s, tail=$tailGap")
    }
    spark.stop()
  }
}
