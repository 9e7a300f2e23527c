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
    // optional scratch root (e.g. /dev/shm/probe) for shuffle + output: on a
    // one-box proxy the SHARED disk floors the shuffle+write phase; per-node
    // storage on a real cluster is emulated by tmpfs
    val scratch = args.lift(2)
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
    val spark = scratch.fold(b0)(d => b0.config("spark.local.dir", s"$d/sparklocal"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-stage effective parallelism: sum of task run times / stage wall —
    // distinguishes "cores idle (skew/waves)" from "per-task work inflated"
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Int, Double, Double, Double)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val t0 = new scala.collection.mutable.HashMap[Int, Long]
      private val taskSum = new scala.collection.mutable.HashMap[Int, Long]
      private val taskMax = new scala.collection.mutable.HashMap[Int, Long]
      override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        t0(s.stageInfo.stageId) = System.nanoTime()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = synchronized {
        val d = t.taskInfo.duration
        taskSum(t.stageId) = taskSum.getOrElse(t.stageId, 0L) + d
        taskMax(t.stageId) = math.max(taskMax.getOrElse(t.stageId, 0L), d)
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = synchronized {
        val id = s.stageInfo.stageId
        val wall = (System.nanoTime() - t0.getOrElse(id, System.nanoTime())) / 1e9
        stages += ((id, s.stageInfo.numTasks, wall,
          taskSum.getOrElse(id, 0L) / 1e3, taskMax.getOrElse(id, 0L) / 1e3))
      }
    })
    def time[T](name: String)(body: => T): T = {
      stages.clear()
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe $cpus] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      for ((id, n, wall, sum, mx) <- stages.sortBy(_._1))
        println(f"[probe $cpus]   stage $id%3d tasks=$n%3d wall=$wall%6.2fs taskSum=$sum%7.2fs effPar=${sum / math.max(wall, 0.01)}%4.1f maxTask=$mx%5.2fs")
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
    val out = scratch.map(d => s"$d/out-$cpus")
      .getOrElse(java.nio.file.Files.createTempDirectory("probe").toString + "/out")
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
