package graft.run
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      graft.SparkEntry.queries(q)(spark, dir).count() // warm
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[qprobe] $q ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
