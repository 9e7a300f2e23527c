package graft.run
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions) // SQL MERGE/DDL contract queries
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      val c0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count() // cold (codegen+JIT)
      val cold = (System.nanoTime() - c0) / 1e9
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[qprobe] $q cold=$cold%.2f warm=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
