package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Delimited flat-file source/sink — the reference's HDFS target adapter
 * re-expressed through Spark's CSV reader/writer (which it is, semantically:
 * `adapter/HdfsTargetAdapter.java:37-152` writes -separated rows per
 * partition; `hive/HiveTableIR.java:456-517` loads them into a temp table).
 *
 * The insert/delete file split of the reference (`insert_<pid>` /
 * `delete_all_<pid>`) maps to two directories selected by an `_op` column;
 * downstream they become the matched/not-matched branches of MERGE.
 */
object Delimited {

  val Sep = ""

  /** Write `df` as separator-delimited text, one directory per op kind when
    * an `_op` column ("insert" | "delete") is present. ONE pass over the
    * child: the split is a partitionBy on `_op` (per-op filtered writes
    * would execute an expensive upstream — e.g. the MERGE change join —
    * once per op kind); the partition dirs are then renamed to the
    * reference's `<dir>/insert`, `<dir>/delete` layout. */
  def write(df: DataFrame, dir: String, sep: String = Sep): Unit = {
    if (df.columns.contains("_op")) {
      // only the two known op kinds are written (the previous per-op
      // filtered writer silently dropped anything else; keep that contract
      // rather than leaving stray _op=<other> partition dirs behind)
      df.filter(col("_op").isin("insert", "delete"))
        .write.mode("overwrite").partitionBy("_op")
        .option("sep", sep).option("emptyValue", "").csv(dir)
      for (op <- Seq("insert", "delete")) {
        val src = java.nio.file.Paths.get(s"$dir/_op=$op")
        val dst = java.nio.file.Paths.get(s"$dir/$op")
        if (java.nio.file.Files.isDirectory(src))
          java.nio.file.Files.move(src, dst,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        else java.nio.file.Files.createDirectories(dst) // op kind absent → empty dir
      }
    } else {
      df.write.mode("overwrite").option("sep", sep).option("emptyValue", "").csv(dir)
    }
  }

  /** Read a delimited directory with an explicit schema (the reference's
    * target-schema DSL analog is just a StructType here). */
  def read(spark: SparkSession, dir: String, schema: StructType, sep: String = Sep): DataFrame =
    spark.read.schema(schema).option("sep", sep).option("emptyValue", "").csv(dir)

  /** The reference's audit column (`LOAD_TIMESTAMP current_timestamp()`,
    * `hive/HiveTableIR.java:554-556`) + dynamic-partition load
    * (`:501-513`) as one idiomatic write. */
  def loadPartitioned(df: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    df.withColumn("load_timestamp", current_timestamp())
      .write.mode("append").partitionBy(partitionCols: _*).parquet(dir)
}
