package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.Synth
import graft.table.GraftTable

/** SQL `OPTIMIZE` / `VACUUM` — maintenance through the injected parser
  * (Spark's grammar has no such productions; everything else must keep
  * parsing through the delegate untouched). */
class SqlMaintenanceSpec extends SparkSuite {

  test("OPTIMIZE compacts; OPTIMIZE ZORDER clusters; VACUUM expires") {
    val t = GraftTable.create(spark, tmpDir("sqlmaint"), Synth.pageSchema)
    t.append(Synth.pages(spark, 3000, partitions = 16))
    val preFiles = t.files().size
    val pre = t.read().agg(bit_xor(xxhash64(col("url"), col("text")))).head().getLong(0)

    val r1 = spark.sql(s"OPTIMIZE graft.`${t.root}`").collect()
    assert(r1.head.getString(0) === "compact" && r1.head.getLong(1) > 0)
    assert(t.files().size < preFiles, "compaction must shrink the file count")
    assert(t.currentSnapshot.get.operation === "compact")

    val r2 = spark.sql(s"OPTIMIZE graft.`${t.root}` ZORDER").collect()
    assert(r2.head.getString(0) === "cluster-zorder" && r2.head.getLong(1) > 0)
    assert(t.currentSnapshot.get.operation === "cluster")
    assert(t.read().agg(bit_xor(xxhash64(col("url"), col("text")))).head().getLong(0) === pre,
      "maintenance must preserve every row byte-for-byte")

    val r3 = spark.sql(s"VACUUM graft.`${t.root}` RETAIN 1 SNAPSHOTS").collect()
    assert(r3.head.getLong(0) >= 2, s"append+compact snapshots must expire: ${r3.toSeq}")
    assert(t.metadata.snapshots.size === 1)
    assert(t.read().agg(bit_xor(xxhash64(col("url"), col("text")))).head().getLong(0) === pre)
  }

  test("hilbert variant and delegate passthrough") {
    val t = GraftTable.create(spark, tmpDir("sqlmaint-h"), Synth.pageSchema)
    t.append(Synth.pages(spark, 1000, partitions = 4))
    val r = spark.sql(s"OPTIMIZE graft.`${t.root}` ZORDER HILBERT").collect()
    assert(r.head.getString(0) === "cluster-hilbert")
    assert(t.currentSnapshot.get.summary("curve") === "hilbert")
    // the wrapped parser must not swallow ordinary SQL or its errors
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) === 2)
    intercept[Exception](spark.sql("OPTIMIZE nonsense without a table"))
    intercept[Exception](spark.sql(s"VACUUM graft.`/no/such/table`").collect())
  }
}
