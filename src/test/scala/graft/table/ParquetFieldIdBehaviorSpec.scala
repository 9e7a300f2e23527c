package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/**
 * Regression canary for the PHYSICAL Spark/parquet behaviors nested schema
 * evolution rests on (a Spark upgrade that changes any of these must fail
 * here, loudly, before it can corrupt a table):
 *   1. nested LEAF rename: requested schema keeps the id, name differs → binds
 *   2. nested add: requested id absent from an id-ful file group → NULL, not error
 *   3. nested widen: int32 leaf reads through a long requested type
 *   4. pushdown on a renamed nested path over old files stays correct
 *   5. renamed GROUP nodes (struct containers) do NOT re-bind in any reader
 *      path — why [[GraftTable.renameColumn]] refuses complex-typed columns
 *   6. casting to the id-ful struct type propagates nested ids into footers
 *   7. an id-ful requested nested schema over an id-less file ERRORS — why
 *      legacy interiors refuse nested evolution instead of upgrading in place
 */
class ParquetFieldIdBehaviorSpec extends SparkSuite {

  private def fid(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata).putLong("parquet.field.id", id.toLong).build())

  private val writeSchema = StructType(Seq(
    fid(StructField("id", LongType, nullable = false), 1),
    fid(StructField("meta", StructType(Seq(
      fid(StructField("author", StringType), 3),
      fid(StructField("score", IntegerType), 4))), nullable = true), 2)))

  test("probe: nested field-id rename/add/widen/pushdown") {
    val dir = tmpDir("nested-probe")
    val rows = (1 to 100).map(i => Row(i.toLong, Row(s"a$i", i * 10)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), writeSchema)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    df.write.mode("overwrite").parquet(dir)

    // 1. rename nested author -> writer, same id 3
    val renamed = StructType(Seq(
      fid(StructField("id", LongType, nullable = false), 1),
      fid(StructField("meta", StructType(Seq(
        fid(StructField("writer", StringType), 3),
        fid(StructField("score", IntegerType), 4))), nullable = true), 2)))
    val r1 = spark.read.schema(renamed).parquet(dir)
    val got = r1.select(col("id"), col("meta.writer")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(7L) == "a7" && got.size == 100, s"rename bind failed: ${got.take(3)}")

    // 2. add nested field id 5 (absent from file) -> NULL not error
    val added = StructType(Seq(
      fid(StructField("id", LongType, nullable = false), 1),
      fid(StructField("meta", StructType(Seq(
        fid(StructField("writer", StringType), 3),
        fid(StructField("score", IntegerType), 4),
        fid(StructField("extra", DoubleType), 5))), nullable = true), 2)))
    val r2 = spark.read.schema(added).parquet(dir)
    assert(r2.filter(col("meta.extra").isNull).count() == 100)
    assert(r2.filter(col("meta.writer").isNotNull).count() == 100)

    // 3. widen nested score int -> long through the id
    val widened = StructType(Seq(
      fid(StructField("id", LongType, nullable = false), 1),
      fid(StructField("meta", StructType(Seq(
        fid(StructField("writer", StringType), 3),
        fid(StructField("score", LongType), 4))), nullable = true), 2)))
    val r3 = spark.read.schema(widened).parquet(dir)
    val s = r3.agg(sum(col("meta.score"))).head().getLong(0)
    assert(s == (1 to 100).map(_ * 10L).sum, s"widen sum=$s")

    // 4. pushdown on the RENAMED nested path over the old file: filter must
    // return the right rows (parquet nested pushdown matches by name; the
    // new name has no physical column, so it must not wrongly prune)
    val n = r1.filter(col("meta.writer") === "a42").count()
    assert(n == 1, s"pushdown on renamed nested path returned $n rows")
    // and on the widened nested int-as-long
    assert(r3.filter(col("meta.score") === 420L).count() == 1)

    // 5. drop a nested field (project only id 4) — old files still read
    val dropped = StructType(Seq(
      fid(StructField("id", LongType, nullable = false), 1),
      fid(StructField("meta", StructType(Seq(
        fid(StructField("score", IntegerType), 4))), nullable = true), 2)))
    val r6 = spark.read.schema(dropped).parquet(dir)
    assert(r6.select(sum(col("meta.score"))).head().getLong(0) == (1 to 100).map(_ * 10L).sum)

    // 6. renaming the STRUCT column itself (id 2) does NOT bind — group
    // nodes resolve by name in every reader path. If a Spark upgrade ever
    // makes this bind, the complex-rename refusal in GraftTable.renameColumn
    // can be lifted; until then it MUST stay (silent NULLs otherwise).
    val structRenamed = StructType(Seq(
      fid(StructField("id", LongType, nullable = false), 1),
      fid(StructField("info", StructType(Seq(
        fid(StructField("author", StringType), 3),
        fid(StructField("score", IntegerType), 4))), nullable = true), 2)))
    val r5 = spark.read.schema(structRenamed).parquet(dir)
    val vec = r5.select(col("info.author")).collect().count(_.isNullAt(0) == false)
    spark.conf.set("spark.sql.parquet.enableNestedColumnVectorizedReader", "false")
    val row1 = spark.read.schema(structRenamed).parquet(dir)
      .select(col("info.author")).collect().count(_.isNullAt(0) == false)
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    val row2 = spark.read.schema(structRenamed).parquet(dir)
      .select(col("info.author")).collect().count(_.isNullAt(0) == false)
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    spark.conf.set("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
    assert(vec == 0 && row1 == 0 && row2 == 0,
      s"renamed struct GROUP suddenly binds by id ($vec/$row1/$row2 non-null) — " +
        "revisit GraftTable.renameColumn's complex-type refusal")
  }

  test("probe: cast-to-id-ful-struct propagates nested ids into the footer") {
    val dir = tmpDir("nested-write")
    // an incoming frame WITHOUT any field ids (as a user's append would be)
    val plain = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 10).map(i => Row(i.toLong, Row(s"a$i", i))), 1),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("meta", StructType(Seq(
          StructField("author", StringType), StructField("score", IntegerType)))))))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val metaField = writeSchema("meta")
    val aligned = plain.select(
      plain.col("id").as("id", writeSchema("id").metadata),
      plain.col("meta").cast(metaField.dataType).as("meta", metaField.metadata))
    aligned.write.mode("overwrite").parquet(dir)

    val f = graft.table.FileIO.listFilesRecursively(dir, ".parquet").head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f), new org.apache.hadoop.conf.Configuration()))
    val msg = footer.getFooter.getFileMetaData.getSchema.toString
    footer.close()
    println(s"PROBE footer schema:\n$msg")
    assert(msg.contains("= 3") && msg.contains("= 4"), s"nested ids missing:\n$msg")

    // and a rename-read binds against the cast-written file
    val renamed = StructType(Seq(
      fid(StructField("id", LongType, nullable = false), 1),
      fid(StructField("meta", StructType(Seq(
        fid(StructField("writer", StringType), 3),
        fid(StructField("score", IntegerType), 4))), nullable = true), 2)))
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    assert(spark.read.schema(renamed).parquet(dir)
      .filter(col("meta.writer").isNotNull).count() == 10)
  }

  test("probe: id-ful requested NESTED schema over an id-less file") {
    val dir = tmpDir("nested-legacy")
    val plain = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 5).map(i => Row(i.toLong, Row(s"a$i", i))), 1),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("meta", StructType(Seq(
          StructField("author", StringType), StructField("score", IntegerType)))))))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    plain.write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val r = scala.util.Try(
      spark.read.schema(writeSchema).parquet(dir).select(col("meta.author")).collect())
    assert(r.isFailure,
      "an id-ful requested NESTED schema over an id-less file no longer errors — " +
        "the legacy-interior refusal in GraftTable.nestedGuards may be revisitable")
  }
}
