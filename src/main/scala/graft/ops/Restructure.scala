package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Column restructuring operators mirroring the reference's record-shaping
 * semantics on a columnar engine.
 *
 *  - [[selectPattern]]: dynamic-column pattern select — the reference's HQL
 *    accepts column names with `<component>` placeholders, substitutes any
 *    component bound in the WHERE clause, and turns what remains into a
 *    column-name regex filter `^name.*$`
 *    (`SchemaExplorer/sql/SqlBean.java:265-345`). Here the same contract
 *    compiles to Catalyst's `colRegex`, so projection pushdown still prunes
 *    the parquet scan to exactly the matched columns.
 *  - [[toTargetSchema]]: target restructuring with default fill — the
 *    reference writes a schema-defined default for every target column the
 *    source record lacks (`HBaseToHive/adapter/HdfsTargetModel.java:70-75`).
 *    Here: select in target-schema order, casting present columns and
 *    filling absent ones with the default (NULL when none given).
 */
object Restructure {

  /** Select columns by a dynamic pattern: `<component>`s present in `values`
    * are substituted literally; remaining components match any run (`.*`).
    * A fully-instantiated pattern selects the single named column. */
  def selectPattern(df: DataFrame, pattern: String,
      values: Map[String, String] = Map.empty): DataFrame = {
    val instantiated = values.foldLeft(pattern) { case (p, (k, v)) =>
      p.replace(s"<$k>", v)
    }
    if (instantiated.contains("<")) {
      // literal segments are regex-QUOTED: a '.' in a column pattern means a
      // literal dot, and '(' / '[' must not break the compiled regex
      val regex = "^" + instantiated.split("<[^>]*>", -1)
        .map(seg => if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
        .mkString(".*") + "$"
      df.select(df.colRegex(s"`$regex`"))
    } else df.select(instantiated)
  }

  /** Restructure rows to `target` column order and types; columns missing
    * from `df` are filled with `defaults(name)` (NULL if unspecified). */
  def toTargetSchema(df: DataFrame, target: StructType,
      defaults: Map[String, Any] = Map.empty): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(defaults.get(f.name).orNull).cast(f.dataType).as(f.name)
    }: _*)
  }
}
