package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/**
 * JSON shredding — the reference's signature reshaping operator
 * (`adapter/JsonAdapter.java:62-263`) re-expressed in pure Catalyst:
 * `from_json` with an explicit schema, dotted access for nested scalars,
 * and one `explode` per array in the selection. Chained explodes over
 * sibling arrays reproduce the reference's cartesian list-merge
 * (`JsonAdapterTest.java:199-242`) because each explode multiplies the
 * surviving rows by the next array's elements.
 *
 * Selection language: leaf paths like `"a.b.c"`; any path segment that is
 * an array in the schema is exploded (arrays of objects yield one output
 * row per element; arrays of scalars yield the scalar). Output columns are
 * named with `#` separators like the reference (`a#b#c`).
 */
object JsonShred {

  /** Shred `jsonCol` (string JSON) of `df` into columns for `paths`,
    * exploding every array segment along each path. `keep` columns of the
    * source row are carried through (duplicated into each exploded record,
    * like the reference duplicates the rest of the row). */
  def shred(df: DataFrame, jsonCol: Column, schema: DataType, paths: Seq[String],
      keep: Seq[Column] = Seq.empty): DataFrame = {
    val parsed = df.withColumn("_j", from_json(jsonCol, schema))

    // collect array prefixes in schema order of appearance across all paths
    val arrayPrefixes = scala.collection.mutable.LinkedHashSet.empty[Seq[String]]
    for (p <- paths) {
      val segs = p.split('.').toSeq
      var t: DataType = schema
      for (i <- segs.indices) {
        t match {
          case st: StructType =>
            val f = st.fields.find(_.name == segs(i)).getOrElse(
              throw new IllegalArgumentException(s"no field ${segs(i)} in $p"))
            f.dataType match {
              case ArrayType(et, _) =>
                arrayPrefixes += segs.take(i + 1)
                t = et
              case other => t = other
            }
          case other =>
            throw new IllegalArgumentException(s"cannot descend into $other at ${segs(i)}")
        }
      }
    }

    // explode each array prefix once, in order; nested arrays see the
    // already-exploded parent alias
    var cur = parsed
    val aliasOf = scala.collection.mutable.Map.empty[Seq[String], String]
    for ((prefix, idx) <- arrayPrefixes.toSeq.zipWithIndex) {
      val alias = s"_e$idx"
      val parentArray: Column = resolve(col("_j"), prefix, aliasOf)
      cur = cur.withColumn(alias, explode_outer(parentArray))
      aliasOf(prefix) = alias
    }

    val outCols = keep ++ paths.map { p =>
      val segs = p.split('.').toSeq
      resolve(col("_j"), segs, aliasOf).as(segs.mkString("#"))
    }
    cur.select(outCols: _*)
  }

  /** Resolve a path against the deepest exploded prefix alias. */
  private def resolve(root: Column, segs: Seq[String],
      aliasOf: scala.collection.Map[Seq[String], String]): Column = {
    val hit = (segs.indices.reverse.map(i => segs.take(i + 1)) :+ Seq.empty[String])
      .find(p => p.isEmpty || aliasOf.contains(p)).get
    val base = if (hit.isEmpty) root else col(aliasOf(hit))
    segs.drop(hit.length).foldLeft(base)((c, s) => c.getField(s))
  }
}
