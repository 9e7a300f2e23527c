package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (array<float>).
 *
 * Brute-force cosine is the exact baseline: one codegen'd map + a top-k
 * (TakeOrdered) — no shuffle beyond the final k rows to the driver. The
 * LSH-bucketed variant is the 100 TB path: random-hyperplane signatures
 * turn cosine neighborhoods into equi-join buckets, so candidate
 * generation is linear, not all-pairs.
 */
object Similarity {

  /** dot(a, b) as a column expression (zip_with + aggregate — codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(norm(a) * norm(b), lit(1e-12))

  /** Exact top-k by cosine against a fixed query vector. */
  def bruteForceTopK(
      df: DataFrame, embCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query.map(_.toDouble))
    df.select(col(idCol), cosine(col(embCol).cast("array<double>"), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Random-hyperplane signature: bit j = sign(dot(v, h_j)). The
    * hyperplanes are deterministic ±1 matrices PRECOMPUTED on the driver
    * and inlined as literals — the per-row work is bits×dim multiply-adds
    * with zero hash calls (hashing (j,i) per row per bit would cost 1000+
    * hash evaluations per vector). Cosine-similar vectors agree on most
    * bits (Charikar, STOC 2002). */
  def hyperplaneSig(emb: Column, bits: Int, seed: Long = 42L, maxDim: Int = 512): Column = {
    val v = emb.cast("array<double>")
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(bits)(Seq.fill(maxDim)(if (rnd.nextBoolean()) 1.0 else -1.0))
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, j) => {
        // slice to the vector's length: zip_with null-pads the shorter side
        val plane = slice(element_at(typedLit(planes), j.cast("int") + 1), lit(1), size(v))
        val d = aggregate(zip_with(v, plane, (x, s) => x * s),
          lit(0.0d), (a, x) => a + x)
        acc.bitwiseOR(when(d > 0, call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(lit(0L)))
      })
  }

  /**
   * Approximate nearest neighbors of every vector: bucket by the top
   * `bandBits`-bit bands of the hyperplane signature, generate candidates
   * per bucket, verify exact cosine ≥ threshold.
   * Returns (id_a, id_b, cosine), id_a < id_b.
   */
  def lshNearNeighbors(
      df: DataFrame, embCol: String, idCol: String,
      sigBits: Int = 32, bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    require(sigBits % bands == 0)
    val r = sigBits / bands
    val mask = (1L << r) - 1
    val withSig = df.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("v"))
      .withColumn("_sig", hyperplaneSig(col("v"), sigBits))
    val banded = withSig.select(col("id"), col("v"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), shiftright(col("_sig"), b * r).bitwiseAND(mask).as("bh"))
      }: _*)).as("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.alias("a"); val b2 = banded.alias("b")
    a.join(b2, col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /**
   * IVF-style search: assign every vector to its nearest of `centroids`
   * (argmin distance — a broadcast of the small centroid table), then
   * search only the query's probe cells. Centroids here are caller-chosen
   * (e.g. sampled vectors) — k-means training is out of scope of a scan op.
   */
  def ivfAssign(df: DataFrame, embCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    val cents = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), typedLit(c).as("cv"))
    }: _*)
    df.withColumn("_cell",
      aggregate(
        transform(cents, c => struct(
          (lit(-1.0) * dot(col(embCol).cast("array<double>"), c.getField("cv"))).as("negdot"),
          c.getField("cid").as("cid"))),
        struct(lit(Double.MaxValue).as("negdot"), lit(-1).as("cid")),
        (best, cand) => when(cand.getField("negdot") < best.getField("negdot"), cand).otherwise(best))
        .getField("cid"))
  }
}
