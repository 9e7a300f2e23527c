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

  /** dot(a, b) as a column expression (zip_with + aggregate; fine for
    * one-off uses — hot paths use the codegen'd kernels below). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine via the single-pass codegen'd kernel
    * ([[graft.functions.CosineSimExpr]]); inputs must be array<double>. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosine(a, b)

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
  def hyperplaneSig(emb: Column, bits: Int, seed: Long = 42L, maxDim: Int = 512): Column =
    graft.functions.VectorOps.hyperplaneSig(emb.cast("array<double>"), bits, seed, maxDim)

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
    // one persisted row per vector; the banded self-join carries only
    // (id, band-key) — exploding the embedding ×bands through the join
    // exchange would multiply shuffle bytes by the band count — and the
    // vectors are joined back only for surviving candidate pairs
    val base = df.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("v"))
      .withColumn("_sig", hyperplaneSig(col("v"), sigBits))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), shiftright(col("_sig"), b * r).bitwiseAND(mask).as("bh"))
      }: _*)).as("bk"))
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val out = cand
      .join(base.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .localCheckpoint(true) // pin pairs (small), release the vector cache
    base.unpersist()
    out
  }

  /**
   * IVF-style search: assign every vector to its nearest of `centroids`
   * (max inner product via the codegen'd [[graft.functions.ArgMaxDotExpr]]
   * kernel — one tight loop per row over a flattened centroid matrix), then
   * search only the query's probe cells. Centroids here are caller-chosen
   * (e.g. sampled vectors) — k-means training is out of scope of a scan op.
   */
  def ivfAssign(df: DataFrame, embCol: String, centroids: Seq[Seq[Double]]): DataFrame =
    df.withColumn("_cell",
      graft.functions.VectorOps.argMaxDot(col(embCol).cast("array<double>"), centroids))

  /**
   * IVF probe search, the query path over [[ivfAssign]]'s cells: rank the
   * centroids against `query` driver-side (the centroid table is tiny by
   * construction), keep the `nProbe` nearest cells, scan ONLY rows assigned
   * to those cells, exact-cosine within them, top-k.
   *
   * At 100 TB the `_cell` column is what you bucket/partition the corpus by
   * (e.g. `bucket(cells, _cell)` hidden partitioning after materializing
   * the assignment), so the `isin` filter becomes file pruning and the scan
   * cost is nProbe/cells of the corpus instead of all of it — the classic
   * IVF trade of recall for a constant-fraction scan.
   */
  def ivfSearch(
      assigned: DataFrame,
      embCol: String,
      idCol: String,
      centroids: Seq[Seq[Double]],
      query: Seq[Double],
      k: Int,
      nProbe: Int): DataFrame = {
    require(assigned.columns.contains("_cell"), "ivfSearch needs ivfAssign's _cell column")
    require(nProbe >= 1 && nProbe <= centroids.size)
    def dotS(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).map(_ * _).sum
    val qn = math.sqrt(dotS(query, query))
    val probes = centroids.zipWithIndex
      .sortBy { case (c, i) =>
        (-dotS(c, query) / math.max(math.sqrt(dotS(c, c)) * qn, 1e-12), i) }
      .take(nProbe).map(_._2)
    assigned.filter(col("_cell").isin(probes: _*))
      .select(col(idCol),
        cosine(col(embCol).cast("array<double>"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
