package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale corpora. All candidate generation
 * is bucket-local (hash groupBy / LSH band join) so no all-pairs shuffle
 * ever happens — the only joins are equi-joins on band keys, which Catalyst
 * plans as shuffled hash/sort-merge joins that scale linearly in corpus
 * size rather than quadratically in pairs.
 */
object Dedup {

  /** Exact dedup: one survivor (min id) per identical value of `on`.
    * A single hash-aggregate — the cheapest possible full-corpus dedup. */
  def exact(df: DataFrame, on: Column, idCol: Column): DataFrame =
    df.withColumn("_k", xxhash64(on))
      .withColumn("_rn", row_number().over(Window.partitionBy(col("_k")).orderBy(idCol)))
      .filter(col("_rn") === 1)
      .drop("_k", "_rn")

  /** 64-bit hashes of the distinct shingles — computed ONCE per document.
    * Tokens are hashed individually and n-gram hashes combine the token
    * hashes (no n-gram string materialization), so the per-doc cost is
    * one string hash per token + one long-combine per shingle. */
  def shingleHashes(text: Column, shingleN: Int = 3): Column = {
    val th = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val windowed = transform(
      sequence(lit(0), greatest(size(th) - shingleN, lit(0))),
      i => xxhash64((0 until shingleN).map(k => element_at(th, i + k + 1)): _*))
    array_distinct(
      when(size(th) < shingleN, array(xxhash64((0 until shingleN).map(k =>
        coalesce(try_element_at(th, lit(k + 1)), lit(0L))): _*)))
        .otherwise(windowed))
  }

  /** MinHash signature over pre-hashed shingles: sig[j] = min over shingles
    * of hash_j, with hash_j(h) = xxhash64(h, j). Pure column expressions →
    * whole-stage codegen. */
  def minhashSigFromHashes(shHashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(shHashes, h => xxhash64(h, lit(j))))
    }: _*)

  def minhashSignature(text: Column, shingleN: Int = 3, numHashes: Int = 32): Column =
    minhashSigFromHashes(shingleHashes(text, shingleN), numHashes)

  /**
   * MinHash-LSH near-duplicate candidate pairs: band the signature
   * (bands × rowsPerBand = numHashes), bucket-join on (band, bandHash),
   * emit candidate pairs per bucket, then verify with EXACT shingle-set
   * Jaccard ≥ `threshold`.
   *
   * Returns (id_a, id_b, jaccard) with id_a < id_b.
   */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // shingle hashing happens once; the banded relation is persisted because
    // the self-join would otherwise recompute signatures for both sides (and
    // once per band) — the standard LSH-join materialization point
    val withSh = df.select(col(idCol).as("id"),
        shingleHashes(col(textCol), shingleN).as("_sh"))
      .withColumn("_sig", minhashSigFromHashes(col("_sh"), numHashes))
    val banded = withSh.select(col("id"), col("_sh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          aggregate(slice(col("_sig"), b * r + 1, r), lit(17L),
            (acc, x) => xxhash64(acc, x)).as("bh"))
      }: _*)).as("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.alias("a")
    val b = banded.alias("b")
    val pairs = a.join(b,
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a._sh").as("sh_a"), col("b._sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b") // same pair may collide in several bands
    pairs
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit weighted vote of token
    * hashes. Near-dups have small Hamming distance. */
  def simhash64(text: Column): Column = {
    val t = TextAnalysis.tokens(text)
    val votes = aggregate(
      t,
      array_repeat(lit(0L), 64),
      (acc, tok) => {
        val h = xxhash64(tok)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, bit) => a + when(call_function("shiftright", h, bit.cast("int")).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, bit) => when(v > 0, call_function("shiftleft", lit(1L), bit.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: block on 4 × 16-bit chunks (any chunk equal →
    * candidate, catches all pairs with Hamming distance ≤ 3 by pigeonhole),
    * verify Hamming ≤ maxHamming. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val withH = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val blocked = withH.select(col("id"), col("sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"), shiftright(col("sh"), c * 16).bitwiseAND(0xffffL).as("ck"))
      }: _*)).as("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = blocked.alias("a"); val b = blocked.alias("b")
    a.join(b, col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** n-gram Jaccard similarity of two text columns (exact, for verification
    * or small candidate sets). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = array_distinct(TextAnalysis.shingles(a, n))
    val sb = array_distinct(TextAnalysis.shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") /
      greatest(size(array_union(sa, sb)), lit(1)).cast("double")
  }
}
