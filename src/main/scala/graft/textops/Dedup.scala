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

  /** 64-bit hashes of the distinct shingles — computed ONCE per document by
    * the codegen'd [[graft.functions.ShingleHashesExpr]] (tokens hashed
    * individually, n-gram hashes combine token hashes; no n-gram string
    * materialization). Originally a `transform`/`aggregate` column
    * composition — higher-order functions evaluate interpreted, which made
    * this the corpus-dedup bottleneck (see TextHashes.scala scaladoc). */
  def shingleHashes(text: Column, shingleN: Int = 3): Column =
    graft.functions.TextHash.shingleHashes(text, shingleN)

  /** MinHash signature over pre-hashed shingles: sig[j] = min over shingles
    * of xxhash64(h, j) — one codegen'd pass ([[graft.functions.MinHashSigExpr]]). */
  def minhashSigFromHashes(shHashes: Column, numHashes: Int): Column =
    graft.functions.TextHash.minhashSig(shHashes, numHashes)

  def minhashSignature(text: Column, shingleN: Int = 3, numHashes: Int = 32): Column =
    minhashSigFromHashes(shingleHashes(text, shingleN), numHashes)

  /**
   * MinHash-LSH near-duplicate candidate pairs: band the signature
   * (bands × rowsPerBand = numHashes), bucket-join on (band, bandHash),
   * emit candidate pairs per bucket, then verify with EXACT shingle-set
   * Jaccard ≥ `threshold`.
   *
   * Returns (id_a, id_b, jaccard) with id_a < id_b. The result is
   * MATERIALIZED (localCheckpoint) before returning so the engine can
   * release its internal signature cache — otherwise every invocation
   * would leak one persisted relation for the session's lifetime.
   */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(bands >= 1 && bands <= numHashes,
      s"minhashNearDups: bands=$bands must be in [1, numHashes=$numHashes]")
    // a non-divisible (numHashes, bands) pair truncates the tail hashes —
    // bands × (numHashes/bands) are used — matching the pre-kernel
    // aggregate(slice) fold's behavior instead of throwing mid-job (the
    // codegen'd band kernel itself requires exact divisibility)
    val effHashes = (numHashes / bands) * bands
    // threshold 1.0 keeps only identical shingle sets, whose signatures are
    // identical in EVERY band — one full-signature band has the same exact
    // recall while cutting candidate duplication (and band-join shuffle
    // volume) by the band count
    val effBands = if (threshold >= 1.0) 1 else bands
    // Shingle hashing + signatures happen ONCE, persisted one-row-per-doc.
    // The banded self-join then carries only (id, band-key) — exploding the
    // per-doc shingle arrays ×bands through the join exchange would amplify
    // shuffle bytes by the band count (measured ~3× wall-clock on this op);
    // the heavy arrays are joined back only for surviving candidate pairs.
    val base = df.select(col(idCol).as("id"),
        shingleHashes(col(textCol), shingleN).as("_sh"))
      .withColumn("_sig", minhashSigFromHashes(col("_sh"), effHashes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // band hashes via the codegen'd kernel (the aggregate(slice(...)) fold
    // this replaces evaluated interpreted — the repo's own higher-order-
    // function trap, see CLAUDE.md — and is asserted bit-identical to it in
    // TextVectorKernelsSpec)
    val banded = base.select(col("id"),
        posexplode(graft.functions.TextHash.bandHashes(col("_sig"), effBands)).as(Seq("band", "bh")))
      .select(col("id"), struct(col("band"), col("bh")).as("bk"))
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b") // same pair may collide in several bands
    val out = cand
      .join(base.select(col("id").as("id_a"), col("_sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("_sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .localCheckpoint(true) // pin pairs (small), then release the cache
    base.unpersist()
    out
  }

  /** 64-bit SimHash over whitespace tokens: per-bit weighted vote of token
    * hashes ([[graft.functions.SimHash64Expr]], codegen'd — the previous
    * `aggregate`+`zip_with` formulation allocated a 64-element array per
    * token, interpreted). Near-dups have small Hamming distance. */
  def simhash64(text: Column): Column = graft.functions.TextHash.simhash64(text)

  /** SimHash vote over caller-hashed token features — plug a custom token
    * hash while keeping the codegen'd vote kernel. */
  def simhashOfHashes(tokenHashes: Column): Column =
    graft.functions.TextHash.simhashOfHashes(tokenHashes)

  /** SimHash near-dup pairs: block on 4 × 16-bit chunks (any chunk equal →
    * candidate, catches all pairs with Hamming distance ≤ 3 by pigeonhole),
    * verify Hamming ≤ maxHamming. `simhashCol` swaps the sketch (default:
    * the fused codegen'd [[simhash64]] over xxhash64 token hashes). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
      simhashCol: Column => Column = simhash64): DataFrame = {
    val withH = df.select(col(idCol).as("id"), simhashCol(col(textCol)).as("sh"))
    val blocked = withH.select(col("id"), col("sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"), shiftright(col("sh"), c * 16).bitwiseAND(0xffffL).as("ck"))
      }: _*)).as("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = blocked.alias("a"); val b = blocked.alias("b")
    val out = a.join(b, col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .localCheckpoint(true) // pin pairs, release the blocked-relation cache
    blocked.unpersist()
    out
  }

  /** n-gram Jaccard similarity of two text columns (exact, for verification
    * or small candidate sets). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = array_distinct(TextAnalysis.shingles(a, n))
    val sb = array_distinct(TextAnalysis.shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") /
      greatest(size(array_union(sa, sb)), lit(1)).cast("double")
  }

  /**
   * Connected components of a near-duplicate pair graph by min-label
   * propagation with pointer doubling: each round every vertex takes the
   * min label over itself and its neighbors, then shortcuts to its label's
   * label — reach doubles per round, so convergence is O(log diameter)
   * (a 10^6-long chain needs ~20 rounds, clone clusters 2–3). Each round
   * is two equi-joins + one aggregate (no driver-side graph), and each
   * round's labels are locally checkpointed, keeping the logical plan flat
   * at 10^12-vertex scale.
   *
   * Returns (id, component) with component = min id of the cluster — the
   * result is persisted; unpersist it when done (dropNearDuplicates does).
   * Throws if propagation has not converged after `maxIter` rounds.
   */
  def connectedComponents(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // symmetric edge list (propagation must flow both ways)
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .persist(lvl)
    // localCheckpoint per round, NOT persist: caching keeps the LOGICAL plan
    // growing one join deeper per round — by ~20 rounds plan
    // compilation itself OOMs. Checkpointing pins the rows AND truncates
    // lineage, so plan depth stays constant however long the chain.
    // Seed labels with min(self, direct neighbors) — ONE aggregate over the
    // edge list instead of the identity labeling (edges are symmetric, so
    // every vertex appears as src). Labels only ever decrease toward the
    // component min, so a smaller in-component start preserves the fixpoint
    // while removing one full propagation round: the dominant near-dup
    // graph shape (clone clusters of diameter 1-2) now converges in ONE
    // round instead of two — each round is 2 joins + an eager checkpoint +
    // a checksum job, the whole cost of this loop at small diameters.
    var labels = edges.groupBy("src").agg(min("dst").as("_nbr"))
      .select(col("src").as("id"), least(col("src"), col("_nbr")).as("component"))
      .localCheckpoint(true)
    // convergence by label-set checksum: labels only ever DECREASE, so the
    // multiset of (id, component) is unchanged iff the xor-of-hashes is —
    // ONE aggregate over the already-materialized rows per round, replacing
    // the previous change-count JOIN (an extra join + job per round)
    def chk(df: DataFrame): Long = df
      .agg(coalesce(bit_xor(xxhash64(col("id"), col("component"))), lit(0L)).as("c"))
      .head().getLong(0)
    var prevChk = chk(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      // candidate label per vertex = min over neighbors' labels
      val viaNeighbors = edges
        .join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min("component").as("nbr"))
      val propagated = labels.join(viaNeighbors, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr"), col("component"))).as("component"))
      // pointer doubling: follow component → that vertex's component, so
      // label reach doubles per round instead of advancing one hop
      val mapping = propagated.select(col("id").as("cid"), col("component").as("ccomp"))
      val next = propagated.alias("l")
        .join(mapping.alias("m"), col("l.component") === col("m.cid"), "left")
        .select(col("l.id").as("id"),
          least(col("l.component"), coalesce(col("ccomp"), col("l.component"))).as("component"))
        .localCheckpoint(true)
      val nextChk = chk(next)
      labels.unpersist()
      labels = next
      converged = nextChk == prevChk
      prevChk = nextChk
    }
    edges.unpersist()
    // no silent caps: truncated propagation would return WRONG components
    // (dropNearDuplicates would keep extra duplicates with no signal)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — a duplicate " +
          s"cluster has diameter > $maxIter; raise maxIter")
    labels
  }

  /**
   * End-to-end near-duplicate REMOVAL: candidate pairs → connected
   * components → keep the min-id survivor of each cluster (plus every
   * unpaired document). The missing half of "find near-dup pairs" that a
   * training-data pipeline actually runs.
   */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    // pin the loser set (localCheckpoint truncates the iterative lineage so
    // downstream actions don't replay the propagation loop), then release
    // the loop's cached labels — otherwise every invocation leaks one
    // persisted relation for the session's lifetime
    val losers = comp.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
      .localCheckpoint(true)
    comp.unpersist()
    df.join(losers, Seq(idCol), "left_anti")
  }
}
