package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/**
 * The native text/vector kernels must (a) stay inside whole-stage codegen
 * (their whole reason to exist — the column formulations they replaced were
 * interpreted), and (b) agree between codegen'd and interpreted eval paths,
 * and with independently-computed reference values.
 */
class TextVectorKernelsSpec extends SparkSuite {

  import spark.implicits._

  private def wholeStageProject(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString()
    // "*(n)" prefixes mark whole-stage-codegen'd operators in the plan string
    assert(plan.contains("*(1) Project"), s"kernel must not break codegen:\n$plan")
  }

  test("kernels stay inside whole-stage codegen") {
    // spark.range leaf: a local Seq would be constant-folded to
    // LocalTableScan by ConvertToLocalRelation before codegen is planned
    val df = spark.range(4)
      .select(concat(lit("the quick brown fox jumps over dog "), col("id")).as("text"))
    wholeStageProject(df.select(TextHash.shingleHashes(col("text"), 3).as("sh")))
    wholeStageProject(df.select(TextHash.simhash64(col("text")).as("s")))
    wholeStageProject(df.select(
      TextHash.langId(col("text"), graft.textops.TextAnalysis.langMarkers.toSeq.sortBy(_._1))))
    val vdf = spark.range(4)
      .select(array(col("id") * 0.5, col("id") * -0.25, lit(1.0)).as("v"))
    wholeStageProject(vdf.select(VectorOps.hyperplaneSig(col("v"), 16, 42L, 512).as("h")))
    wholeStageProject(vdf.select(VectorOps.cosine(col("v"), col("v")).as("c")))
  }

  test("band hashes: codegen'd kernel is bit-identical to the aggregate(slice) fold") {
    val bands = 4; val numHashes = 32
    val df = spark.range(64)
      .select(concat(lit("some web page text body number "), col("id")).as("text"))
      .select(TextHash.minhashSig(TextHash.shingleHashes(col("text"), 3), numHashes).as("sig"))
    val r = numHashes / bands
    val viaFold = df.select(array((0 until bands).map { b =>
      aggregate(slice(col("sig"), b * r + 1, r), lit(17L), (acc, x) => xxhash64(acc, x))
    }: _*).as("bh")).collect().map(_.getSeq[Long](0))
    val viaKernel = df.select(TextHash.bandHashes(col("sig"), bands).as("bh"))
      .collect().map(_.getSeq[Long](0))
    assert(viaFold.toSeq.map(_.toVector) === viaKernel.toSeq.map(_.toVector))
    // and it stays inside whole-stage codegen (the fold could not)
    wholeStageProject(spark.range(4)
      .select(array(col("id"), col("id") * 3, col("id") + 7, col("id") - 1).as("sig"))
      .select(TextHash.bandHashes(col("sig"), 2).as("bh")))
  }

  test("winnowing kernels stay inside whole-stage codegen") {
    val df = spark.range(4)
      .select(concat(lit("the quick brown fox jumps over dog "), col("id")).as("text"))
    wholeStageProject(df.select(TextHash.winnowFingerprint(col("text"), 3, 4).as("fp")))
    val hdf = spark.range(4).select(array(col("id"), col("id") * 7, col("id") - 3).as("hs"))
    wholeStageProject(hdf.select(TextHash.winnowMins(col("hs"), 2).as("m")))
  }

  test("winnow window-mins match the O(n·w) slice-min reference") {
    // reference = the replaced column formulation: min of each sliding
    // window of w (single window over everything when n <= w), distinct,
    // sorted — checked over seeded random arrays incl. duplicates and ties
    def reference(hs: Array[Long], w: Int): Seq[Long] = {
      if (hs.isEmpty) Seq.empty
      else (0 to math.max(hs.length - w, 0))
        .map(i => hs.slice(i, i + w).min).distinct.sorted
    }
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 2, 3, 4, 5, 17, 256); w <- Seq(1, 2, 4, 9)) {
      val hs = Array.fill(n)(rnd.nextLong(20) - 10) // small domain → many ties
      assert(TextHash.winnowWindowMins(hs, w).toSeq === reference(hs, w), s"n=$n w=$w")
      val hs2 = Array.fill(n)(rnd.nextLong())
      assert(TextHash.winnowWindowMins(hs2, w).toSeq === reference(hs2, w), s"rand n=$n w=$w")
    }
  }

  test("winnowing fingerprint: fused expr == kernel == column-path mins") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b", "", "one two three four five six seven")
    val df = texts.toDF("text")
    val fused = df.select(TextHash.winnowFingerprint(col("text"), 3, 4)).collect()
    fused.zip(texts).foreach { case (r, t) =>
      val expected = TextHash.winnowWindowMins(
        TextHash.kgramHashes(UTF8String.fromString(t), 3), 4).toSeq
      assert(r.getSeq[Long](0) === expected, s"for '$t'")
    }
    // the selection step agrees when fed arbitrary hashes as a column
    val viaMins = spark.range(1)
      .select(TextHash.winnowMins(typedLit(Seq(9L, 2L, 7L, 7L, 1L, 8L)), 4))
      .head().getSeq[Long](0)
    assert(viaMins === TextHash.winnowWindowMins(Array(9L, 2L, 7L, 7L, 1L, 8L), 4).toSeq)
  }

  test("md5 k-gram kernel matches the column formulation and stays codegen'd") {
    val texts = Seq(
      "the quick brown fox jumps over the dog", "a b", "", "one",
      "  padded   out ", "ÜPPER Case Mixed tokens here")
    val df = texts.toDF("text")
    for (k <- Seq(1, 3)) {
      val shingles =
        when(size(split(lower(trim(col("text"))), "\\s+")) < k,
          array(concat_ws(" ", split(lower(trim(col("text"))), "\\s+"))))
        .otherwise(transform(
          sequence(lit(0), size(split(lower(trim(col("text"))), "\\s+")) - k),
          i => concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"), i + 1, lit(k)))))
      val columnar = df.select(transform(shingles,
        sh => conv(substring(md5(sh), 1, 15), 16, 10).cast("long")).as("h")).collect()
      val native = df.select(TextHash.md5KgramHashes(col("text"), k).as("h")).collect()
      native.zip(columnar).zip(texts).foreach { case ((n, c), t) =>
        assert(n.getSeq[Long](0) === c.getSeq[Long](0), s"k=$k text='$t'")
      }
    }
    wholeStageProject(spark.range(4)
      .select(concat(lit("some text and "), col("id")).as("text"))
      .select(TextHash.md5KgramHashes(col("text"), 3).as("h")))
  }

  test("simhash over column-hashed tokens equals the fused text kernel") {
    val texts = Seq("the quick brown fox", "a b c", "", " spaced  out ")
    val df = texts.toDF("text")
    val fused = df.select(TextHash.simhash64(col("text"))).collect().map(_.getLong(0))
    val viaHashes = df.select(TextHash.simhashOfHashes(
        transform(split(lower(trim(col("text"))), "\\s+"), t => xxhash64(t))))
      .collect().map(_.getLong(0))
    assert(fused.toSeq === viaHashes.toSeq)
  }

  test("token/shingle hashes match the equivalent column expressions") {
    val texts = Seq(
      "the quick brown fox", "  padded  with   spaces ", "", "one",
      "a b", "tab\tand\nnewline separated tokens here", "ÜPPER Case Mixed")
    val df = texts.toDF("text")
    val native = df.select(TextHash.shingleHashes(col("text"), 3).as("x")).collect()
    val columnar = df.select(array_distinct(when(
        size(split(lower(trim(col("text"))), "\\s+")) < 3,
        array(xxhash64((0 until 3).map(k => coalesce(
          try_element_at(transform(split(lower(trim(col("text"))), "\\s+"), t => xxhash64(t)), lit(k + 1)),
          lit(0L))): _*)))
      .otherwise(transform(
        sequence(lit(0), greatest(size(split(lower(trim(col("text"))), "\\s+")) - 3, lit(0))),
        i => xxhash64((0 until 3).map(k => element_at(
          transform(split(lower(trim(col("text"))), "\\s+"), t => xxhash64(t)), i + k + 1)): _*)))).as("x"))
      .collect()
    native.zip(columnar).zip(texts).foreach { case ((n, c), t) =>
      assert(n.getSeq[Long](0) === c.getSeq[Long](0), s"shingle mismatch for '$t'")
    }
  }

  test("interpreted eval agrees with codegen (spot values)") {
    // driver-side (interpreted static impl) vs executed (codegen) results
    val text = "der schnelle braune fuchs und der faule hund und der rest"
    val sh = TextHash.shingleHashes(UTF8String.fromString(text), 3)
    val fromSpark = Seq(text).toDF("text")
      .select(TextHash.shingleHashes(col("text"), 3)).head().getSeq[Long](0)
    assert(fromSpark === sh.toSeq)
    val sig = TextHash.minhashSig(sh, 16)
    val sigSpark = Seq(text).toDF("text")
      .select(TextHash.minhashSig(TextHash.shingleHashes(col("text"), 3), 16))
      .head().getSeq[Long](0)
    assert(sigSpark === sig.toSeq)
    assert(Seq(text).toDF("text").select(TextHash.simhash64(col("text"))).head().getLong(0)
      === TextHash.simhash64(UTF8String.fromString(text)))
  }

  test("whitespace-only text keeps Spark split semantics (two empty fields)") {
    // "\t".split("\\s+", -1) == ["", ""] — trim only strips 0x20, so the
    // tab survives and the run is both leading AND trailing separator
    assert(TextHash.tokenHashes(UTF8String.fromString("\t")).length === 2)
    assert(TextHash.tokenHashes(UTF8String.fromString("")).length === 1)
    assert(!java.util.Arrays.equals(
      TextHash.shingleHashes(UTF8String.fromString("\t"), 3),
      TextHash.shingleHashes(UTF8String.fromString(""), 3)),
      "'\\t' and '' must not collide as near-duplicates")
    // and both agree with the live column path
    val fromSpark = Seq("\t", "", " x\ny ").toDF("text")
      .select(size(split(lower(trim(col("text"))), "\\s+"))).collect().map(_.getInt(0))
    val native = Seq("\t", "", " x\ny ")
      .map(s => TextHash.tokenHashes(UTF8String.fromString(s)).length)
    assert(fromSpark.toSeq === native)
  }

  test("mis-typed inputs are rejected at analysis, never misread") {
    // BEFORE inputTypes were declared, an array<float> was accepted and
    // ArrayData.getDouble read 8 bytes per 4-byte element — silent garbage.
    // ANSI coercion won't widen array element types implicitly, so the
    // contract is a clean analysis error instead.
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(VectorOps.cosine(
        array(lit(1.0f), lit(2.0f)).cast("array<float>"),
        array(lit(1.0d), lit(2.0d)))).collect()
    }
    assert(ex.getMessage.contains("ARRAY<DOUBLE>"), ex.getMessage)
    // explicit cast keeps working
    val c = spark.range(1)
      .select(VectorOps.cosine(
        array(lit(1.0f), lit(2.0f)).cast("array<double>"),
        array(lit(1.0d), lit(2.0d))))
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-9)
  }

  test("null array elements are skipped, never NPE or garbage") {
    // Spark's input-type check ignores nullability, so arrays WITH null
    // elements reach the kernels through the SQL-registered functions;
    // before the guard this NPE'd on GenericArrayData
    val df = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS a, array(1.0D, 2.0D, 3.0D) AS b")
    val c = df.select(VectorOps.cosine(col("a"), col("b"))).head().getDouble(0)
    // null element skipped: cosine over dims {0, 2} only
    val expected = (1.0 * 1.0 + 3.0 * 3.0) /
      (math.sqrt(1.0 + 9.0) * math.sqrt(1.0 + 9.0))
    assert(math.abs(c - expected) < 1e-12)
    val sig = df.select(VectorOps.hyperplaneSig(col("a"), 16, 42L, 512)).head().getLong(0)
    val sigNoNull = spark.sql("SELECT array(1.0D, 0.0D, 3.0D) AS a")
      .select(VectorOps.hyperplaneSig(col("a"), 16, 42L, 512)).head().getLong(0)
    assert(sig === sigNoNull, "null element must contribute 0 to the signature")
  }

  test("long-array kernels skip null elements instead of NPE") {
    // (SQL functions registered via the suite session's GraftExtensions)
    // null elements reach the kernels through SQL despite the null-free
    // declared input type (type check ignores nullability)
    val withNull = spark.sql(
      "SELECT simhash_of_hashes(array(xxhash64('a'), CAST(NULL AS BIGINT), xxhash64('b'))) AS s, " +
        "winnow_mins(array(5L, CAST(NULL AS BIGINT), 3L, 9L), 2) AS w, " +
        "minhash_sig(array(xxhash64('a'), CAST(NULL AS BIGINT)), 4) AS m").head()
    val noNull = spark.sql(
      "SELECT simhash_of_hashes(array(xxhash64('a'), xxhash64('b'))) AS s, " +
        "winnow_mins(array(5L, 3L, 9L), 2) AS w, " +
        "minhash_sig(array(xxhash64('a')), 4) AS m").head()
    assert(withNull.getLong(0) === noNull.getLong(0), "null feature skipped in simhash")
    assert(withNull.getSeq[Long](1) === noNull.getSeq[Long](1), "null hash skipped in winnowing")
    assert(withNull.getSeq[Long](2) === noNull.getSeq[Long](2), "null shingle skipped in minhash")
  }

  test("lang_id votes match marker counting, ties break to greatest code") {
    val rows = Seq(
      "the cat and the hat of doom" -> "en",
      "der hund und die katze ist da" -> "de",
      "el gato por la casa es grande una vez" -> "es",
      "xyzzy plugh" -> "und",
      // tie: one en marker ("the"), one fr marker ("le") → max lang code wins
      "the le" -> "fr")
    val got = rows.map(_._1).toDF("text")
      .select(graft.textops.TextAnalysis.langIdHeuristic(col("text")))
      .collect().map(_.getString(0))
    assert(got.toSeq === rows.map(_._2))
  }

  test("cosine kernel matches plain arithmetic") {
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(-1.0, 0.5, 2.0)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.max(math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum), 1e-12)
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("argmax-dot kernel matches the aggregate(transform) fold and stays codegen'd") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val cents = Seq.fill(8)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val df = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(dim)(d => math.sin(i * 5 + d * 3) + math.cos(i + d)))
    }.toDF("id", "v")
    // the replaced higher-order formulation (negdot fold, earliest-wins ties)
    val centsLit = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), typedLit(c).as("cv"))
    }: _*)
    def dotHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val viaFold = df.select(col("id"),
      aggregate(
        transform(centsLit, c => struct(
          (lit(-1.0) * dotHof(col("v"), c.getField("cv"))).as("negdot"),
          c.getField("cid").as("cid"))),
        struct(lit(Double.MaxValue).as("negdot"), lit(-1).as("cid")),
        (best, cand) => when(cand.getField("negdot") < best.getField("negdot"), cand).otherwise(best))
        .getField("cid").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaKernel = df.select(col("id"), VectorOps.argMaxDot(col("v"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaFold === viaKernel, "cell assignment must be bit-identical to the fold")
    assert(viaKernel.values.toSet.size > 2, "assignments should spread across cells")
    // and the kernel stays inside whole-stage codegen (the fold could not)
    wholeStageProject(spark.range(4)
      .select(array(col("id") * 0.5, col("id") * -1.0, lit(0.25)).as("v"))
      .select(VectorOps.argMaxDot(col("v"), Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 2.0))).as("c")))
  }

  test("hyperplane signature is deterministic and splits space") {
    val vs = (0 until 32).map(i => (i.toLong, Seq.tabulate(8)(d => math.sin(i * 3 + d).toDouble)))
    val df = vs.toDF("id", "v")
    val sigs = df.select(col("id"), VectorOps.hyperplaneSig(col("v"), 32, 42L, 512).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = df.select(col("id"), VectorOps.hyperplaneSig(col("v"), 32, 42L, 512).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs === again)
    assert(sigs.values.toSet.size > 8, "signatures should spread across buckets")
    // identical vectors → identical signatures (the LSH contract)
    assert(sigs(0L) === again(0L))
  }
}
