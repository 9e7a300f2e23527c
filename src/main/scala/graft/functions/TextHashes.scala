package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native single-pass implementations of the text-hashing hot path (shingle
 * hashes, MinHash signatures, SimHash) as codegen'd Catalyst expressions.
 *
 * The pure-column formulations (see git history of `textops/Dedup.scala`)
 * were built from `transform`/`aggregate` higher-order functions, which
 * Spark evaluates INTERPRETED (no doGenCode) with a boxed array allocation
 * per lambda application — measured at ~18 s for MinHash over a 10k-doc
 * corpus where this one-pass version runs in well under a second. This is
 * SURVEY.md §7.4's "promote to a codegen Expression only if hot", exercised.
 *
 * Semantics are bit-identical to the column versions they replace:
 * tokens = `split(lower(trim(text)), "\\s+")` (Spark split keeps leading
 * and trailing empty fields at limit -1), token hash = `xxhash64(tok)`
 * (seed 42), shingle hash = `xxhash64(h_1..h_n)` chain, per-function
 * MinHash hash = `xxhash64(shingleHash, j)`.
 */
object TextHash {

  private val SEED = 42L

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** xxhash64 of each whitespace token of lower(trim(text)), in order —
    * including the empty leading/trailing fields Spark's split emits. */
  def tokenHashes(text: UTF8String): Array[Long] = {
    val b = text.trim().toLowerCase().getBytes
    val n = b.length
    val out = new java.util.ArrayList[Long]()
    if (n == 0) return Array(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, 0, SEED))
    var i = 0
    if (isWs(b(0))) { // leading separator → leading empty field
      out.add(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, 0, SEED))
      while (i < n && isWs(b(i))) i += 1
      if (i == n) // all-whitespace: the run is ALSO trailing → second empty
        out.add(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, 0, SEED))
    }
    while (i < n) {
      val start = i
      while (i < n && !isWs(b(i))) i += 1
      out.add(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + start, i - start, SEED))
      if (i < n) {
        while (i < n && isWs(b(i))) i += 1
        if (i == n) // trailing separator → trailing empty field (limit -1)
          out.add(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, 0, SEED))
      }
    }
    val arr = new Array[Long](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    arr
  }

  /** Distinct n-gram shingle hashes in first-occurrence order. Shorter-than-n
    * documents yield one shingle of the tokens padded with 0L. */
  def shingleHashes(text: UTF8String, shingleN: Int): Array[Long] = {
    val th = tokenHashes(text)
    if (th.length < shingleN) {
      var acc = SEED
      var k = 0
      while (k < shingleN) {
        acc = XXH64.hashLong(if (k < th.length) th(k) else 0L, acc)
        k += 1
      }
      return Array(acc)
    }
    val nSh = th.length - shingleN + 1
    val out = new Array[Long](nSh)
    var count = 0
    // open-addressing set for first-occurrence dedup (values are already
    // uniform 64-bit hashes; 0 tracked separately as the empty sentinel)
    var cap = java.lang.Integer.highestOneBit(math.max(4, nSh * 2) - 1) << 1
    val table = new Array[Long](cap)
    var zeroSeen = false
    var i = 0
    while (i < nSh) {
      var acc = SEED
      var k = 0
      while (k < shingleN) { acc = XXH64.hashLong(th(i + k), acc); k += 1 }
      if (acc == 0L) {
        if (!zeroSeen) { zeroSeen = true; out(count) = 0L; count += 1 }
      } else {
        var slot = (acc ^ (acc >>> 32)).toInt & (cap - 1)
        while (table(slot) != 0L && table(slot) != acc) slot = (slot + 1) & (cap - 1)
        if (table(slot) == 0L) {
          table(slot) = acc
          out(count) = acc
          count += 1
        }
      }
      i += 1
    }
    if (count == nSh) out else java.util.Arrays.copyOf(out, count)
  }

  /** MinHash signature over shingle hashes: sig[j] = min_h xxhash64(h, j). */
  def minhashSig(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val base = XXH64.hashLong(shingles(i), SEED)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashInt(j, base)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** k-gram hashes in SEQUENCE ORDER with duplicates kept — the winnowing
    * input (fingerprinting needs positional windows; [[shingleHashes]]'s
    * first-occurrence dedup would break window alignment). Same chained
    * token-hash scheme, so a k-gram hashes identically in both. */
  def kgramHashes(text: UTF8String, k: Int): Array[Long] = {
    val th = tokenHashes(text)
    if (th.length < k) {
      var acc = SEED
      var j = 0
      while (j < k) {
        acc = XXH64.hashLong(if (j < th.length) th(j) else 0L, acc)
        j += 1
      }
      return Array(acc)
    }
    val nSh = th.length - k + 1
    val out = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      var acc = SEED
      var j = 0
      while (j < k) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  /**
   * Winnowing window-min selection (Schleimer et al., SIGMOD 2003): the min
   * of every sliding window of `w` consecutive hashes, deduped and sorted.
   * O(n) via a monotonic deque — the replaced column formulation
   * (`transform(sequence(...), i => array_min(slice(...)))`) was interpreted
   * AND O(n·w) with a sliced array allocation per window.
   */
  def winnowWindowMins(hs: Array[Long], w: Int): Array[Long] = {
    val n = hs.length
    if (n == 0) return Array.empty
    if (n <= w) { // single window over everything
      var m = hs(0)
      var i = 1
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      return Array(m)
    }
    val nWin = n - w + 1
    val mins = new Array[Long](nWin)
    val dq = new Array[Int](n) // indices, values increasing front→back
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = hs(dq(head))
      i += 1
    }
    java.util.Arrays.sort(mins)
    var c = 1
    var j = 1
    while (j < nWin) {
      if (mins(j) != mins(j - 1)) { mins(c) = mins(j); c += 1 }
      j += 1
    }
    if (c == nWin) mins else java.util.Arrays.copyOf(mins, c)
  }

  /** Fused winnowing fingerprint: k-gram hash chain → window mins. */
  def winnowFingerprint(text: UTF8String, k: Int, w: Int): Array[Long] =
    winnowWindowMins(kgramHashes(text, k), w)

  /** Token strings of lower(trim(text)) under Spark split semantics
    * (leading/trailing empty fields kept, limit -1). */
  def tokenStrings(text: UTF8String): Array[String] = {
    val s = text.trim().toLowerCase().toString
    s.split("\\s+", -1)
  }

  /** Ordered md5-derived 60-bit k-gram hashes: k-gram string = k tokens
    * joined by one space (the whole token list joined when shorter than k,
    * mirroring `TextAnalysis.shingles`), hash = first 15 hex chars of its
    * md5 parsed as int64 — a hash DuckDB computes identically, used by the
    * oracle-mirrorable contract queries. Codegen'd: the column formulation
    * (`transform` + `md5` + `conv` + `substring`) evaluates interpreted. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5KgramHashes(text: UTF8String, k: Int): Array[Long] = {
    val toks = tokenStrings(text)
    val md = md5Local.get()
    def h(s: String): Long = {
      md.reset()
      val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = 7 bytes + the high nibble of byte 7 (60 bits)
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      (v << 4) | ((b(7) >> 4) & 0xfL)
    }
    if (toks.length < k) return Array(h(toks.mkString(" ")))
    val n = toks.length - k + 1
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = h(sb.toString)
      i += 1
    }
    out
  }

  /** long[] from an ArrayData that may carry null elements DESPITE the
    * declared null-free input type (Spark's input-type check ignores
    * nullability — see VectorOps) — nulls are skipped as absent features;
    * raw toLongArray would NPE on GenericArrayData or copy garbage bits. */
  def longsSkippingNulls(a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
    val n = a.numElements()
    var nulls = 0
    var i = 0
    while (i < n) { if (a.isNullAt(i)) nulls += 1; i += 1 }
    if (nulls == 0) return a.toLongArray()
    val out = new Array[Long](n - nulls)
    var j = 0
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { out(j) = a.getLong(i); j += 1 }
      i += 1
    }
    out
  }

  /** long[] that REJECTS null elements: for kernels where element POSITION
    * is semantic (band boundaries over a MinHash signature) — silently
    * skipping a null would shift every later element into the wrong band
    * and corrupt results without any error. */
  def longsRejectingNulls(a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i),
        s"null element at position $i: positions are semantic here (band alignment) — " +
          "null signature elements cannot be skipped")
      i += 1
    }
    a.toLongArray()
  }

  /** per-bit majority vote over arbitrary 64-bit feature hashes — the
    * SimHash core, usable with any caller-chosen token hash. */
  def simhashVote(th: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var bit = 0
      while (bit < 64) {
        votes(bit) += (if (((h >>> bit) & 1L) == 1L) 1 else -1)
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** 64-bit SimHash: per-bit majority vote of the token hashes. */
  def simhash64(text: UTF8String): Long = simhashVote(tokenHashes(text))

  /** Marker-word language vote over token hashes (hash membership ≡ string
    * membership up to 64-bit collisions). Returns the argmax language —
    * ties break toward the lexicographically greatest language code,
    * matching the original `array_max(struct(votes, lang))` column
    * formulation — or "und" when no marker matched. */
  def langId(
      text: UTF8String,
      markerHashes: Array[Array[Long]],
      langs: Array[UTF8String],
      und: UTF8String): UTF8String = {
    val th = tokenHashes(text)
    var bestVotes = 0
    var best: UTF8String = null
    var l = 0
    while (l < markerHashes.length) {
      val ms = markerHashes(l)
      var votes = 0
      var i = 0
      while (i < th.length) {
        var m = 0
        while (m < ms.length) {
          if (ms(m) == th(i)) { votes += 1; m = ms.length }
          else m += 1
        }
        i += 1
      }
      if (votes > bestVotes ||
          (votes == bestVotes && best != null && langs(l).compareTo(best) > 0)) {
        bestVotes = votes
        best = langs(l)
      }
      l += 1
    }
    if (bestVotes > 0) best else und
  }

  /** LSH band hashes of a MinHash signature: out(b) = fold of
    * `xxhash64(acc, sig_i)` (acc0 = 17) over band b's rows — bit-identical
    * to the `aggregate(slice(sig, b*r+1, r), 17L, xxhash64)` column fold it
    * replaces (Spark's XxHash64 chains hashLong over its children starting
    * from seed 42), in one pass over the signature. */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    if (sig.length == 0) return Array.emptyLongArray
    // fail fast: truncated bands silently change near-dup recall, and
    // bands > |sig| would give every row the constant hash 17 — an LSH
    // self-join on that degenerates to an O(n^2) corpus cross product
    require(bands <= sig.length && sig.length % bands == 0,
      s"band_hashes: bands ($bands) must divide the signature length (${sig.length})")
    val r = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 17L
      var i = b * r
      val end = i + r
      while (i < end) { acc = XXH64.hashLong(sig(i), XXH64.hashLong(acc, SEED)); i += 1 }
      out(b) = acc
      b += 1
    }
    out
  }

  // ---- column builders -----------------------------------------------------

  def shingleHashes(text: Column, shingleN: Int): Column =
    Shims.column(ShingleHashesExpr(Shims.expression(text), shingleN))

  /** band hashes of a minhash_sig array (bands must divide its length) */
  def bandHashes(sig: Column, bands: Int): Column =
    Shims.column(BandHashesExpr(Shims.expression(sig), bands))

  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    Shims.column(MinHashSigExpr(Shims.expression(shingleHashes), numHashes))

  def simhash64(text: Column): Column =
    Shims.column(SimHash64Expr(Shims.expression(text)))

  /** SimHash vote over a caller-hashed array<long> of token features. */
  def simhashOfHashes(tokenHashes: Column): Column =
    Shims.column(SimHashOfHashesExpr(Shims.expression(tokenHashes)))

  /** ordered md5-derived k-gram hashes (oracle-mirrorable; see kernel). */
  def md5KgramHashes(text: Column, k: Int): Column =
    Shims.column(Md5KgramHashesExpr(Shims.expression(text), k))

  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    Shims.column(LangIdExpr(Shims.expression(text), markers))

  /** window-min winnowing selection over an arbitrary array<long> of
    * ordered hashes (caller picks the hash; used by the contract query
    * with a DuckDB-mirrorable md5-derived hash). */
  def winnowMins(hashes: Column, w: Int): Column =
    Shims.column(WinnowMinsExpr(Shims.expression(hashes), w))

  /** fused text → winnowing fingerprint (engine hot path). */
  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    Shims.column(WinnowFingerprintExpr(Shims.expression(text), k, w))
}

/** `shingle_hashes(text)` → array<long>: distinct token-n-gram hashes. */
case class ShingleHashesExpr(child: Expression, shingleN: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.shingleHashes(input.asInstanceOf[UTF8String], shingleN))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.TextHash.shingleHashes($c, $shingleN))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(array<long>)` → array<long>(numHashes). Input must be a
  * null-free array of shingle hashes (the output of [[ShingleHashesExpr]]). */
case class MinHashSigExpr(child: Expression, numHashes: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.minhashSig(TextHash.longsSkippingNulls(input.asInstanceOf[ArrayData]), numHashes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.TextHash.minhashSig(graft.functions.TextHash.longsSkippingNulls($c), $numHashes))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `lang_id(text)` → string: marker-word language vote (argmax, "und" when
  * no marker hits). `markers` = (langCode, marker words) pairs. */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)

  @transient private lazy val markerHashes: Array[Array[Long]] =
    markers.map { case (_, ws) =>
      ws.map(w => TextHash.tokenHashes(UTF8String.fromString(w)).head).toArray
    }.toArray
  @transient private lazy val langs: Array[UTF8String] =
    markers.map { case (l, _) => UTF8String.fromString(l) }.toArray
  @transient private lazy val und: UTF8String = UTF8String.fromString("und")

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.langId(input.asInstanceOf[UTF8String], markerHashes, langs, und)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mh = ctx.addReferenceObj("langMarkerHashes", markerHashes, "long[][]")
    val ls = ctx.addReferenceObj("langCodes", langs,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val u = ctx.addReferenceObj("langUnd", und,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.langId($c, $mh, $ls, $u)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `band_hashes(sig, bands)` → array<long> of per-band LSH bucket hashes —
  * the banding step of MinHash-LSH as one codegen'd pass (the previous
  * per-band `aggregate(slice(...))` fold evaluated interpreted, sitting in
  * the corpus-dedup hot path). `bands` must divide the signature length. */
case class BandHashesExpr(child: Expression, bands: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(bands >= 1, "bands must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"
  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.bandHashes(TextHash.longsRejectingNulls(input.asInstanceOf[ArrayData]), bands))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.TextHash.bandHashes(graft.functions.TextHash.longsRejectingNulls($c), $bands))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_mins(array<long>)` → array<long>: sorted distinct sliding-window
  * minima (window `w`) — the winnowing selection step over caller-hashed
  * k-grams. Input must be a null-free array. */
case class WinnowMinsExpr(child: Expression, w: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 1, "window must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"
  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.winnowWindowMins(TextHash.longsSkippingNulls(input.asInstanceOf[ArrayData]), w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.TextHash.winnowWindowMins(graft.functions.TextHash.longsSkippingNulls($c), $w))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_fingerprint(text)` → array<long>: the full winnowing document
  * fingerprint (k-gram chained-xxhash64 → window-min of `w` → distinct,
  * sorted) in ONE codegen'd pass — the 100 TB text-fingerprint hot path. */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && w >= 1)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.winnowFingerprint(input.asInstanceOf[UTF8String], k, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.TextHash.winnowFingerprint($c, $k, $w))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_kgram_hashes(text)` → array<long>: ordered md5-derived 60-bit
  * k-gram hashes, identical to what DuckDB list ops compute — the
  * engine-side half of the oracle-mirrorable SimHash/winnowing queries. */
case class Md5KgramHashesExpr(child: Expression, k: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_kgram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextHash.md5KgramHashes(input.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.TextHash.md5KgramHashes($c, $k))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash_of_hashes(array<long>)` → long: the SimHash per-bit majority
  * vote over caller-hashed token features (null-free array). */
case class SimHashOfHashesExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_of_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhashVote(TextHash.longsSkippingNulls(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash.simhashVote(graft.functions.TextHash.longsSkippingNulls($c))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(text)` → long. */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
