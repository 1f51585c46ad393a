package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshims
import org.apache.spark.sql.types._

/**
 * Hash family for the MinHash/SimHash kernels. `Xxh64` (Spark's own XXH64,
 * public xxHash64 algorithm) is the production default — best mixing, zero
 * collisions in practice. `Poly` is a polynomial rolling hash mod 1e9+7
 * whose arithmetic a SQL engine can replay (list_reduce over characters),
 * so Poly-hashed MinHash/SimHash results are oracle-checkable end to end;
 * its mixing is weaker, which only costs a little LSH precision (more
 * false candidates), never recall past the verify step.
 */
sealed trait HashFamily
object HashFamily {
  case object Xxh64 extends HashFamily
  case object Poly extends HashFamily
}

/**
 * Kernels for the LLM-pipeline text operators: MinHash signatures and
 * SimHash fingerprints over token arrays. Default hashing is Spark's own
 * XXH64 (public xxHash64 algorithm) with per-permutation seeds, evaluated
 * directly over UTF8String bytes — no boxing, no per-row string copies.
 * The Poly family mirrors the same shapes with SQL-replayable arithmetic.
 */
object TextKernels {

  /** Modulus of the Poly family (1e9+7, same as [[text.fingerprint]]). */
  val PolyP = 1000000007L

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Space-joined word n-grams over a token array: out(i) = tokens[i..i+n)
    * joined by ' '; fewer than n tokens -> empty array. A tight loop over
    * UTF8Strings — the composed-builtin version (transform + slice +
    * concat_ws) runs Catalyst higher-order functions, which are
    * INTERPRETED per element (no doGenCode on HigherOrderFunction), and
    * shingling is the hottest per-token loop in the dedup family. */
  def wordNgrams(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt - n + 1)
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Polynomial rolling hash of a UTF8 string's bytes mod 1e9+7. Tokens
    * here are ASCII ([a-z0-9 ]), so byte-wise == character-wise and the
    * oracle's per-character `ascii()` fold reproduces it exactly. */
  def polyBase(s: org.apache.spark.unsafe.types.UTF8String, mult: Long): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * mult + (s.getByte(i) & 0xffL)) % PolyP
      i += 1
    }
    acc
  }

  /**
   * Poly-family MinHash: out(h) = min over tokens of the affine transform
   * ((seed + 2h + 1) * base + 31*seed + 7919*h) mod 1e9+7, base = the
   * 31-multiplier rolling hash. Closed-form coefficients so the oracle can
   * replay them without an RNG. Empty token set -> Long.MaxValue entries.
   */
  def minhashPoly(tokens: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val base = polyBase(tokens.getUTF8String(t), 31)
      var h = 0
      while (h < numHashes) {
        val v = ((seed + 2L * h + 1L) * base + 31L * seed + 7919L * h) % PolyP
        if (v < out(h)) out(h) = v
        h += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Polynomial rolling-hash document fingerprint over CODE POINTS mod
    * 1e9+7 — the exact fold of [[text.fingerprint]]'s former
    * higher-order-function composition (split('') → ascii → aggregate):
    * Spark's empty-regex split emits one element per code point (Java 8+
    * semantics, surrogate pairs intact) and `ascii()` returns
    * `toString.codePointAt(0)`, so a code-point walk reproduces the fold
    * bit-for-bit on ANY input, ASCII or not (parity pinned by
    * TextExpressionsSpec). The HOF version allocated one UTF8String per
    * CHARACTER and evaluated the lambda interpreted per element — and,
    * being CodegenFallback, knocked every projection containing it out
    * of whole-stage codegen, disabling subexpression elimination for the
    * surrounding tokenize passes (r20, optimization guide §4). */
  def polyFingerprint(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % PolyP
      i += Character.charCount(cp)
    }
    acc
  }

  /** Poly-family 61-bit token hash: two independent rolling hashes (mults
    * 31 and 37, seed folded additively) packed as hi<<31 | lo. Bits 61..63
    * are structurally zero — the SimHash sign votes there are always
    * negative, deterministically, in both engines. */
  def polyToken64(s: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long = {
    val hi = (polyBase(s, 31) + seed) % PolyP
    val lo = (polyBase(s, 37) + seed) % PolyP
    (hi << 31) + lo
  }

  /** Poly-family SimHash over [[polyToken64]] votes. */
  def simhashPoly(tokens: ArrayData, seed: Long): Long = {
    val w = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val h = polyToken64(tokens.getUTF8String(t), seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) w(b) += 1 else w(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (w(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /**
   * MinHash signature: out(h) = min over tokens of xxh64(token, seed+h).
   * An empty token set yields Long.MaxValue entries (deterministic).
   */
  def minhash(tokens: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed + h)
        if (v < out(h)) out(h) = v
        h += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /**
   * 64-bit SimHash: per-token xxh64, +1/-1 vote per bit, sign -> bit.
   * Near-duplicate texts land within small Hamming distance.
   */
  def simhash(tokens: ArrayData, seed: Long): Long = {
    val w = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) w(b) += 1 else w(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (w(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Saturating CODE-POINT histogram (256 bins via cp mod 256, counts
    * capped at 255) — the per-DOC half of the edit-distance count filter,
    * computed once per row, 256 bytes of payload. Bins are per CHARACTER,
    * not per UTF-8 byte, because Levenshtein counts character edits: a
    * byte histogram would let one multi-byte-char substitution move up to
    * 8 bins and silently break the L1 <= 2·lev bound on non-ASCII text.
    * Bin collisions (two code points sharing cp%256) only merge counts —
    * they can lower L1, never raise it, so the bound stays safe. */
  def charHist(s: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val str = s.toString
    val h = new Array[Int](256)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h(cp & 0xFF) += 1
      i += Character.charCount(cp)
    }
    val out = new Array[Byte](256)
    i = 0
    while (i < 256) { out(i) = math.min(h(i), 255).toByte; i += 1 }
    out
  }

  /** L1 distance between two saturating byte histograms. One edit changes
    * at most two bins by one each, so lev(a,b) <= d implies L1 <= 2d —
    * and saturation only ever UNDERESTIMATES a bin's true difference
    * (min(·,255) is monotone), so the bound stays safe: filtering on
    * L1 <= 2d can admit extra candidates but never drops a true pair. */
  def histL1(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var s = 0
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      s += (if (d < 0) -d else d)
      i += 1
    }
    s
  }

  /** True iff any element of `arr` is in `set` — the
    * [[BroadcastSetOverlap]] kernel: O(|arr|) with O(1) byte-equality
    * probes (null elements never match). */
  def overlapsSet(
      arr: ArrayData,
      set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) return true
      i += 1
    }
    false
  }

}

/** Word n-grams of an ARRAY<STRING> token column (codegen'd kernel). */
/** Rolling-hash document fingerprint — see [[TextKernels.polyFingerprint]]. */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_fingerprint"

  override def nullSafeEval(v: Any): Any =
    TextKernels.polyFingerprint(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.polyFingerprint($v);")

  override protected def withNewChildInternal(c: Expression): PolyFingerprint =
    copy(child = c)
}

case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // n <= 0 would silently emit cnt-n+1 EMPTY strings per row (the inner
  // parts loop runs zero times) — garbage shingles flowing into
  // MinHash/LSH with no error
  require(n > 0, s"ngram width must be positive: $n")

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(v: Any): Any =
    TextKernels.wordNgrams(v.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.wordNgrams($v, $n);")

  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
}

/** MinHash signature of an ARRAY<STRING> token column. */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long,
    family: HashFamily = HashFamily.Xxh64)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  private def kernel: String = family match {
    case HashFamily.Xxh64 => "minhash"
    case HashFamily.Poly => "minhashPoly"
  }

  override def nullSafeEval(v: Any): Any = family match {
    case HashFamily.Xxh64 => TextKernels.minhash(v.asInstanceOf[ArrayData], numHashes, seed)
    case HashFamily.Poly => TextKernels.minhashPoly(v.asInstanceOf[ArrayData], numHashes, seed)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.$kernel($v, $numHashes, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** 64-bit SimHash of an ARRAY<STRING> token column. */
case class SimHash64(child: Expression, seed: Long,
    family: HashFamily = HashFamily.Xxh64)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  private def kernel: String = family match {
    case HashFamily.Xxh64 => "simhash"
    case HashFamily.Poly => "simhashPoly"
  }

  override def nullSafeEval(v: Any): Any = family match {
    case HashFamily.Xxh64 => TextKernels.simhash(v.asInstanceOf[ArrayData], seed)
    case HashFamily.Poly => TextKernels.simhashPoly(v.asInstanceOf[ArrayData], seed)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.$kernel($v, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/**
 * True iff any element of a STRING array is in a broadcast hash set —
 * the stateless membership form of contamination screening for LARGE
 * eval screens. `arrays_overlap` against a screen carried as one
 * broadcast array re-walks the WHOLE screen per row (Spark's
 * ArraysOverlap rebuilds its probe set per invocation), so its per-row
 * cost is O(|screen|); this probes a set built once, O(|doc shingles|)
 * per row with O(1) probes. Like [[ArgMinCentroid]], the set rides
 * along as a `Broadcast` handle: the expression serializes into each
 * task as a few bytes and executors fetch the set once from the
 * BlockManager — the plan never embeds the (possibly MBs-sized) screen.
 * The set holds UTF8Strings so probes compare raw bytes, no per-element
 * java.lang.String materialization.
 */
case class BroadcastSetOverlap(
    child: Expression,
    set: org.apache.spark.broadcast.Broadcast[
      java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "broadcast_set_overlap"

  override def nullSafeEval(v: Any): Any =
    TextKernels.overlapsSet(v.asInstanceOf[ArrayData], set.value)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("overlapSetBc", set,
      classOf[org.apache.spark.broadcast.Broadcast[
        java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]]].getName)
    // per-task deref, NOT per row: TorrentBroadcast.getValue() is a
    // synchronized method (see ArgMinCentroid)
    val sm = ctx.addMutableState("java.util.HashSet", "overlapSet",
      v => s"$v = (java.util.HashSet) $bc.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.overlapsSet($v, $sm);")
  }

  override protected def withNewChildInternal(c: Expression): BroadcastSetOverlap =
    copy(child = c)
}

/** Column-level text functions (composed built-ins where possible). */
/** Saturating 256-bin byte histogram of a STRING, as BINARY. */
case class CharHist(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_hist"

  override def nullSafeEval(v: Any): Any =
    TextKernels.charHist(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextKernels.charHist($v);")

  override protected def withNewChildInternal(c: Expression): CharHist =
    copy(child = c)
}

/** L1 distance between two byte histograms (edit-distance count filter). */
case class HistL1(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hist_l1"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.histL1(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.histL1($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistL1 =
    copy(left = newLeft, right = newRight)
}

object text {
  import org.apache.spark.sql.functions._

  private def col(e: Expression): Column = graftshims.column(e)
  private def ex(c: Column): Expression = graftshims.expression(c)

  /** Lowercased word tokens ([a-z0-9]+ runs) — codegen'd builtins only. */
  def tokenize(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Word n-grams as space-joined strings over a token array. */
  def word_ngrams(tokens: Column, n: Int): Column =
    col(WordNgrams(ex(tokens), n))

  /** True iff any element of the STRING array column is in the broadcast
    * set — see [[BroadcastSetOverlap]] (the large-eval-screen
    * contamination probe). */
  def broadcast_set_overlap(
      arr: Column,
      set: org.apache.spark.broadcast.Broadcast[
        java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]]): Column =
    col(BroadcastSetOverlap(ex(arr), set))

  /** Saturating 256-bin byte histogram (BINARY) — see [[TextKernels.charHist]]. */
  def char_hist(c: Column): Column = col(CharHist(ex(c)))

  /** L1 distance between two byte histograms — see [[TextKernels.histL1]]. */
  def hist_l1(a: Column, b: Column): Column = col(HistL1(ex(a), ex(b)))

  def minhash_signature(tokens: Column, numHashes: Int = 64, seed: Long = 42L,
      family: HashFamily = HashFamily.Xxh64): Column =
    col(MinHashSignature(ex(tokens), numHashes, seed, family))

  def simhash64(tokens: Column, seed: Long = 42L,
      family: HashFamily = HashFamily.Xxh64): Column =
    col(SimHash64(ex(tokens), seed, family))

  /**
   * LSH band keys for a MinHash signature: `bands` hashes, each over a
   * `len/bands`-row slice. Join on (band index, band hash) to find
   * near-duplicate candidates without an all-pairs comparison.
   */
  def lsh_bands(sig: Column, numHashes: Int, bands: Int): Column = {
    // a non-dividing band count would silently drop the trailing
    // numHashes % bands signature rows — minhash work computed in the
    // hottest kernel and then never banded, with the effective
    // rows-per-band (and thus the (1/b)^(1/r) candidate S-curve the
    // user tuned the threshold against) quietly shifted
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val r = numHashes / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * lit(r) + 1, lit(r))))
  }

  /**
   * Polynomial rolling-hash document fingerprint mod 1e9+7 — the same
   * arithmetic is expressible in DuckDB SQL (list_reduce), so this one is
   * oracle-checkable end to end. Since r20 a codegen'd kernel
   * ([[PolyFingerprint]]) replaces the split('')/ascii/aggregate HOF
   * composition it was first written as: same fold bit-for-bit
   * (spec-pinned against the composition), but one static call per row
   * instead of per-character UTF8String allocation + interpreted lambda
   * evaluation — and no CodegenFallback poisoning whole-stage codegen
   * (and its shared-subexpression elimination) for every projection
   * that fingerprints next to tokenize passes.
   */
  def fingerprint(c: Column): Column = col(PolyFingerprint(ex(c)))

  /** The pre-r20 HOF composition of [[fingerprint]] — kept ONLY as the
    * parity reference for the spec that pins [[PolyFingerprint]] to it. */
  private[graft] def fingerprintViaHofs(c: Column): Column =
    aggregate(
      transform(
        filter(split(c, ""), ch => ch =!= ""), // split() emits a trailing ""
        ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Whitespace-ish token count via the same [a-z0-9]+ tokenizer. */
  def token_count(c: Column): Column = size(tokenize(c))

  /**
   * BPE-ish token count: the GPT-2-style pre-tokenizer pattern (common
   * contractions, letter runs, digit runs, punctuation runs — each with an
   * optional leading space). Approximates LLM token budgets without a
   * vocabulary; the same RE2-compatible pattern runs in the DuckDB oracle.
   */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def token_count_bpe(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0)))
}
