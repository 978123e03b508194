package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a single-space-tokenized string, in
  * first-occurrence order — one imperative O(len) pass per row.
  *
  * Why an Expression and not `array_distinct(transform(sequence,...,
  * slice+concat_ws))`: higher-order Column lambdas re-evaluate their
  * inlined children per element (Catalyst CSE does not reach inside
  * lambda bodies, and CollapseProject re-inlines any attempt to
  * materialize the token array in a projection below), making the
  * declarative version O(n²) per row interpreted. Shingling is
  * per-row imperative work — the same judgment as
  * HashFunctions.winnowedFingerprints.
  */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - k) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, k: Int): Column =
    GraftShim.column(WordShingles(GraftShim.expression(text), k))
}

/** Exact Jaccard similarity of two string-array columns treated as
  * sets — one hash-set build + one probe pass per row, instead of
  * `array_intersect`+`size`ⁿ re-evaluated by every consumer of the
  * value (filter + projection each re-run the full intersection).
  */
case class JaccardSim(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    val seen = new java.util.HashSet[UTF8String](nb * 2)
    i = 0
    while (i < nb) {
      val s = y.getUTF8String(i)
      if (seen.add(s) && set.contains(s)) inter += 1
      i += 1
    }
    val union = set.size + seen.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def apply(a: Column, b: Column): Column =
    GraftShim.column(JaccardSim(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Sorted 32-bit hashes of a string array's elements, duplicates
  * KEPT — the compact verify-side payload for the two-phase near-dup
  * verification (see NearDup.verifiedJaccard). ~4 bytes per shingle
  * instead of a ~30-byte string, so the candidate×payload exchange
  * that dominates the exact-pair family at scale shrinks ~7×.
  *
  * Duplicate hash values (two distinct strings colliding) are
  * deliberately preserved: phase-1 overlap is a MULTISET intersection
  * against TRUE set sizes, which keeps the filter an upper bound on
  * the exact string similarity (see SortedOverlapCount) — a deduped
  * hash set would undercount an overlap where two COMMON strings
  * collide and could drop a true pair.
  *
  * Hash: UTF8String.hashCode (Murmur3_x86_32, fixed seed) — stable
  * across JVMs and cluster layouts. One imperative pass + sort per
  * row; an Expression for the same reason as [[WordShingles]]
  * (lambda-based transform would re-evaluate the inlined shingle
  * child per element).
  */
case class ShingleHashes(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = arr.getUTF8String(i).hashCode(); i += 1 }
    java.util.Arrays.sort(out)
    val boxed = new Array[Any](n)
    i = 0
    while (i < n) { boxed(i) = out(i); i += 1 }
    new GenericArrayData(boxed)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(a: Column): Column =
    GraftShim.column(ShingleHashes(GraftShim.expression(a)))
}

/** Multiset intersection size of two SORTED int arrays — one
  * two-pointer merge pass per row. With [[ShingleHashes]] payloads
  * this is an UPPER bound on the exact string-set overlap: every
  * common string hash-matches, and Σ_v min(cntA(v), cntB(v)) counts
  * each common string at least once even when distinct common strings
  * collide (both sides keep the duplicate). Dividing by the TRUE set
  * sizes (array lengths = distinct-string counts) therefore upper-
  * bounds Jaccard and containment — phase-1 pruning on it never
  * drops a pair the exact phase-2 verify would keep.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var o = 0
    while (i < na && j < nb) {
      val va = x.getInt(i)
      val vb = y.getInt(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else { o += 1; i += 1; j += 1 }
    }
    o
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)
}

object SortedOverlapCount {
  def apply(a: Column, b: Column): Column =
    GraftShim.column(SortedOverlapCount(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Adjacent symbol pairs of a DOUBLE-space-separated BPE symbol
  * string (the TextAnalysis.bpeReplaceExpr rendering: " a  b  c  ")
  * as an array of (l, r) structs — one imperative pass per row.
  *
  * Replaces the declarative chain
  * `split(trim(w), "  ")` → `filter(size ≥ 2)` →
  * `explode(transform(sequence(1, n−1), i → struct(element_at(sy, i),
  * element_at(sy, i+1))))`, whose per-element lambda interpretation
  * and struct boxing dominated the BPE pair-count jobs (round-13
  * profile: ~2 s per pass at sf0.1). Semantics are replicated
  * exactly: leading/trailing 0x20 spaces stripped (Spark `trim`),
  * the remainder split on the literal two-space separator with
  * trailing empties kept (Spark `split(_, "  ", -1)` — symbols never
  * contain spaces, so the regex is effectively literal), and < 2
  * symbols yield an empty array (the old `filter(size ≥ 2)`).
  */
case class BpeAdjacentPairs(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("l", StringType, nullable = true),
      StructField("r", StringType, nullable = true))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Spark trim: strip 0x20 from both ends
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val t = s.substring(lo, hi)
    // literal two-space split, trailing empties kept (limit -1)
    val syms = BpeAdjacentPairs.SEP.split(t, -1)
    if (syms.length < 2) return new GenericArrayData(Array.empty[Any])
    val u = new Array[UTF8String](syms.length)
    var i = 0
    while (i < syms.length) { u(i) = UTF8String.fromString(syms(i)); i += 1 }
    val out = new Array[Any](syms.length - 1)
    i = 0
    while (i < syms.length - 1) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(u(i), u(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeAdjacentPairs =
    copy(child = newChild)
}

object BpeAdjacentPairs {
  private val SEP = java.util.regex.Pattern.compile("  ")
  def apply(w: Column): Column =
    GraftShim.column(BpeAdjacentPairs(GraftShim.expression(w)))
}

/** The BPE spaced-symbol rendering of a word — " " followed by each
  * character and a two-space separator (" hello " → " h  e  l  l  o  ")
  * — one StringBuilder pass per row, replacing
  * `concat(" ", regexp_replace(w, "(.)", "$1  "))` (a regex engine
  * invocation per word with per-character group substitution).
  * Replicated exactly: the regex `.` matches one code POINT but NOT
  * the five line terminators (\n, \r, U+0085, U+2028, U+2029), which
  * regexp_replace passes through unchanged — so does this kernel.
  */
case class BpeSpacedSymbols(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length * 3 + 1)
    sb.append(' ')
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      if (cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029)
        sb.appendCodePoint(cp)
      else
        sb.appendCodePoint(cp).append(' ').append(' ')
      i += n
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSpacedSymbols =
    copy(child = newChild)
}

object BpeSpacedSymbols {
  def apply(w: Column): Column =
    GraftShim.column(BpeSpacedSymbols(GraftShim.expression(w)))
}

/** Symbol count of a double-spaced BPE word — `size(split(trim(w),
  * "  "))` as one counting pass (no array materialization): the
  * post-merge token count [[BpeAdjacentPairs]]' consumers aggregate.
  */
case class BpeSymbolCount(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    // split on literal "  " with limit -1 yields segments between
    // non-overlapping separator matches; count = matches + 1
    var n = 1
    var i = lo
    while (i + 1 < hi) {
      if (s.charAt(i) == ' ' && s.charAt(i + 1) == ' ') { n += 1; i += 2 }
      else i += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSymbolCount =
    copy(child = newChild)
}

object BpeSymbolCount {
  def apply(w: Column): Column =
    GraftShim.column(BpeSymbolCount(GraftShim.expression(w)))
}

/** ALL positional k-shingles of a token array, space-joined, in
  * position order — `transform(sequence(0, size(t) − k), i →
  * array_join(slice(t, i + 1, k), ' '))` as one imperative pass
  * (the WordShingles judgment applied to the POSITIONAL variant:
  * the HOF body allocates a slice array and an array_join per
  * element, interpreted). < k tokens yields an empty array, which
  * subsumes the callers' `filter(size(t) ≥ k)` prune under
  * posexplode.
  */
case class TokenShingles(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      // byte-level concat, no String round-trip
      out(i) = UTF8String.concatWs(sep,
        java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

object TokenShingles {
  def apply(tokens: Column, k: Int): Column =
    GraftShim.column(TokenShingles(GraftShim.expression(tokens), k))
}

/** Adjacent token bigrams of a token array as (w1, w2) structs —
  * `transform(sequence(1, size(t) − 1), i → struct(t[i−1], t[i]))`
  * as one pass; < 2 tokens yields an empty array (the callers'
  * `filter(size(t) ≥ 2)` prune).
  */
case class TokenBigrams(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = true),
      StructField("w2", StringType, nullable = true))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(toks(i), toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenBigrams =
    copy(child = newChild)
}

object TokenBigrams {
  def apply(tokens: Column): Column =
    GraftShim.column(TokenBigrams(GraftShim.expression(tokens)))
}
