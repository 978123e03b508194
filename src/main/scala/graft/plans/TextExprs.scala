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
