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
