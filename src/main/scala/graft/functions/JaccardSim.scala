package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[JaccardSim]] — one hash-set pass computing |∩| and |∪|
  * of two string arrays under SET semantics (duplicates collapse, a NULL
  * element counts as one distinguished set member), exactly the sizes
  * `array_intersect` / `array_union` would produce — without
  * materializing either result array. */
object JaccardOps {
  /** java.lang.Double similarity, or null when the union is empty —
    * the non-ANSI `Divide` result for the HOF spelling's empty∪empty
    * edge (under ANSI that Divide THROWS; the edge is unreachable
    * in-tree because `shinglesOf` never yields an empty set, so every
    * in-tree pair has union ≥ 1 — documented divergence, JaccardSpec
    * pins it). */
  def jaccard(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val setA = new java.util.HashSet[UTF8String](na * 2)
    var nullA = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) nullA = true
      else setA.add(a.getUTF8String(i)): Unit
      i += 1
    }
    val nb = b.numElements()
    val setB = new java.util.HashSet[UTF8String](nb * 2)
    var nullB = false
    var inter = 0L
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) nullB = true
      else {
        val s = b.getUTF8String(j)
        if (setB.add(s) && setA.contains(s)) inter += 1
      }
      j += 1
    }
    if (nullA && nullB) inter += 1
    val sizeA = setA.size.toLong + (if (nullA) 1L else 0L)
    val sizeB = setB.size.toLong + (if (nullB) 1L else 0L)
    val union = sizeA + sizeB - inter
    if (union == 0L) null
    else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }
}

/** Native codegen'd Jaccard similarity of two `ARRAY<STRING>` columns —
  * the per-candidate-pair verification kernel of every LSH/blocked dedup
  * operator (x06/x12/x14/x72/x98). Bit-identical to the HOF spelling
  *
  *   `size(array_intersect(a, b)).cast(DOUBLE) /
  *    size(array_union(a, b)).cast(DOUBLE)`
  *
  * (JaccardSpec pins the parity, including duplicate elements, NULL
  * elements and the empty∪empty → NULL divide edge) — but in ONE
  * hash-set pass per pair. The HOF pair builds an intersection array
  * AND a union array per row only to take their sizes: three hash
  * structures and two materialized arrays per candidate pair, the
  * dominant per-row cost of the verify legs (guide §4: make the hot
  * loop cheap; §1.2: per-task work after the algorithm is right). */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = JaccardOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NEVER fixed identifiers (the QDotLong rule: unbraced
      // reuse in one codegen stage would redeclare locals and kick the
      // stage back to interpreted execution)
      val r = ctx.freshName("jacR")
      s"""
         |java.lang.Double $r = graft.functions.JaccardOps.jaccard($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaccard"
}
