package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Native codegen'd nearest-codeword argmin over a small codebook — the
  * hot per-row loop of PQ/IVF quantization ([[graft.sim.PqIndex]]):
  * for a quantized subvector `sv` and a codebook `entries` =
  * `ARRAY<STRUCT<cw BIGINT, cv ARRAY<BIGINT>>>`, returns
  * `[min_d, argmin_cw]` where `d(cw) = Σ_i (sv_i − cv_i)²` in exact
  * integer arithmetic and ties break to the LOWER `cw` — bit-identical
  * to the `min(struct(d, cw))` aggregate over a codebook-exploding join
  * (PqArgminSpec pins the parity).
  *
  * Replaces the join-explosion shape (`sub × codebook` multiplies the
  * corpus-scaled frame by |codebook| rows, each paying an interpreted
  * `aggregate(zip_with(...))` lambda per element, then a re-grouping
  * hash aggregate on an ARRAY key to take the min) with ONE narrow
  * codegen'd pass: per input row a primitive `long` loop of
  * |codebook| × |subDim| multiply-adds, no intermediate rows, no
  * re-shuffle. At 100 TB the assignment pass stays a map-only scan.
  *
  * Semantics: NULL if either input is NULL or the codebook is empty
  * (never produced by the trainers — documented for SQL callers);
  * NULL codebook slots/fields or NULL vector elements throw (loud,
  * the MinHashSig rule — a silent 0 would skew every assignment);
  * length mismatches take the shorter bound (the QDotLong rule; the
  * trainers always produce equal-length subvectors).
  */
case class PqArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 2 =>
        fields(0).dataType == LongType &&
          (fields(1).dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (okLeft && okRight) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<STRUCT<BIGINT, ARRAY<BIGINT>>>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(svAny: Any, entriesAny: Any): Any = {
    val sv = svAny.asInstanceOf[ArrayData]
    val entries = entriesAny.asInstanceOf[ArrayData]
    val m = entries.numElements()
    if (m == 0) return null
    var bestD = 0L
    var bestCw = 0L
    var found = false
    var j = 0
    while (j < m) {
      if (entries.isNullAt(j))
        throw new IllegalArgumentException(
          s"$prettyName: codebook entries must not be NULL (slot $j)")
      val e: InternalRow = entries.getStruct(j, 2)
      if (e.isNullAt(0) || e.isNullAt(1))
        throw new IllegalArgumentException(
          s"$prettyName: codebook fields must not be NULL (slot $j)")
      val cw = e.getLong(0)
      val cv = e.getArray(1)
      val n = math.min(sv.numElements(), cv.numElements())
      var d = 0L
      var i = 0
      while (i < n) {
        if (sv.isNullAt(i) || cv.isNullAt(i))
          throw new IllegalArgumentException(
            s"$prettyName: vector elements must not be NULL (element $i)")
        val x = sv.getLong(i) - cv.getLong(i)
        d += x * x
        i += 1
      }
      if (!found || d < bestD || (d == bestD && cw < bestCw)) {
        found = true; bestD = d; bestCw = cw
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(bestD, bestCw))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, entries) => {
      // freshName, NEVER fixed identifiers (see QDotLong: unbraced reuse
      // in one codegen stage would redeclare locals and kick the whole
      // stage back to interpreted execution)
      val m = ctx.freshName("pqaM")
      val j = ctx.freshName("pqaJ")
      val i = ctx.freshName("pqaI")
      val n = ctx.freshName("pqaN")
      val d = ctx.freshName("pqaD")
      val x = ctx.freshName("pqaX")
      val e = ctx.freshName("pqaE")
      val cv = ctx.freshName("pqaCv")
      val cw = ctx.freshName("pqaCw")
      val bestD = ctx.freshName("pqaBestD")
      val bestCw = ctx.freshName("pqaBestCw")
      val found = ctx.freshName("pqaFound")
      s"""
         |final int $m = $entries.numElements();
         |if ($m == 0) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = null;
         |} else {
         |  long $bestD = 0L; long $bestCw = 0L; boolean $found = false;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($entries.isNullAt($j)) {
         |      throw new IllegalArgumentException(
         |        "graft_pq_argmin: codebook entries must not be NULL");
         |    }
         |    final org.apache.spark.sql.catalyst.InternalRow $e =
         |      $entries.getStruct($j, 2);
         |    if ($e.isNullAt(0) || $e.isNullAt(1)) {
         |      throw new IllegalArgumentException(
         |        "graft_pq_argmin: codebook fields must not be NULL");
         |    }
         |    final long $cw = $e.getLong(0);
         |    final org.apache.spark.sql.catalyst.util.ArrayData $cv = $e.getArray(1);
         |    final int $n = java.lang.Math.min($sv.numElements(), $cv.numElements());
         |    long $d = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($sv.isNullAt($i) || $cv.isNullAt($i)) {
         |        throw new IllegalArgumentException(
         |          "graft_pq_argmin: vector elements must not be NULL");
         |      }
         |      final long $x = $sv.getLong($i) - $cv.getLong($i);
         |      $d += $x * $x;
         |    }
         |    if (!$found || $d < $bestD || ($d == $bestD && $cw < $bestCw)) {
         |      $found = true; $bestD = $d; $bestCw = $cw;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(new long[] { $bestD, $bestCw });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_argmin"
}
