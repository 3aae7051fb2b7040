package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd MinHash signature: for hashed shingle set `hs` and
  * universal-hash permutations `(a_j, b_j)`, computes
  * `sig_j = min_h (h·a_j + b_j) mod (2³¹−1)` for all `j` in ONE pass over
  * the array — the hot per-row loop of MinHash+LSH dedup (x06/x14).
  *
  * Replaces the `aggregate(transform(...))` higher-order fold, which
  * evaluates interpreted and allocates a fresh accumulator array per
  * element per row (O(|shingles|·k) allocations); this is a primitive
  * `long[]` loop inside whole-stage codegen. Semantics parity with the
  * HOF version (spec-tested): NULL array → NULL, NULL elements skipped
  * (`least` skips nulls), empty set → all-`HashPrime` signature.
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private val P = 2147483647L // Mersenne prime 2³¹−1 (DedupOps.HashPrime)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(first.dataType) && ok(second.dataType) && ok(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"${first.dataType.simpleString} / ${second.dataType.simpleString} / " +
        s"${third.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  /** The permutation arrays must pair up and carry no NULL slots —
    * `bs.getLong(j)` past the array's end is an UNCHECKED unsafe read
    * (silent garbage signatures, not an exception), and a NULL slot reads
    * as 0, skewing every signature. SQL-registered callers can pass
    * anything, so this is validated per row — two int compares against a
    * scan of the shingle set is noise. */
  private def requireValidPerms(as: ArrayData, bs: ArrayData): Int = {
    val k = as.numElements()
    require(bs.numElements() == k,
      s"$prettyName: permutation arrays must have equal length, " +
        s"got a=$k b=${bs.numElements()}")
    var j = 0
    while (j < k) {
      require(!as.isNullAt(j) && !bs.isNullAt(j),
        s"$prettyName: permutation arrays must not contain NULLs (slot $j)")
      j += 1
    }
    k
  }

  override def nullSafeEval(hsAny: Any, aAny: Any, bAny: Any): Any = {
    val hs = hsAny.asInstanceOf[ArrayData]
    val as = aAny.asInstanceOf[ArrayData]
    val bs = bAny.asInstanceOf[ArrayData]
    val k = requireValidPerms(as, bs)
    val mins = Array.fill(k)(P)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * as.getLong(j) + bs.getLong(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, as, bs) => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      s"""
         |final int $k = $as.numElements();
         |if ($bs.numElements() != $k) {
         |  throw new IllegalArgumentException(
         |    "graft_minhash_sig: permutation arrays must have equal length");
         |}
         |for (int $j = 0; $j < $k; $j++) {
         |  if ($as.isNullAt($j) || $bs.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "graft_minhash_sig: permutation arrays must not contain NULLs");
         |  }
         |}
         |final long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${P}L);
         |final int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    final long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $v = ($h * $as.getLong($j) + $bs.getLong($j)) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_minhash_sig"
}
