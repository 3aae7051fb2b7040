package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product of two `ARRAY<BIGINT>` columns —
  * the hot inner loop of every similarity operator (SURVEY.md §2.8 /
  * guide: "a native Catalyst `Expression` (with doGenCode) beats a Scala
  * UDF"). Spark's `aggregate`/`zip_with` higher-order functions evaluate
  * interpreted, allocating a lambda frame per element; this compiles to a
  * tight `long` loop inside whole-stage codegen.
  *
  * Semantics: NULL if either array (or any element) is NULL; equal-length
  * arrays produce exactly `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * (SimilaritySpec pins the parity). Two documented divergences from the
  * HOF for inputs this codebase never produces: unequal lengths take the
  * shorter bound (`zip_with` pads with NULLs → whole result NULL), and
  * long overflow wraps (the HOF under ANSI mode throws).
  */
case class QDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NEVER fixed identifiers: with non-nullable children
      // nullSafeCodeGen emits the body unbraced into the shared method
      // scope, so two qdot instances in one stage (cosineQ emits three)
      // would redeclare the same locals — Janino rejects the generated
      // class and Spark silently falls back to interpreted execution
      val n = ctx.freshName("qdlN")
      val s = ctx.freshName("qdlS")
      val i = ctx.freshName("qdlI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_qdot"
}

/** Native codegen'd integer squared L2 distance of two `ARRAY<BIGINT>`
  * columns — the LUT/probe-leg kernel of the PQ path
  * ([[graft.sim.PqIndex]]): the one place the interpreted
  * `aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0L, _+_)` HOF was
  * still evaluated after the r18 argmin rewrite ([[PqArgmin]] carries
  * the same loop fused with the min). Equal-length arrays produce
  * exactly the HOF's fold (PqArgminSpec pins the parity on the real
  * LUT shape); the two documented divergences match [[QDotLong]]:
  * unequal lengths take the shorter bound and overflow wraps — inputs
  * this codebase never produces (codebook subvectors are fixed-width).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NEVER fixed identifiers (see QDotLong above)
      val n = ctx.freshName("sqdN")
      val s = ctx.freshName("sqdS")
      val i = ctx.freshName("sqdI")
      val d = ctx.freshName("sqdD")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sq_dist"
}

/** Session-scoped registration of the native functions; `Column`
  * construction goes through the function registry (`call_function`), the
  * supported public path in Spark 4. */
object NativeFunctions {

  /** The native function catalog: one entry per custom Expression, in
    * `SparkSessionExtensions.injectFunction` shape so the same list backs
    * both the session-scoped registration and [[GraftExtensions]]. */
  val functions: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qdot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[QDotLong].getCanonicalName, "graft_qdot"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => QDotLong(a, b)
        case _ => throw new IllegalArgumentException(
          s"graft_qdot takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSig].getCanonicalName, "graft_minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(h, a, b) => MinHashSig(h, a, b)
        case _ => throw new IllegalArgumentException(
          s"graft_minhash_sig takes 3 arguments, got ${exprs.length}")
      }),
    // Spark's OWN bloom-filter expressions (the machinery behind its
    // runtime join filters), surfaced as callable functions — they are
    // not SQL-registered by default. graft_bloom_agg(xxhash64(k) [, est
    // items [, bits]]) → binary sketch; graft_might_contain(sketch,
    // xxhash64(k)) → boolean, codegen'd on the probe side (BloomJoin).
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]
          .getCanonicalName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) => {
        // BloomFilterAggregate demands BIGINT sizing args; a SQL literal
        // (`graft_bloom_agg(x, 10000)`) parses as INT — coerce, don't
        // bounce the caller with a type-mismatch
        def asLong(e: Expression): Expression =
          org.apache.spark.sql.catalyst.expressions.Cast(
            e, org.apache.spark.sql.types.LongType)
        exprs match {
          case Seq(c) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
          case Seq(c, est) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
              c, asLong(est))
          case Seq(c, est, bits) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
              c, asLong(est), asLong(bits))
          case _ => throw new IllegalArgumentException(
            s"graft_bloom_agg takes 1-3 arguments, got ${exprs.length}")
        }
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getCanonicalName, "graft_might_contain"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bf, h) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bf, h)
        case _ => throw new IllegalArgumentException(
          s"graft_might_contain takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_pq_argmin"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PqArgmin].getCanonicalName, "graft_pq_argmin"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(sv, entries) => PqArgmin(sv, entries)
        case _ => throw new IllegalArgumentException(
          s"graft_pq_argmin takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hashed_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HashedShingles].getCanonicalName, "graft_hashed_shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t, n, p) => HashedShingles(t, n, p)
        case _ => throw new IllegalArgumentException(
          s"graft_hashed_shingles takes 3 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_token_tuples"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TokenTuples].getCanonicalName, "graft_token_tuples"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t, n) => TokenTuples(t, n)
        case _ => throw new IllegalArgumentException(
          s"graft_token_tuples takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Shingles].getCanonicalName, "graft_shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t, n) => Shingles(t, n)
        case _ => throw new IllegalArgumentException(
          s"graft_shingles takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lang_id"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LangId].getCanonicalName, "graft_lang_id"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t) => LangId(t)
        case _ => throw new IllegalArgumentException(
          s"graft_lang_id takes 1 argument, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ngrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Ngrams].getCanonicalName, "graft_ngrams"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t, n) => Ngrams(t, n)
        case _ => throw new IllegalArgumentException(
          s"graft_ngrams takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cdc_bounds"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CdcBounds].getCanonicalName, "graft_cdc_bounds"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t, d) => CdcBounds(t, d)
        case _ => throw new IllegalArgumentException(
          s"graft_cdc_bounds takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sq_dist"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SqDistLong].getCanonicalName, "graft_sq_dist"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => SqDistLong(a, b)
        case _ => throw new IllegalArgumentException(
          s"graft_sq_dist takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_jaccard"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[JaccardSim].getCanonicalName, "graft_jaccard"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => JaccardSim(a, b)
        case _ => throw new IllegalArgumentException(
          s"graft_jaccard takes 2 arguments, got ${exprs.length}")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getCanonicalName, "graft_nfc"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s) => NfcNormalize(s)
        case _ => throw new IllegalArgumentException(
          s"graft_nfc takes 1 argument, got ${exprs.length}")
      }))

  /** Idempotent, race-free registration: the guard is the session's OWN
    * function registry (an identityHashCode set would let a second thread
    * skip past while the first is mid-registration, and collides across
    * sessions); createOrReplaceTempFunction is itself idempotent, so the
    * worst concurrent case is a harmless double-register. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (ident, _, builder) =>
      if (!reg.functionExists(ident))
        reg.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
  }

  /** Codegen'd dot product; requires an active session (register on use). */
  def qdot(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("graft_qdot", a, b)
  }

  /** Codegen'd integer squared L2 distance ([[SqDistLong]]). */
  def sqDist(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("graft_sq_dist", a, b)
  }

  /** Codegen'd set-Jaccard of two string arrays ([[JaccardSim]]). */
  def jaccardSim(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("graft_jaccard", a, b)
  }

  /** Codegen'd Unicode NFC normalization ([[NfcNormalize]]). */
  def nfc(s: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("graft_nfc", s)
  }

  /** Codegen'd nearest-codeword argmin ([[PqArgmin]]): `[d, cw]` over a
    * grouped codebook column of `ARRAY<STRUCT<cw, cv>>`. */
  def pqArgmin(sv: Column, entries: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("graft_pq_argmin", sv, entries)
  }

  /** Codegen'd fused distinct-shingle + 60-bit-hash pass ([[HashedShingles]]). */
  def hashedShingles(toks: Column, n: Int, prime: Long): Column = {
    SparkSession.getActiveSession.foreach(register)
    import org.apache.spark.sql.functions.lit
    call_function("graft_hashed_shingles", toks, lit(n), lit(prime))
  }

  /** Codegen'd adjacent token tuples ([[TokenTuples]]), n ∈ [2, 3]. */
  def tokenTuples(toks: Column, n: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    import org.apache.spark.sql.functions.lit
    call_function("graft_token_tuples", toks, lit(n))
  }

  /** Codegen'd distinct string shingles ([[Shingles]]). */
  def shingles(toks: Column, n: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    import org.apache.spark.sql.functions.lit
    call_function("graft_shingles", toks, lit(n))
  }

  /** Codegen'd marker-count language id ([[LangId]]). */
  def langId(toks: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("graft_lang_id", toks)
  }

  /** Codegen'd word n-grams ([[Ngrams]]); empty below n tokens. */
  def ngrams(toks: Column, n: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    import org.apache.spark.sql.functions.lit
    call_function("graft_ngrams", toks, lit(n))
  }

  /** Codegen'd CDC boundary-position scan ([[CdcBounds]]). */
  def cdcBounds(toks: Column, div: Long): Column = {
    SparkSession.getActiveSession.foreach(register)
    import org.apache.spark.sql.functions.lit
    call_function("graft_cdc_bounds", toks, lit(div))
  }

  /** Codegen'd one-pass MinHash signature over a hashed shingle set. */
  def minhashSig(hashedSet: Column, perms: Seq[(Long, Long)]): Column = {
    SparkSession.getActiveSession.foreach(register)
    import org.apache.spark.sql.functions.{array, lit}
    call_function("graft_minhash_sig", hashedSet,
      array(perms.map(p => lit(p._1)): _*), array(perms.map(p => lit(p._2)): _*))
  }
}

/** `SparkSessionExtensions` injector — the deployment path for a real
  * cluster: `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) registers every native
  * function in the session catalog at startup, so SQL-only users (JDBC,
  * thrift, notebooks) get `graft_qdot(...)` without touching Scala. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    NativeFunctions.functions.foreach(ext.injectFunction)
}
