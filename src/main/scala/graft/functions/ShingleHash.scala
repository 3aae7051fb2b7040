package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-60-bit kernel + the fused shingle/boundary loops behind
  * [[HashedShingles]] and [[CdcBounds]]. The hash contract is the repo's
  * oracle-parity hash ([[graft.text.TextOps.stableHash64]]): the first 15
  * hex digits of md5 as a BIGINT — computed here directly from the first
  * 8 digest bytes (big-endian >>> 4), no hex string, no string-radix
  * parse. Bit-identical by construction (15 hex digits ARE the first 60
  * bits of the digest); ShingleHashSpec pins it against the SQL spelling.
  */
object ShingleHashOps {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** stableHash64 of raw UTF-8 bytes: first 60 bits of the md5 digest. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Fused `hashedShingles(shinglesOf(toks, n))`: distinct word n-gram
    * shingles in FIRST-OCCURRENCE order (the array_distinct contract,
    * byte-level UTF8 equality), each hashed to 60 bits mod `prime`.
    * Parity contract (pinned by ShingleHashSpec):
    *  - shingle i (1-based, i ≤ max(size − n + 1, 1)) = the space-joined
    *    slice `toks[i .. i+n−1]` clamped to the array — short docs yield
    *    their single truncated shingle, empty-ish docs the "" shingle;
    *  - NULL tokens are SKIPPED inside a shingle (concat_ws semantics);
    *  - NULL input array → NULL (handled by the expression's null gate).
    */
  def hashedShingles(toks: ArrayData, n: Int, prime: Long): ArrayData = {
    val size = toks.numElements()
    val count = math.max(size - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val hi = math.min(i + n, size)
      // concat_ws over the slice, skipping nulls
      var parts = List.empty[UTF8String]
      var j = hi - 1
      while (j >= i) {
        if (!toks.isNullAt(j)) parts = toks.getUTF8String(j) :: parts
        j -= 1
      }
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    val out = new Array[Long](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) {
      out(k) = hash60(it.next().getBytes) % prime
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Distinct word n-gram shingles as STRINGS in first-occurrence order
    * — [[hashedShingles]] minus the hashing: the
    * `array_distinct(transform(sequence(1, greatest(size−(n−1), 1)), …))`
    * contract (short docs contribute their single truncated shingle).
    * NULL input handled by the expression's null gate + wrapper. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val size = toks.numElements()
    val count = math.max(size - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val hi = math.min(i + n, size)
      var parts = List.empty[UTF8String]
      var j = hi - 1
      while (j >= i) {
        if (!toks.isNullAt(j)) parts = toks.getUTF8String(j) :: parts
        j -= 1
      }
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Word n-grams over a token array — element i (0-based, i ≤ size−n)
    * is the space-joined window `toks[i .. i+n−1]`; fewer than `n`
    * tokens → EMPTY array (the [[graft.text.TextOps.ngrams]] contract;
    * NULL input is handled by the expression's null gate + the
    * wrapper's coalesce). NULL tokens are skipped inside a gram
    * (concat_ws semantics). */
  def ngrams(toks: ArrayData, n: Int): ArrayData = {
    val size = toks.numElements()
    if (size < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](size - n + 1)
    var i = 0
    while (i <= size - n) {
      var parts = List.empty[UTF8String]
      var j = i + n - 1
      while (j >= i) {
        if (!toks.isNullAt(j)) parts = toks.getUTF8String(j) :: parts
        j -= 1
      }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused CDC boundary scan (x52's filter lambda): 1-based positions
    * `i ∈ [2, size]` where `hash60(toks[i−2] + " " + toks[i−1]) % div
    * == 0` (0-based indexing of the adjacent pair). A NULL token makes
    * its pair's hash NULL in the SQL spelling (plain `concat`), which
    * the filter drops — so NULL-adjacent positions are skipped here
    * too. Fewer than 2 tokens → empty array. */
  def cdcBounds(toks: ArrayData, div: Long): ArrayData = {
    val size = toks.numElements()
    if (size < 2) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Int])
    val out = new java.util.ArrayList[Integer](8)
    var i = 1
    while (i < size) {
      if (!toks.isNullAt(i - 1) && !toks.isNullAt(i)) {
        val pair = UTF8String.concat(
          toks.getUTF8String(i - 1), SPACE, toks.getUTF8String(i))
        if (hash60(pair.getBytes) % div == 0L) out.add(i + 1)
      }
      i += 1
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }
}

/** Native codegen'd fused shingle+hash: `graft_hashed_shingles(toks, n,
  * prime)` ≡ `transform(array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i, n)))), s => stableHash64(s) % prime)` —
  * the per-document signature front of MinHash/LSH dedup (x06/x14/x98/
  * x31/x72). The HOF chain evaluates interpreted, allocating a slice +
  * joined string + md5-hex + radix-parse per shingle per row; this is
  * one compiled loop per row (guide §4: keep the hot loop native). */
case class HashedShingles(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok && second.dataType == IntegerType && third.dataType == LongType &&
      second.foldable && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, foldable INT, foldable BIGINT), got " +
        s"${first.dataType.simpleString} / ${second.dataType.simpleString} / " +
        s"${third.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(toks: Any, n: Any, prime: Any): Any =
    ShingleHashOps.hashedShingles(toks.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], prime.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, p) =>
      s"${ev.value} = graft.functions.ShingleHashOps.hashedShingles($t, $n, $p);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "graft_hashed_shingles"
}

/** Static lookup tables + kernel for [[LangId]] — built from
  * [[graft.text.TextOps.languageMarkers]] at class load so the native
  * expression can never drift from the declared marker lists. */
object LangIdOps {
  /** Alphabetical language order — the tie-break order of the
    * `foldRight` in [[graft.text.TextOps.languageIdOf]]. */
  val langs: Array[UTF8String] =
    graft.text.TextOps.languageMarkers.keys.toArray.sorted
      .map(UTF8String.fromString)
  private val markerToLangs: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    val names = graft.text.TextOps.languageMarkers.keys.toArray.sorted
    names.zipWithIndex.foreach { case (lang, i) =>
      graft.text.TextOps.languageMarkers(lang).foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = Option(m.get(k)).getOrElse(Array.empty[Int])
        m.put(k, prev :+ i)
      }
    }
    m
  }
  private val UND = UTF8String.fromString("und")

  /** Argmax-of-marker-counts language id: counts each token's marker
    * hits per language (multiplicity counts, the `filter`+`size`
    * semantics; a token on two languages' lists — "la" is es AND fr —
    * scores both), then the alphabetically-first language holding the
    * max; "und" when every score is 0. NULL tokens never match
    * (array_contains semantics). */
  def langId(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val hit = markerToLangs.get(toks.getUTF8String(i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var k = 0
    while (k < counts.length) {
      if (counts(k) > best) { best = counts(k); bestIdx = k }
      k += 1
    }
    if (bestIdx < 0) UND else langs(bestIdx)
  }
}

/** Native codegen'd language id: `graft_lang_id(toks)` ≡
  * [[graft.text.TextOps.languageIdOf]]'s greatest-of-5-interpreted-
  * filter-passes fold, in ONE compiled pass over the token array
  * (ShingleHashSpec pins parity; NULL input handled by the wrapper's
  * coalesce to "und", the old fold's contract). */
case class LangId(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(toks: Any): Any =
    LangIdOps.langId(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.LangIdOps.langId($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lang_id"
}

/** Native codegen'd word n-grams: `graft_ngrams(toks, n)` ≡
  * `transform(sequence(0, size−n), i -> concat_ws(" ", slice(toks, i+1,
  * n)))` under the size ≥ n guard — the corpus-pass front of every
  * n-gram statistic (x28/x29/x44/x106/x112, the bigram-tf staging). The
  * HOF spelling evaluates interpreted: one slice copy + one joined
  * string per gram per row through a lambda frame; this is one compiled
  * loop per row (guide §4). */
case class Ngrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, foldable INT), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleHashOps.ngrams(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleHashOps.ngrams($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_ngrams"
}

/** Kernel for [[TokenTuples]]. */
object TokenTupleOps {
  /** All adjacent n-token windows as structs — the
    * `transform(sequence(n−1, size−1), i -> struct(toks[i−n+1], …,
    * toks[i]))` spelling of the bigram/trigram LM fronts. Fewer than n
    * tokens → empty (callers filter `size ≥ n` first, which also keeps
    * the HOF's descending-sequence edge unreachable). */
  def tokenTuples(toks: ArrayData, n: Int): ArrayData = {
    val size = toks.numElements()
    if (size < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](size - n + 1)
    var i = 0
    while (i <= size - n) {
      val fields = new Array[Any](n)
      var j = 0
      while (j < n) {
        fields(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd adjacent token tuples: `graft_token_tuples(toks, n)`
  * ≡ `transform(sequence(n−1, size(toks)−1), i -> struct(toks[i−n+1] AS
  * a, …, toks[i]))` under the callers' `size ≥ n` guard — the
  * bigram/trigram pair front of the LM-quality operators
  * (x94/x95/x96/x97/x101/x112). Field names a, b (, c) match the HOF
  * spelling so `pr.a`-style consumers are drop-in. */
case class TokenTuples(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val n: Int = right.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok && right.dataType == IntegerType && right.foldable &&
      { val v = right.eval(null); v != null &&
        v.asInstanceOf[Int] >= 2 && v.asInstanceOf[Int] <= 3 })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, foldable INT in [2, 3]), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq("a", "b", "c").take(n)
      .map(StructField(_, StringType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(toks: Any, nAny: Any): Any =
    TokenTupleOps.tokenTuples(toks.asInstanceOf[ArrayData], nAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nv) =>
      s"${ev.value} = graft.functions.TokenTupleOps.tokenTuples($t, $nv);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_token_tuples"
}

/** Native codegen'd distinct string shingles: `graft_shingles(toks, n)`
  * ≡ `array_distinct(transform(sequence(1, greatest(size−(n−1), 1)),
  * i -> concat_ws(" ", slice(toks, i, n))))` — the verify-leg /
  * pair-scoring twin of [[HashedShingles]] (x12's corpus-wide bigram
  * sets, the x06/x14/x98 candidate legs). */
case class Shingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, foldable INT), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleHashOps.shingles(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleHashOps.shingles($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingles"
}

/** Native codegen'd CDC boundary positions: `graft_cdc_bounds(toks, div)`
  * ≡ `filter(sequence(2, size(toks)), i => stableHash64(concat(toks[i−1],
  * " ", toks[i])) % div == 0)` with the `size ≥ 2` guard folded in
  * (empty array below 2 tokens) — x52's rolling-hash chunker front. */
case class CdcBounds(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok && right.dataType == LongType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<STRING>, foldable BIGINT), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(toks: Any, div: Any): Any =
    ShingleHashOps.cdcBounds(toks.asInstanceOf[ArrayData],
      div.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.functions.ShingleHashOps.cdcBounds($t, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cdc_bounds"
}
