package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.patterns.IfLadderSqlCompiler

/** q149–q151: dispatcher-level IF ladders — multi-statement BEGIN…END
  * branches, conditional assignment legs, ELSE IF cascades, and the
  * top-level early-exit RETURN leg — plus the regrouping pass that
  * re-joins the fragments the `;` splitter shreds a block into, and
  * the staged-state visibility invariant of the IF-EXISTS probe. */
class IfLadderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def mkExec(
      written: scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame]) =
    graft.patterns.ScriptedSqlExecutor.executor(spark,
      resolveFrame = n => written.getOrElse(n, spark.table(n)),
      bareName = identity,
      commit = (k, v) => written(k) = v)
  private def task(sql: String) =
    graft.ir.Ir.ExecuteSqlTask("lad", None, "conn", sql)
  // the session is shared across suites: every temp view a test
  // registers must drop at its end, or a later suite's spark.table
  // fallback reads this suite's fixtures (the r18 full-run interference)
  private def dropViews(names: String*): Unit =
    names.foreach(n => spark.catalog.dropTempView(n): Unit)

  // ---- regroup: the splitter-shred repair ----------------------------

  test("regroup re-joins shredded IF…BEGIN…END blocks and ELSE fragments") {
    val shredded = SqlText_split(
      "DECLARE @n INT; IF @n > 0 BEGIN TRUNCATE TABLE t; INSERT INTO t " +
        "SELECT 1 AS a; END ELSE BEGIN UPDATE t SET a = 0; DELETE FROM " +
        "u WHERE a = 1; END; UPDATE z SET b = 2")
    val g = IfLadderSqlCompiler.regroup(shredded)
    assert(g.length === 3)
    assert(g(1).matches("(?is)^if @n > 0 begin.*end else begin.*end$"))
    // IF <stmt>; ELSE <stmt> — the `;` before ELSE terminates the THEN
    val g2 = IfLadderSqlCompiler.regroup(SqlText_split(
      "IF @n > 0 UPDATE t SET a = 1; ELSE UPDATE t SET a = 0; INSERT INTO l SELECT 1"))
    assert(g2.length === 2)
    assert(g2.head.matches("(?is)^if .* else update.*"))
    // a CASE…END inside the block body pairs away — END matching holds
    val g3 = IfLadderSqlCompiler.regroup(SqlText_split(
      "IF @n > 0 BEGIN UPDATE t SET a = CASE WHEN b > 0 THEN 1 ELSE 2 END; " +
        "DELETE FROM t WHERE a = 2; END"))
    assert(g3.length === 1)
    // non-IF scripts regroup to themselves — including literals that
    // contain the keywords (masked scan)
    val plain = SqlText_split(
      "INSERT INTO t VALUES ('begin'); UPDATE t SET a = 'if x begin'; DELETE FROM t")
    assert(IfLadderSqlCompiler.regroup(plain) === plain)
  }
  private def SqlText_split(s: String) =
    graft.patterns.SqlText.splitStatements(s)

  // ---- parse shapes ---------------------------------------------------

  test("parse: ladders, mixed predicates, chain equivalence, declines") {
    val l1 = IfLadderSqlCompiler.parse(
      "IF @n > 0 BEGIN TRUNCATE TABLE t; INSERT INTO t SELECT 1 AS a; END " +
        "ELSE IF EXISTS (SELECT 1 FROM u) UPDATE t SET a = 0 " +
        "ELSE SET @s = 'none'").get
    assert(l1.legs.length === 2)
    assert(l1.legs.head._1.isInstanceOf[IfLadderSqlCompiler.ScalarPred])
    assert(l1.legs(1)._1 ===
      IfLadderSqlCompiler.ExistsPred(false, "SELECT 1 FROM u"))
    assert(l1.legs.head._2 === IfLadderSqlCompiler.Stmts(List(
      "TRUNCATE TABLE t", "INSERT INTO t SELECT 1 AS a"), hadSemi = true))
    assert(l1.otherwise === Some(IfLadderSqlCompiler.Stmts(
      List("SET @s = 'none'"))))
    // a single-statement block whose body carries a `;` (`BEGIN x; END`
    // — the regrouped spelling) is NOT chain-equivalent: the chain's
    // single-statement contract declines the internal `;`
    assert(!IfLadderSqlCompiler.parse(
      "IF @n > 0 BEGIN DELETE FROM t WHERE v < 1; END").get.chainEquivalent)
    // fused TRUNCATE+INSERT text (missing `;`) declines in both owners
    assert(IfLadderSqlCompiler.parse(
      "IF @n > 0 BEGIN TRUNCATE TABLE t INSERT INTO t SELECT 1; " +
        "UPDATE t SET a = 1; END").isEmpty)
    assert(!l1.chainEquivalent && !l1.hasReturn)
    // RETURN as an entire leg
    val l2 = IfLadderSqlCompiler.parse("IF @n = 0 RETURN").get
    assert(l2.legs === List((IfLadderSqlCompiler.ScalarPred("@n = 0"),
      IfLadderSqlCompiler.ReturnExit)) && l2.hasReturn)
    // the r17 chain shapes stay chain-equivalent (they keep their path)
    assert(IfLadderSqlCompiler.parse(
      "IF @n > 0 UPDATE t SET a = 1 ELSE UPDATE t SET a = 0")
      .get.chainEquivalent)
    assert(IfLadderSqlCompiler.parse(
      "IF EXISTS (SELECT 1 FROM u) DELETE FROM t").get.chainEquivalent)
    // …but assignment-shaped single branches are NOT (binding the
    // target would silently turn `SELECT @v = 1` into a projection)
    assert(!IfLadderSqlCompiler.parse(
      "IF @n > 0 SELECT @v = MAX(a) FROM t").get.chainEquivalent)
    assert(!IfLadderSqlCompiler.parse(
      "IF @n > 0 SET @v = 1").get.chainEquivalent)
    // compound predicates (r18): an EXISTS tail rides the scalar fold;
    // an EXISTS-HEADED compound is scalar too — and NOT chain-ownable
    // (IfExists stops at its close paren, IfScalar declines the head)
    assert(IfLadderSqlCompiler.parse(
      "IF @n > 0 AND EXISTS (SELECT 1 FROM u) UPDATE t SET a = 1")
      .get.legs.head._1 === IfLadderSqlCompiler.ScalarPred(
        "@n > 0 AND EXISTS (SELECT 1 FROM u)"))
    val cmp = IfLadderSqlCompiler.parse(
      "IF EXISTS (SELECT 1 FROM u) AND @n > 0 UPDATE t SET a = 1").get
    assert(cmp.legs.head._1 === IfLadderSqlCompiler.ScalarPred(
      "EXISTS (SELECT 1 FROM u) AND @n > 0"))
    assert(!cmp.chainEquivalent)
    // …while a PURE EXISTS head with a branch right after stays the
    // LIMIT-1 ExistsPred (and chain-equivalent for plain branches)
    assert(IfLadderSqlCompiler.parse(
      "IF NOT EXISTS (SELECT 1 FROM u) DELETE FROM t").get.legs.head._1
      === IfLadderSqlCompiler.ExistsPred(true, "SELECT 1 FROM u"))
    // declines: nested control flow inside a block; WHILE; GOTO;
    // mid-block RETURN; EXISTS probe not SELECT-headed; empty pred
    assert(IfLadderSqlCompiler.parse(
      "IF @n > 0 BEGIN IF @m > 0 UPDATE t SET a = 1; END").isEmpty)
    assert(IfLadderSqlCompiler.parse(
      "IF @n > 0 BEGIN WHILE @i < 3 UPDATE t SET a = 1; END").isEmpty)
    assert(IfLadderSqlCompiler.parse(
      "IF @n > 0 BEGIN UPDATE t SET a = 1; RETURN; END").isEmpty)
    assert(IfLadderSqlCompiler.parse(
      "IF EXISTS (EXEC helper) UPDATE t SET a = 1").isEmpty)
    assert(IfLadderSqlCompiler.parse("IF BEGIN UPDATE t SET a=1 END").isEmpty)
    // trailing garbage after a completed ladder declines
    assert(IfLadderSqlCompiler.parse(
      "IF @n > 0 UPDATE t SET a = 1 ELSE UPDATE t SET a = 0 GOTO done").isEmpty)
  }

  // ---- execution: q149 multi-statement branches + conditional SET ----

  test("q149: BEGIN…END branch list executes; conditional SET feeds later statements") {
    import spark.implicits._
    def fresh() = {
      val w = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
        "stage" -> Seq((1L, 120.0), (2L, 80.0)).toDF("id", "v"),
        "tgt" -> Seq((9L, 1.0)).toDF("id", "v"),
        "log" -> Seq.empty[(String, Long)].toDF("status", "n"))
      w.foreach { case (k, f) => f.createOrReplaceTempView(k) }
      w
    }
    // true guard: TRUNCATE+INSERT both run; conditional SET flips the
    // status a LATER statement reads back — the executor's variable
    // state is in reach from the dispatcher (the r17 chain could not)
    val w1 = fresh()
    mkExec(w1)(task(
      "DECLARE @n INT, @status VARCHAR(10) = 'empty'; " +
        "SELECT @n = COUNT(*) FROM stage WHERE v > 100; " +
        "IF @n > 0 BEGIN TRUNCATE TABLE tgt; INSERT INTO tgt SELECT id, v " +
        "FROM stage WHERE v > 100; END; " +
        "IF @n = 0 SET @status = 'none' ELSE SET @status = 'loaded'; " +
        "INSERT INTO log (status, n) VALUES (@status, @n)"))
      .getOrElse(fail("q149 script did not compile"))
    assert(w1("tgt").as[(Long, Double)].collect().toList === List((1L, 120.0)))
    assert(w1("log").as[(String, Long)].head() === (("loaded", 1L)))
    // false guard with no ELSE: block skipped wholesale, nothing staged
    val w2 = fresh()
    mkExec(w2)(task(
      "DECLARE @n INT; SELECT @n = COUNT(*) FROM stage WHERE v > 900; " +
        "IF @n > 0 BEGIN TRUNCATE TABLE tgt; INSERT INTO tgt SELECT id, v " +
        "FROM stage; END; " +
        "UPDATE tgt SET v = v + 1"))
      .getOrElse(fail("false-guard script did not compile"))
    assert(w2("tgt").as[(Long, Double)].collect().toList === List((9L, 2.0)))
    // a later statement inside the taken block sees the earlier one's
    // staging (TRUNCATE then INSERT is the proof above); and the
    // branch's DML sets @@ROWCOUNT for the statement after the IF
    val w3 = fresh()
    mkExec(w3)(task(
      "DECLARE @n INT = 1; " +
        "IF @n > 0 BEGIN DELETE FROM stage WHERE v < 100; END; " +
        "INSERT INTO log (status, n) VALUES ('del', @@ROWCOUNT)"))
      .getOrElse(fail("rowcount-after-block script did not compile"))
    assert(w3("log").as[(String, Long)].head() === (("del", 1L)))
    dropViews("stage", "tgt", "log")
  }

  test("q149 declines: nested IF, undeclared predicate var, malformed block") {
    import spark.implicits._
    val w = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
      "t" -> Seq((1L, 1.0)).toDF("id", "v"))
    w.foreach { case (k, f) => f.createOrReplaceTempView(k) }
    // nested IF inside a block: manual review, never half-run
    assert(mkExec(w)(task(
      "DECLARE @n INT = 1; IF @n > 0 BEGIN IF @n > 1 UPDATE t SET v = 2; " +
        "END")).isEmpty)
    // predicate over an undeclared variable: decline, never guess
    assert(mkExec(w)(task(
      "DECLARE @n INT = 1; IF @m > 0 BEGIN UPDATE t SET v = 2; DELETE " +
        "FROM t WHERE v = 9; END")).isEmpty)
    // BEGIN without END swallows the script tail and fails the parse
    assert(mkExec(w)(task(
      "DECLARE @n INT = 1; IF @n > 0 BEGIN UPDATE t SET v = 2; " +
        "DELETE FROM t WHERE v = 9")).isEmpty)
    // unwrapped two-verb "branch" (no `;`, no BEGIN) reaches the
    // single-statement compilers as trailing garbage and declines
    assert(mkExec(w)(task(
      "DECLARE @n INT = 1; IF @n > 0 TRUNCATE TABLE t INSERT INTO t " +
        "SELECT 2, 2.0")).isEmpty)
    assert(w("t").count() === 1L)
    dropViews("t")
  }

  test("@@ROWCOUNT: the predicate reads the pre-IF count; a branch read follows branch DML") {
    import spark.implicits._
    val w = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
      "rc_t" -> Seq((1L, 5.0), (2L, 8.0), (3L, 12.0)).toDF("id", "v"),
      "rc_log" -> Seq.empty[Long].toDF("n"))
    w.foreach { case (k, f) => f.createOrReplaceTempView(k) }
    // the first DELETE sets @@ROWCOUNT=2; the predicate reads THAT.
    // Inside the taken block, the second DELETE affects 1 row and the
    // INSERT's @@ROWCOUNT must read 1 — the point-of-read contract: a
    // whole-statement substitution would have baked the stale pre-IF 2
    // into the branch text
    mkExec(w)(task(
      "DELETE FROM rc_t WHERE v < 10; " +
        "IF @@ROWCOUNT > 0 BEGIN DELETE FROM rc_t WHERE v >= 10; " +
        "INSERT INTO rc_log (n) VALUES (@@ROWCOUNT); END"))
      .getOrElse(fail("rowcount-ladder script did not compile"))
    assert(w("rc_log").as[Long].collect().toList === List(1L),
      "branch @@ROWCOUNT must read the branch DML's count, not the pre-IF count")
    assert(w("rc_t").count() === 0L)
    // a predicate @@ROWCOUNT with NO countable predecessor declines
    val w2 = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
      "rc_t" -> Seq((1L, 5.0)).toDF("id", "v"))
    w2.foreach { case (k, f) => f.createOrReplaceTempView(k) }
    assert(mkExec(w2)(task(
      "IF @@ROWCOUNT > 0 BEGIN DELETE FROM rc_t WHERE v < 10; " +
        "DELETE FROM rc_t WHERE v >= 10; END")).isEmpty)
    dropViews("rc_t", "rc_log")
  }

  // ---- execution: q150 ELSE IF cascade --------------------------------

  test("q150: ELSE IF cascade is first-match; EXISTS and scalar legs mix") {
    import spark.implicits._
    def fresh() = {
      val w = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
        "m" -> Seq((1L, 55.0)).toDF("id", "v"),
        "out" -> Seq.empty[(String, Double)].toDF("band", "v"))
      w.foreach { case (k, f) => f.createOrReplaceTempView(k) }
      w
    }
    def ladder(hi: Double, lo: Double) =
      s"DECLARE @v FLOAT; SELECT @v = MAX(v) FROM m; " +
        s"IF @v >= $hi INSERT INTO out (band, v) VALUES ('high', @v) " +
        s"ELSE IF EXISTS (SELECT 1 FROM m WHERE v >= $lo) " +
        s"INSERT INTO out (band, v) VALUES ('mid', @v) " +
        s"ELSE IF @v >= 0 INSERT INTO out (band, v) VALUES ('low', @v) " +
        s"ELSE INSERT INTO out (band, v) VALUES ('neg', @v)"
    // middle leg (EXISTS) fires; legs after the match never evaluate
    val w1 = fresh()
    mkExec(w1)(task(ladder(100.0, 50.0)))
      .getOrElse(fail("cascade did not compile"))
    assert(w1("out").as[(String, Double)].head() === (("mid", 55.0)))
    // first leg fires
    val w2 = fresh()
    mkExec(w2)(task(ladder(10.0, 50.0))).getOrElse(fail("compile"))
    assert(w2("out").as[(String, Double)].head() === (("high", 55.0)))
    // every guard false, no ELSE: vacuous skip
    val w3 = fresh()
    mkExec(w3)(task(
      "DECLARE @v FLOAT; SELECT @v = MAX(v) FROM m; " +
        "IF @v > 100 INSERT INTO out (band, v) VALUES ('a', @v) " +
        "ELSE IF @v > 99 INSERT INTO out (band, v) VALUES ('b', @v)"))
      .getOrElse(fail("vacuous cascade did not compile"))
    assert(w3("out").count() === 0L)
    // compound predicates execute: an EXISTS-headed conjunction folds
    // as ONE scalar CASE fact (Spark's native scalar-context EXISTS)
    val w4 = fresh()
    mkExec(w4)(task(
      "DECLARE @v FLOAT; SELECT @v = MAX(v) FROM m; " +
        "IF EXISTS (SELECT 1 FROM m WHERE v > 50) AND @v < 100 " +
        "INSERT INTO out (band, v) VALUES ('both', @v) " +
        "ELSE INSERT INTO out (band, v) VALUES ('nope', @v)"))
      .getOrElse(fail("compound predicate did not compile"))
    assert(w4("out").as[(String, Double)].head() === (("both", 55.0)))
    dropViews("m", "out")
  }

  // ---- execution: q151 early-exit RETURN -------------------------------

  test("q151: IF <pred> RETURN exits the batch, commits staged state") {
    import spark.implicits._
    def fresh() = {
      val w = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
        "src" -> Seq((1L, 5.0)).toDF("id", "v"),
        "tgt" -> Seq.empty[(Long, Double)].toDF("id", "v"),
        "log" -> Seq.empty[String].toDF("s"))
      w.foreach { case (k, f) => f.createOrReplaceTempView(k) }
      w
    }
    // guard fires: the INSERT before the exit commits, the statements
    // after it provably never run
    val w1 = fresh()
    mkExec(w1)(task(
      "DECLARE @n INT; SELECT @n = COUNT(*) FROM src WHERE v > 100; " +
        "INSERT INTO log (s) VALUES ('checked'); " +
        "IF @n = 0 RETURN; " +
        "INSERT INTO tgt SELECT id, v FROM src; " +
        "INSERT INTO log (s) VALUES ('loaded')"))
      .getOrElse(fail("early-exit script did not compile"))
    assert(w1("log").as[String].collect().toList === List("checked"))
    assert(w1("tgt").count() === 0L)
    // guard does not fire: the whole script runs
    val w2 = fresh()
    mkExec(w2)(task(
      "DECLARE @n INT; SELECT @n = COUNT(*) FROM src WHERE v > 1; " +
        "IF @n = 0 RETURN; " +
        "INSERT INTO tgt SELECT id, v FROM src; " +
        "INSERT INTO log (s) VALUES ('loaded')"))
      .getOrElse(fail("non-exit script did not compile"))
    assert(w2("tgt").count() === 1L)
    assert(w2("log").as[String].collect().toList === List("loaded"))
    // inside an explicit transaction bracket the exit point's
    // commit/rollback placement is ambiguous: decline to manual review
    val w3 = fresh()
    assert(mkExec(w3)(task(
      "BEGIN TRAN; DECLARE @n INT = 0; IF @n = 0 RETURN; " +
        "INSERT INTO tgt SELECT id, v FROM src; COMMIT")).isEmpty)
    // a bare top-level RETURN outside the owned IF-leg shape keeps
    // declining (mid-body RETURN policy)
    val w4 = fresh()
    assert(mkExec(w4)(task(
      "INSERT INTO tgt SELECT id, v FROM src; RETURN; " +
        "INSERT INTO log (s) VALUES ('x')")).isEmpty)
    dropViews("src", "tgt", "log")
  }

  test("compositions: IF inside a WHILE body; IF block inside a TRY body") {
    import spark.implicits._
    // single-statement IF in a WHILE body: the unroller binds the
    // counter per iteration, the emitted IF re-enters the sequencer
    // and the chain member owns it (guard false on i=1, fires on 2,3)
    val w1 = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
      "wt" -> Seq((1L, 0.0), (2L, 0.0), (3L, 0.0)).toDF("id", "v"))
    w1.foreach { case (k, f) => f.createOrReplaceTempView(k) }
    mkExec(w1)(task(
      "DECLARE @i INT = 1; " +
        "WHILE @i <= 3 BEGIN " +
        "IF @i > 1 UPDATE wt SET v = v + @i WHERE id = @i; " +
        "SET @i = @i + 1; END"))
      .getOrElse(fail("WHILE-body IF did not compile"))
    assert(w1("wt").orderBy("id").as[(Long, Double)].collect().toList
      === List((1L, 0.0), (2L, 2.0), (3L, 3.0)))
    // a multi-statement IF block inside a TRY body: stmtsOf regroups
    // the shredded block exactly like the generic path (r18)
    val w2 = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
      "tt" -> Seq((1L, 5.0), (2L, 50.0)).toDF("id", "v"),
      "tl" -> Seq.empty[String].toDF("s"))
    w2.foreach { case (k, f) => f.createOrReplaceTempView(k) }
    mkExec(w2)(task(
      "BEGIN TRY " +
        "DECLARE @n INT; SELECT @n = COUNT(*) FROM tt WHERE v > 10; " +
        "IF @n > 0 BEGIN UPDATE tt SET v = 0 WHERE v > 10; " +
        "INSERT INTO tl (s) VALUES ('capped'); END; " +
        "END TRY BEGIN CATCH INSERT INTO tl (s) VALUES ('err'); END CATCH"))
      .getOrElse(fail("TRY-body IF block did not compile"))
    assert(w2("tt").orderBy("id").as[(Long, Double)].collect().toList
      === List((1L, 5.0), (2L, 0.0)))
    assert(w2("tl").as[String].collect().toList === List("capped"))
    // an IF BLOCK inside a WHILE body (r18): the unroller regroups the
    // shredded block, validates it loop-body-safe, and emits it per
    // iteration with the counter bound — the ladder executes each copy
    val w2b = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
      "wb" -> Seq((1L, 0.0, 0L), (2L, 0.0, 0L), (3L, 0.0, 0L))
        .toDF("id", "v", "hits"))
    w2b.foreach { case (k, f) => f.createOrReplaceTempView(k) }
    mkExec(w2b)(task(
      "DECLARE @i INT = 1; " +
        "WHILE @i <= 3 BEGIN " +
        "IF @i > 1 BEGIN UPDATE wb SET v = v + @i WHERE id = @i; " +
        "UPDATE wb SET hits = hits + 1 WHERE id = @i; END; " +
        "SET @i = @i + 1; END"))
      .getOrElse(fail("WHILE-body IF block did not compile"))
    assert(w2b("wb").orderBy("id").as[(Long, Double, Long)].collect().toList
      === List((1L, 0.0, 0L), (2L, 2.0, 1L), (3L, 3.0, 1L)))
    // …but a conditional SET of a loop variable (invisible to the
    // driver's variable model) and a RETURN leg both keep the decline
    assert(mkExec(w2b)(task(
      "DECLARE @i INT = 1; WHILE @i <= 3 BEGIN " +
        "IF @i > 1 SET @i = 99; SET @i = @i + 1; END")).isEmpty)
    assert(mkExec(w2b)(task(
      "DECLARE @i INT = 1; WHILE @i <= 3 BEGIN " +
        "IF @i > 1 RETURN; UPDATE wb SET v = 1 WHERE id = @i; " +
        "SET @i = @i + 1; END")).isEmpty)
    spark.catalog.dropTempView("wb")
    // a RETURN leg inside a TRY body stays manual review (batch exit
    // from inside a handler is not this replay's to arbitrate)
    val w3 = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
      "tt" -> Seq((1L, 5.0)).toDF("id", "v"))
    w3.foreach { case (k, f) => f.createOrReplaceTempView(k) }
    assert(mkExec(w3)(task(
      "BEGIN TRY DECLARE @n INT = 0; IF @n = 0 RETURN; " +
        "UPDATE tt SET v = 1; " +
        "END TRY BEGIN CATCH UPDATE tt SET v = 2 END CATCH")).isEmpty)
    dropViews("wt", "tt", "tl")
  }

  test("RAISERROR legs: severity >= 11 aborts mid-script; <= 10 continues; TRY catches") {
    import spark.implicits._
    def fresh() = {
      val w = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
        "gt" -> Seq((1L, 5.0), (2L, 50.0)).toDF("id", "v"),
        "gl" -> Seq.empty[String].toDF("s"))
      w.foreach { case (k, f) => f.createOrReplaceTempView(k) }
      w
    }
    // fired guard (severity 16) aborts the task — nothing commits,
    // GuardBlock's exact message contract
    val w1 = fresh()
    val e = intercept[IllegalArgumentException] {
      mkExec(w1)(task(
        "DECLARE @n INT; SELECT @n = COUNT(*) FROM gt WHERE v > 999; " +
          "IF @n = 0 RAISERROR('stage empty', 16, 1); " +
          "UPDATE gt SET v = 0"))
    }
    assert(e.getMessage.contains("stage empty") &&
      e.getMessage.contains("severity 16"))
    assert(w1("gt").filter("v = 0").count() === 0L, "nothing may commit")
    // informational severity (<= 10): the batch continues
    val w2 = fresh()
    mkExec(w2)(task(
      "DECLARE @n INT; SELECT @n = COUNT(*) FROM gt; " +
        "IF @n > 0 RAISERROR('note: stage has rows', 1, 1); " +
        "UPDATE gt SET v = 0 WHERE v > 10"))
      .getOrElse(fail("informational guard script did not compile"))
    assert(w2("gt").filter("v = 0").count() === 1L)
    // inside a TRY the fired guard is caught; ERROR_MESSAGE binds the
    // text and pre-failure staged state is kept (the q107 contract)
    val w3 = fresh()
    mkExec(w3)(task(
      "BEGIN TRY " +
        "INSERT INTO gl (s) VALUES ('start'); " +
        "DECLARE @n INT; SELECT @n = COUNT(*) FROM gt WHERE v > 999; " +
        "IF @n = 0 RAISERROR('guard tripped', 16, 1); " +
        "UPDATE gt SET v = -1; " +
        "END TRY BEGIN CATCH INSERT INTO gl (s) VALUES (ERROR_MESSAGE()); " +
        "END CATCH"))
      .getOrElse(fail("TRY-guard script did not compile"))
    assert(w3("gt").filter("v = -1").count() === 0L,
      "the statement after the fired guard must not run")
    val logs = w3("gl").as[String].collect().toList
    assert(logs.head === "start" && logs(1).contains("guard tripped"))
    // the guard-only script with an ELSE RAISERROR leg (`IF p
    // RAISERROR(a) ELSE RAISERROR(b)`): GuardBlock's lazy captures
    // must NOT swallow the ELSE into the args (the review's regex-
    // backtracking hazard) — the ladder owns it and fires the RIGHT
    // leg; an N'…' message reports its bare text like T-SQL
    val wEl = fresh()
    val eEl = intercept[IllegalArgumentException] {
      mkExec(wEl)(task(
        "DECLARE @n INT; SELECT @n = COUNT(*) FROM gt WHERE v > 999; " +
          "IF @n > 0 RAISERROR('has rows', 1, 1) " +
          "ELSE RAISERROR(N'no big rows', 16, 1);"))
    }
    assert(eEl.getMessage.contains("RAISERROR: no big rows (severity 16)"),
      s"wrong leg or mangled N-literal message: ${eEl.getMessage}")
    // a RAISERROR leg in an ELSE IF cascade; a @var message binds
    val w4 = fresh()
    val e4 = intercept[IllegalArgumentException] {
      mkExec(w4)(task(
        "DECLARE @m VARCHAR(30) = 'low count'; " +
          "DECLARE @n INT; SELECT @n = COUNT(*) FROM gt; " +
          "IF @n > 100 UPDATE gt SET v = 1 " +
          "ELSE IF @n < 10 RAISERROR(@m, 16, 1)"))
    }
    assert(e4.getMessage.contains("low count"))
    dropViews("gt", "gl")
  }

  // ---- invariant: the IF-EXISTS probe sees STAGED state ---------------

  test("IF-EXISTS probe inside a script reads staged (uncommitted) warehouse state") {
    import spark.implicits._
    val w = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame](
      "wh" -> Seq((1L, 10.0)).toDF("id", "v"),
      "flag" -> Seq.empty[String].toDF("s"))
    w.foreach { case (k, f) => f.createOrReplaceTempView(k) }
    // the INSERT stages id=2 in the overlay only; the probe must see it
    // (the overlay temp view shadows the warehouse name — the
    // load-bearing invariant behind runSelect-routed probes)
    mkExec(w)(task(
      "INSERT INTO wh SELECT 2 AS id, 99.0 AS v; " +
        "IF EXISTS (SELECT 1 FROM wh WHERE id = 2) " +
        "INSERT INTO flag (s) VALUES ('seen') " +
        "ELSE INSERT INTO flag (s) VALUES ('missed')"))
      .getOrElse(fail("staged-probe script did not compile"))
    assert(w("flag").as[String].head() === "seen")
    spark.catalog.dropTempView("wh"); spark.catalog.dropTempView("flag")
  }

  // ---- ledger twins ----------------------------------------------------

  test("ledger twins: ownsBeyondChain / ownsWholeText / scriptFeatures") {
    assert(IfLadderSqlCompiler.ownsBeyondChain(
      "IF @n > 0 BEGIN TRUNCATE TABLE t; INSERT INTO t SELECT 1; END"))
    assert(!IfLadderSqlCompiler.ownsBeyondChain(
      "IF @n > 0 UPDATE t SET a = 1")) // chain-equivalent stays chain
    assert(IfLadderSqlCompiler.ownsWholeText(
      "IF (SELECT COUNT(*) FROM t) > 0 BEGIN TRUNCATE TABLE u; " +
        "INSERT INTO u SELECT * FROM t; END"))
    val feats = graft.patterns.ScriptedSqlExecutor.scriptFeatures(
      "DECLARE @n INT = 1; IF @n > 0 BEGIN TRUNCATE TABLE t; " +
        "INSERT INTO t SELECT 1 AS a; END")
    assert(feats.exists(_.contains("IF ladders")))
    // RETURN under an explicit transaction bracket stays manual review
    assert(graft.patterns.ScriptedSqlExecutor.scriptFeatures(
      "BEGIN TRAN; DECLARE @n INT = 0; IF @n = 0 RETURN; " +
        "INSERT INTO t SELECT 1 AS a; COMMIT").isEmpty)
  }
}
