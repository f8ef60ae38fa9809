package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression, IntegerLiteral}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automated successor of the manual [[Explain]] pass: walks EVERY
  * registered driver query's plan and asserts the properties the
  * 100 TB posture depends on — so a regression that re-introduces an
  * unbounded nested-loop join, loses a parquet pushdown, or drops the
  * salted-join shape fails CI instead of surviving in prose.
  *
  * The loop-join rule is semantic, not a name whitelist: a join with
  * no equi-key (physical BroadcastNestedLoopJoin / CartesianProduct)
  * is legal ONLY when one side is PROVABLY row-bounded from the plan
  * itself (a groupless aggregate's 1 row, a literal frame, a limit, or
  * products/unions of those) — the "1-row broadcast totals" pattern.
  * Corpus × corpus stays illegal no matter what name it hides under.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(8, "graft-planaudit")
  val sf = "/root/testdata/sf0.001"

  /** A loop join's small side may be at most this many rows (as proven
    * by the plan): covers 1-row totals, centroid/codebook frames, and
    * top-N threshold frames with comfortable margin, while anything
    * corpus-shaped (file scan, explode) stays unprovable → flagged.
    */
  private val LoopJoinBound = BigInt(4096)

  /** Provable upper bound on a plan's row count, or None. Mirrors
    * Catalyst's `maxRows` but fills the gaps that matter here
    * (literal local frames; recursion through the shapes our plans
    * use). Growth nodes (Generate/explode) deliberately return None —
    * an exploded side is corpus-shaped by definition.
    */
  private def bounded(p: LogicalPlan): Option[BigInt] =
    p.maxRows.map(BigInt(_)).orElse(p match {
      case lr: LocalRelation => Some(BigInt(lr.data.length))
      case a: Aggregate if a.groupingExpressions.isEmpty => Some(BigInt(1))
      case g: GlobalLimit => g.limitExpr match {
        case IntegerLiteral(n) => Some(BigInt(n))
        case _ => None
      }
      case j: Join =>
        for { l <- bounded(j.left); r <- bounded(j.right) } yield l * r
      case u: Union =>
        u.children.foldLeft(Option(BigInt(0))) { (acc, c) =>
          for { a <- acc; b <- bounded(c) } yield a + b
        }
      case e: Expand => bounded(e.child).map(_ * e.projections.size)
      // shrinking / row-preserving unaries: the child's bound holds
      case _: Project | _: Filter | _: Sort | _: SubqueryAlias |
           _: Window | _: Repartition | _: RepartitionByExpression |
           _: Deduplicate | _: Aggregate | _: LocalLimit | _: Sample =>
        bounded(p.asInstanceOf[UnaryNode].child)
      case _ => None
    })

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Does the join have at least one equi-key (one side's references
    * entirely from the left child, the other's from the right)? Those
    * become hash/sort-merge joins — bounded by the key distribution,
    * audited per-operator, not here.
    */
  private def hasEquiKey(j: Join): Boolean = {
    def oneEachSide(a: Expression, b: Expression): Boolean =
      (a.references.nonEmpty && b.references.nonEmpty) &&
        ((a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
          (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet)))
    j.condition.toSeq.flatMap(splitConj).exists {
      case EqualTo(a, b) => oneEachSide(a, b)
      case EqualNullSafe(a, b) => oneEachSide(a, b)
      case _ => false
    }
  }

  /** Every join in `df`'s optimized plan that would execute as a
    * nested loop (no equi-key) without a provably bounded OR
    * declared-bounded side. An explicit broadcast() hint counts as
    * declared: it is a deliberate, visible authorial claim that the
    * side is bounded (backed by the operator's own runtime guard —
    * e.g. dedup_embedding's maxRows probe — and failing LOUDLY on a
    * broken claim). The audit hunts the ACCIDENTAL unbounded loop
    * join, which never carries a hint.
    */
  private def unboundedLoopJoins(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if !hasEquiKey(j) =>
        def declared(h: Option[HintInfo]) = h.exists(_.strategy.contains(BROADCAST))
        val lb = bounded(j.left)
        val rb = bounded(j.right)
        if (Seq(lb, rb).flatten.exists(_ <= LoopJoinBound) ||
            declared(j.hint.leftHint) || declared(j.hint.rightHint)) None
        else Some(s"${j.joinType} join with no equi-key and no bounded side " +
          s"(left=$lb right=$rb): ${j.simpleString(3)}")
    }.flatten

  // --- the audited property set --------------------------------------

  test("every registered query: loop joins only against provably bounded sides") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, mk) =>
      try unboundedLoopJoins(mk(spark, sf)).map(v => s"$name: $v")
      catch { case e: Throwable => Seq(s"$name: plan construction failed: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("known-pushdown queries keep their filters at the parquet scan") {
    // name -> substring that must appear inside a PushedFilters list
    val expect = Seq(
      "text_search" -> "StringContains(text,vector)",
      "vdb_get_by_id" -> "EqualTo(vec_id,",
      "vdb_knn_filtered" -> "EqualTo(label,",
      "text_bm25_indexed" -> "In(term",
      "text_bm25_filtered" -> "In(term",
      "text_phrase_indexed" -> "In(term",
      "text_phrase_filtered" -> "In(term",
      "text_phrase_mixed" -> "In(term")
    val failures = expect.flatMap { case (name, marker) =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      if (plan.contains("PushedFilters") && plan.contains(marker)) Nil
      else Seq(s"$name: expected pushed filter '$marker' at the scan")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("id-only queries prune the text/value columns at the scan") {
    // a scan that reads all columns for an id-only projection is the
    // quiet 100 TB killer: `text` is ~95% of the documents table's
    // bytes. These queries derive everything from ids — their scans
    // must never list a payload column in ReadSchema.
    val expect = Seq(
      "corpus_shuffle" -> "text:",
      "split_assign" -> "text:",
      "q_distinct_users" -> "value:")
    val failures = expect.flatMap { case (name, payloadCol) =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val schemas = "ReadSchema: \\S+".r.findAllIn(plan).toSeq
      if (schemas.nonEmpty && !schemas.exists(_.contains(payloadCol))) Nil
      else Seq(s"$name: payload column must be pruned from every scan, " +
        s"got ${schemas.mkString("; ")}")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the knn join keeps its fused, population-adaptive salted shape") {
    val qe = SparkEntry.queries("vdb_knn_join_ivf")(spark, sf).queryExecution
    val plan = qe.optimizedPlan.toString
    assert(plan.contains("__salt") && plan.contains("__pk"),
      "vdb_knn_join_ivf must join on the PACKED population-adaptive salt key " +
        "(ShardTopKJoin.packSalted) — the streaming/pinned-partitioning skew defense")
    assert(plan.contains("ShardTopKJoin"),
      "vdb_knn_join_ivf must score through the fused ShardTopKJoin node, " +
        "not a materialized join + ObjectHashAggregate walk")
    assert(qe.executedPlan.toString.contains("ShardTopKJoin"),
      "the fused node must survive to the physical plan")
  }

  test("the filtered knn join is salted AND filters the corpus before scoring") {
    val qe = SparkEntry.queries("vdb_knn_join_filtered")(spark, sf).queryExecution
    assert(qe.optimizedPlan.toString.contains("__pk") &&
        qe.optimizedPlan.toString.contains("ShardTopKJoin"),
      "vdb_knn_join_filtered must keep the fused packed-salt shape")
    // filter-THEN-search: the label predicate must reach the parquet
    // scan (below the shard projection and the join), not post-filter
    // a scored top-k
    val physical = qe.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("EqualTo(label,"),
      "the metadata predicate must be pushed to the corpus scan")
  }

  // --- meta-test: the audit actually catches the bad shapes ----------

  test("meta: a corpus-by-corpus loop join is caught") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    // non-equi theta join between two unbounded scans — the exact
    // shape the audit exists to block
    val bad = docs.as("a").join(Tables.documents(spark, sf).as("b"),
      col("a.doc_id") < col("b.doc_id"))
    assert(unboundedLoopJoins(bad).nonEmpty,
      "the audit must flag an unbounded theta join")
    // the allowed pattern: the same scan against a 1-row global total
    val ok = docs.crossJoin(docs.agg(count(lit(1)).as("n")))
    assert(unboundedLoopJoins(ok).isEmpty,
      "a 1-row broadcast total must stay legal")
    // and a bounded literal frame
    val okLit = docs.crossJoin(Seq((1, 2)).toDF("x", "y"))
    assert(unboundedLoopJoins(okLit).isEmpty)
  }
}
