package graft

/** Plan-shape and semantic invariants for the adapted TPC-H suite
  * (operators.TpchSuite). Value correctness is the driver's DuckDB gate;
  * these tests pin the properties that survive a refactor only if the
  * intended PLAN survives — broadcast sides, semi/anti join strategies,
  * top-N pushdown, and the two-pass (not single-partition-window) Q15.
  */
class TpchSuiteSpec extends SparkSpec {

  private def df(name: String) = SparkEntry.queries(name)(spark, sf)
  private def planOf(name: String): String =
    df(name).queryExecution.executedPlan.toString

  test("every TPC-H query is registered with an oracle and runs non-empty at sf0.001") {
    val names = operators.TpchSuite.defs.map(_.name)
    assert(names.size == 20) // q5 completed the suite in round 12
    for (n <- names) {
      assert(SparkEntry.oracleSql.contains(n), s"$n lacks an oracle")
      // q22's lapsed-customer set and q7's nation-pair slice are the two
      // that could plausibly collapse at the smallest sf — an empty result
      // would make the oracle row a trivial pass, so pin non-emptiness
      assert(df(n).limit(1).count() == 1, s"$n is empty at sf0.001")
    }
  }

  test("q_tpch_q4: EXISTS plans as a semi join, not a join+distinct") {
    val plan = planOf("q_tpch_q4")
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_tpch_q6: all three range predicates reach the parquet scan") {
    val plan = planOf("q_tpch_q6")
    assert(plan.contains("PushedFilters:"), plan)
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(plan.replaceAll("ReadSchema.*", "").contains(c),
        s"$c not pushed to the scan:\n$plan")
  }

  test("q_tpch_q7: both nation legs broadcast; pair filter prunes before the fact shuffle") {
    val plan = planOf("q_tpch_q7")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"nation dims not broadcast:\n$plan")
  }

  test("q_tpch_q8: nation/region legs broadcast; both prunes precede the fact shuffle") {
    val plan = planOf("q_tpch_q8")
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
    // the region prune must reach the region scan, the type prune the
    // part scan — not sit above the 5-way join
    assert(plan.contains("EUROPE"), s"region prune missing:\n$plan")
    assert(plan.contains("ECONOMY"), s"part-type prune missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_tpch_q9: part-type prune reaches the scan; profit stays integer until output") {
    val plan = planOf("q_tpch_q9")
    assert(plan.contains("PROMO"), s"part-type prune missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    import org.apache.spark.sql.types._
    val schema = df("q_tpch_q9").schema
    assert(schema("profit_c").dataType == LongType,
      s"profit must be BIGINT cents, got ${schema("profit_c").dataType}")
  }

  test("q_tpch_q10: top-20 is TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q_tpch_q10")
    assert(plan.contains("TakeOrderedAndProject"), s"top-N not pushed:\n$plan")
    assert(!plan.contains("GlobalLimit"), s"planned a sort+limit instead:\n$plan")
  }

  test("q_tpch_q13: left outer join preserves zero-order customers") {
    val rows = df("q_tpch_q13").collect()
    val covered = rows.map(_.getLong(1)).sum
    val nCustomers = Tables.customer(spark, sf).count()
    assert(covered == nCustomers, "distribution must cover every customer")
    // no fixture customer has ONLY 5-LOW orders, so the zero bucket can't
    // be exercised on real data — pin the join-condition-vs-where
    // semantics (the q13 subtlety) on a synthetic shape instead: the
    // filter must live in the JOIN condition, where it yields c_count=0,
    // not in a WHERE, where it would drop the customer
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val c = Seq(1L, 2L).toDF("c")
    val o = Seq((10L, 1L, "KEEP"), (11L, 2L, "5-LOW")).toDF("ok", "cust", "prio")
    val dist = c.join(o.where(col("prio") =!= "5-LOW"),
        col("c") === col("cust"), "left_outer")
      .groupBy("c").agg(count(col("ok")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(1L -> 1L, 2L -> 0L))
  }

  test("q_tpch_q15: global max is a broadcast two-pass, not a single-partition window") {
    val plan = planOf("q_tpch_q15")
    assert(!plan.contains("Window"), s"single-partition window sneaked in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"max not broadcast back:\n$plan")
  }

  test("q_tpch_q19: disjunctive predicate reaches the lineitem scan as a pushed filter") {
    val plan = planOf("q_tpch_q19")
    // quantity legs OR-ed form a superset filter pushable to the fact scan
    assert(plan.contains("PushedFilters: [Or(") || plan.contains("l_quantity"),
      s"no pushed disjunction:\n$plan")
  }

  test("q_tpch_q22: NOT EXISTS plans as an anti join") {
    val plan = planOf("q_tpch_q22")
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
  }

  test("q_tpch_q2: correlated min decorrelates to an agg join-back; dims broadcast") {
    val plan = planOf("q_tpch_q2")
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    import org.apache.spark.sql.types._
    // the join-back matches on exact integer cents — a double here would
    // reintroduce the boundary-row flake the cents convention exists for
    assert(df("q_tpch_q2").schema("ps_supplycost_c").dataType == LongType)
  }

  test("q_tpch_q11: value-share threshold is an exact integer comparison on a broadcast total") {
    val plan = planOf("q_tpch_q11")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"1-row total not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // supplier nation restriction must reach the partsupp derivation as a
    // semi join, not fan the dim out over the fact
    assert(plan.contains("LeftSemi"), s"nation restriction not a semi join:\n$plan")
  }

  test("q_tpch_q12: ship-year range is pushed to the lineitem scan; lateness is a join residual") {
    val plan = planOf("q_tpch_q12")
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.replaceAll("ReadSchema.*", "").contains("l_shipdate"),
      s"ship-year range not pushed:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_tpch_q16: excluded suppliers drop via a broadcast anti join before the count-distinct") {
    val plan = planOf("q_tpch_q16")
    assert(plan.contains("LeftAnti"), s"exclusion not an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_tpch_q20: qualifying keys reach the supplier dim as a semi join") {
    val plan = planOf("q_tpch_q20")
    assert(plan.contains("LeftSemi"), s"no semi join into the dim:\n$plan")
    assert(plan.contains("SMALL"), s"part-type prune missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_tpch_q21: both EXISTS collapse into one per-order aggregate (two fact scans, not four)") {
    // the textbook translation re-joins lineitem for l2 and l3; the
    // declared plan reads the fact once for the late lines and once for
    // the per-order supplier stats — pin that the extra self-joins never
    // come back
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val logical = df("q_tpch_q21").queryExecution.optimizedPlan
    val factScans = logical.collect {
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.rootPaths.exists(_.toString.contains("lineitem")) => r
    }.size
    assert(factScans <= 2, s"expected <=2 lineitem scans, got $factScans:\n$logical")
    // the two countDistincts plan through Expand — the signature of a
    // real distinct aggregate rather than a join+dedup
    val plan = planOf("q_tpch_q21")
    assert(plan.contains("Expand") || plan.contains("expand"),
      s"no distinct-supplier agg:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_tpch_q21: the aggregate predicate equals the literal double-EXISTS semantics") {
    // nsupp>=2 && nlate==1 must mean exactly "another supplier exists, no
    // other LATE supplier exists" — pinned on a synthetic order set
    // covering all four cases: single-supplier late order (drop),
    // multi-supplier sole-late (keep), multi-supplier two-late (drop),
    // multi-supplier none-late-but-this (drop via late filter)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lines = Seq(
      // (orderkey, suppkey, late)
      (1L, 10L, true),               // alone on the order -> drop
      (2L, 10L, true), (2L, 20L, false), // sole late on multi -> KEEP
      (3L, 10L, true), (3L, 20L, true),  // two late -> drop
      (4L, 10L, false), (4L, 20L, false) // not late -> drop
    ).toDF("ok", "sk", "late")
    val stats = lines.groupBy(col("ok").as("g_ok"))
      .agg(countDistinct("sk").as("nsupp"),
        countDistinct(when(col("late"), col("sk"))).as("nlate"))
    val kept = lines.where(col("late"))
      .join(stats, col("ok") === col("g_ok"))
      .where(col("nsupp") >= 2 && col("nlate") === 1)
      .select("ok", "sk").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.toSeq == Seq((2L, 10L)))
  }
}
