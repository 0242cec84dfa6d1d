package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.views._

/** Model-based fuzz for incremental aggregate-view maintenance: a
  * seeded random append / delete / upsert sequence runs against a
  * source table; after EVERY refresh the view's final values must
  * equal a from-scratch GROUP BY over the source's current rows —
  * including groups that empty out and reappear, all-null aggregate
  * inputs, and extremum deletions. Deterministic seed. */
class AggViewFuzzSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val groups = Seq("g0", "g1", "g2", "g3", "g4")

  test("randomized source lifecycle: view equals recompute after every refresh") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 2) {
      val loc = java.nio.file.Files.createTempDirectory(s"graft_aggfuzz${trial}_")
        .toString + "/tbl"
      val schema = Seq.empty[(Long, String, Option[Double])].toDF("id", "g", "v").schema
      val src = SpaceDataset.create(spark, loc, schema, Seq("id"))
      var nextId = 0L

      val av = AggregateView.create(spark,
        java.nio.file.Files.createTempDirectory(s"graft_aggfuzzv${trial}_").toString + "/tbl",
        src, Seq("g"), Seq(
          AggSpec.countAll("n"), AggSpec.count("v", "n_v"), AggSpec.sum("v", "sum_v"),
          AggSpec.avg("v", "avg_v"), AggSpec.min("v", "min_v"), AggSpec.max("v", "max_v")))

      def freshRows(n: Int): Seq[(Long, String, Option[Double])] = {
        val rows = (0 until n).map { i =>
          val v = if (rnd.nextInt(10) == 0) None
                  else Some((rnd.nextInt(2000) - 1000).toDouble)
          (nextId + i, groups(rnd.nextInt(groups.size)), v)
        }
        nextId += n
        rows
      }

      for (step <- 1 to 10) {
        rnd.nextInt(5) match {
          case 0 | 1 => // append
            src.append(freshRows(10 + rnd.nextInt(60)).toDF("id", "g", "v"))
          case 2 => // predicate delete (often hits per-group extrema)
            val m = 2 + rnd.nextInt(4)
            src.delete(pmod(col("id"), lit(m.toLong)) === rnd.nextInt(m).toLong)
          case 3 => // delete a whole group (forces group death)
            src.delete(col("g") === groups(rnd.nextInt(groups.size)))
          case 4 => // upsert: rewrite surviving ids of a congruence class
            val survivors = src.readAll().filter(col("id") % 3 === 0)
              .select("id", "g").collect()
              .map(r => (r.getLong(0), r.getString(1))).toSeq
            val batch = survivors.take(40).map { case (id, g) =>
              (id, g, Some((rnd.nextInt(2000) - 1000).toDouble): Option[Double])
            } ++ freshRows(rnd.nextInt(10))
            if (batch.nonEmpty) src.upsert(batch.toDF("id", "g", "v"))
        }
        av.refresh()

        val exp = src.readAll().groupBy("g").agg(
          count(lit(1)).as("n"), count(col("v")).as("n_v"),
          sum("v").as("sum_v"), avg("v").as("avg_v"),
          min("v").as("min_v"), max("v").as("max_v"))
        def norm(df: org.apache.spark.sql.DataFrame) =
          df.select(col("g"), col("n"), col("n_v"),
            round(col("sum_v"), 6).as("sum_v"), round(col("avg_v"), 6).as("avg_v"),
            col("min_v"), col("max_v"))
        val g = norm(av.read())
        val e = norm(exp)
        assert(g.exceptAll(e).isEmpty && e.exceptAll(g).isEmpty,
          s"trial $trial step $step: view != recompute\n" +
            s"view: ${g.orderBy("g").collect().mkString(", ")}\n" +
            s"exp:  ${e.orderBy("g").collect().mkString(", ")}")
      }
    }
  }

  test("adversarial duplicate-value delete cycles: reservoirs stay exact under multisets") {
    // l_quantity-shaped data: FEW distinct values, MANY duplicates per
    // group — the multiset case the extremum reservoir must count
    // exactly (a set-shaped reservoir would drop a value on its FIRST
    // deletion while copies remain). Cycles repeatedly delete SOME
    // copies of the current extremes, then all of them, then re-add.
    val rnd = new scala.util.Random(77L)
    val loc = java.nio.file.Files.createTempDirectory("graft_aggdup_").toString + "/tbl"
    val schema = Seq.empty[(Long, String, Double)].toDF("id", "g", "v").schema
    val src = SpaceDataset.create(spark, loc, schema, Seq("id"))
    val av = AggregateView.create(spark,
      java.nio.file.Files.createTempDirectory("graft_aggdupv_").toString + "/tbl",
      src, Seq("g"), Seq(
        AggSpec.min("v", "min_v"), AggSpec.max("v", "max_v"), AggSpec.countAll("n")))
    var nextId = 0L
    def rows(n: Int): Seq[(Long, String, Double)] = {
      val out = (0 until n).map { i =>
        // values drawn from a 12-value pool: duplicates guaranteed
        (nextId + i, if (rnd.nextBoolean()) "a" else "b", (rnd.nextInt(12) * 2.5))
      }
      nextId += n
      out
    }
    src.append(rows(300).toDF("id", "g", "v"))
    av.refresh()

    def checkEqual(step: String): Unit = {
      val exp = src.readAll().groupBy("g").agg(
        min("v").as("min_v"), max("v").as("max_v"), count(lit(1)).as("n"))
      val got = av.read().select("g", "min_v", "max_v", "n")
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        s"$step: view != recompute\n got ${got.orderBy("g").collect().mkString(", ")}" +
          s"\n exp ${exp.orderBy("g").collect().mkString(", ")}")
    }

    for (cycle <- 1 to 6) {
      // delete PART of the copies at the current per-group max (ids are
      // arbitrary halves), then refresh: the reservoir must DECREMENT,
      // not drop, and the max must stand while copies remain
      val curMax = src.readAll().groupBy("g").agg(max("v").as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val half = src.readAll()
        .filter(col("v") === curMax("a") && col("g") === "a" && col("id") % 2 === 0)
        .select("id").collect().map(_.getLong(0))
      if (half.nonEmpty) {
        src.delete(col("id").isin(half.map(Long.box): _*))
        av.refresh()
        checkEqual(s"cycle $cycle partial-copies delete")
        assert(av.lastRecomputedGroups == 0L,
          s"cycle $cycle: deleting SOME copies of the max must stay arithmetic")
      }
      // now delete ALL remaining copies of that value (max falls to the
      // runner-up — still arithmetic, the reservoir tracks it)
      src.delete(col("g") === "a" && col("v") === curMax("a"))
      av.refresh()
      checkEqual(s"cycle $cycle full-value delete")
      // and re-add duplicates so the next cycle has fresh extremes
      src.append(rows(40 + rnd.nextInt(40)).toDF("id", "g", "v"))
      av.refresh()
      checkEqual(s"cycle $cycle re-add")
    }
  }

  test("adversarial float deletes: FP sums stay EXACTLY equal to recompute") {
    import org.apache.spark.sql.types.DecimalType
    val loc = java.nio.file.Files.createTempDirectory("graft_aggdrift_")
      .toString + "/tbl"
    val schema = Seq.empty[(Long, String, Double)].toDF("id", "g", "v").schema
    val src = SpaceDataset.create(spark, loc, schema, Seq("id"))
    val av = AggregateView.create(spark,
      java.nio.file.Files.createTempDirectory("graft_aggdriftv_").toString + "/tbl",
      src, Seq("g"), Seq(AggSpec.sum("v", "sum_v"), AggSpec.avg("v", "avg_v")))

    // a tiny resident remainder, then repeated add/delete cycles of
    // values 18 orders of magnitude larger: under double subtract-state
    // each cycle's (tiny + 1e12) - 1e12 loses the tiny term's low bits
    // and the drift compounds; decimal state cancels each cycle exactly
    src.append(Seq((0L, "a", 1e-6), (1L, "a", 2.5e-7), (2L, "b", 3e-6))
      .toDF("id", "g", "v"))
    av.refresh()
    var nextId = 10L
    for (cycle <- 1 to 8) {
      val big = (0 until 16).map(i =>
        (nextId + i, if (i % 2 == 0) "a" else "b", 1e12 + i * 0.1))
      nextId += 16
      src.append(big.toDF("id", "g", "v"))
      av.refresh()
      src.delete(col("id") >= 10L) // remove every big row, keep the remainder
      av.refresh()

      // the view must equal the EXACT sum (decimal recompute) with NO
      // rounding tolerance — this is precisely what double subtract-
      // state cannot do after the first cycle
      val exact = src.readAll().groupBy("g").agg(
        sum(col("v").cast(DecimalType(38, 18))).cast("double").as("sum_v"),
        (sum(col("v").cast(DecimalType(38, 18))) / count(col("v")))
          .cast("double").as("avg_v"))
      val got = av.read().select("g", "sum_v", "avg_v")
      assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty,
        s"cycle $cycle drift:\nview: ${got.orderBy("g").collect().mkString(", ")}\n" +
          s"exact: ${exact.orderBy("g").collect().mkString(", ")}")
    }
  }
}
