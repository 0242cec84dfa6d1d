package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: the query/oracle maps must stay
  * mutually consistent, or the round gate silently shrinks (a dangling
  * oracle key would crash the driver's compare; a query without an
  * oracle must be a DELIBERATE rows-only entry). */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("rows-only queries are exactly the documented set") {
    // empty since round 6: v_ann_ivf_kmeans gained a golden oracle once
    // fixed-point Lloyd means made its training bit-deterministic
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set.empty[String],
      s"undocumented rows-only queries: $rowsOnly")
  }

  test("query names follow the gate's prefix convention") {
    val prefixes = Set("q", "s", "d", "v", "e", "m")
    val bad = SparkEntry.queries.keySet.filterNot(n =>
      prefixes.contains(n.takeWhile(_ != '_')) ||
        prefixes.exists(p => n.startsWith(p) && n.drop(p.length).headOption.forall(_.isDigit)))
    assert(bad.isEmpty, s"unconventional names: $bad")
  }

  test("no duplicate query names across module maps") {
    val maps = Seq(
      operators.Relational.queries, operators.StorageOps.queries,
      operators.Pipeline.queries, operators.Curation.queries,
      operators.Multimodal.queries, operators.ExtrasOps.queries,
      operators.Scalars.queries, operators.Semantics.queries,
      streaming.EventsStream.queries)
    val total = maps.map(_.size).sum
    assert(total == SparkEntry.queries.size,
      s"module maps overlap: $total entries collapse to ${SparkEntry.queries.size}")
  }
}
