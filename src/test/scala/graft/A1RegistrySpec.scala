package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants — the absence class of failure (a gate silently
  * dropping out of the driver's correctness file, the r6 incident)
  * caught at test time instead of judge time. No Spark session needed.
  */
class A1RegistrySpec extends AnyFunSuite {

  test("every registered query has a unique name and a DuckDB oracle " +
       "(queries ≡ oracleSql key sets); registry size recorded") {
    val all = SparkEntry.allQueries
    val names = all.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(names.forall(_.matches("q\\d+[a-z0-9_]*")),
      names.filterNot(_.matches("q\\d+[a-z0-9_]*")).toString)
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o,
      s"queries without oracle: ${(q -- o).toSeq.sorted}; " +
        s"oracles without query: ${(o -- q).toSeq.sorted}")
    // intentional-growth tripwire: update when adding gates, so an
    // accidental suite-list drop (a ++ edit gone wrong) reads as a
    // hard failure, not a silently smaller correctness file
    assert(all.size === 286, s"registry size changed: ${all.size}")
  }

  test("oracle SQL strings are non-empty and free of engine-local " +
       "artifacts (no absolute /tmp paths, no Spark-only syntax)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(!sql.contains("/tmp/"), s"$name oracle embeds a temp path")
      assert(!sql.toLowerCase.contains("lateral view"),
        s"$name oracle uses Spark-only syntax")
    }
  }
}
