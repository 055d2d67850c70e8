package graft

import org.apache.spark.sql.functions._
import graft.ops.{SimilarityOps, ValidationOps}

class ValidationSpec extends SparkTestBase {
  import spark.implicits._

  test("runChecks: planted nulls/dupes/range/domain violations counted " +
       "exactly in one pass; clean checks pass") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "O"), (2L, -5.0, "F"), (2L, 0.0, "X"),
      (null, 7.0, "P"), (4L, null, "O")
    ).toDF("k", "price", "status")
    val out = ValidationOps.runChecks(df, Seq(
        "k_not_null" -> ValidationOps.notNull($"k"),
        "k_unique" -> ValidationOps.unique($"k"),
        "price_positive" -> ValidationOps.satisfies($"price" > 0),
        "status_domain" -> ValidationOps.satisfies($"status".isin("O", "F", "P"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("k_not_null") === ((1L, 5L, false)))
    // distinct non-null keys {1,2,4} = 3; count_distinct ignores null → 5-3=2
    assert(out("k_unique") === ((2L, 5L, false)))
    // -5 fails, 0 fails, null fails (3VL coalesced to fail) → 3
    assert(out("price_positive") === ((3L, 5L, false)))
    assert(out("status_domain") === ((1L, 5L, false)))
    val clean = ValidationOps.runChecks(
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"),
      Seq("k_not_null" -> ValidationOps.notNull($"k"))).collect().head
    assert(clean.getBoolean(3))
  }

  test("riViolations: orphans and null FKs counted, total = child rows") {
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq[java.lang.Long](10L, 10L, 99L, null)
      .toDF("fk")
    val r = ValidationOps
      .riViolations(child, "fk", parent, "pk", "fk_ri").collect().head
    assert(r.getString(0) === "fk_ri")
    assert(r.getLong(1) === 2L) // orphan 99 + null fk
    assert(r.getLong(2) === 4L)
    assert(!r.getBoolean(3))
  }

  test("quantizedTopK: excludes self, respects k, and recalls the exact " +
       "cosine top-1 on well-separated clusters") {
    // two tight clusters; nearest neighbor of each point is in-cluster
    val base = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val vecs = (0 until 20).map { i =>
      val b = base(i % 2)
      (i.toLong, b.zipWithIndex.map { case (v, d) =>
        v + 0.01f * ((i * 7 + d) % 5) }.map(_ * (1f + i % 3)))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val out = SimilarityOps.quantizedTopK(
      vecs, "vec_id", "embedding", queries, "query_id", "qvec", k = 3)
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size === 4)
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 3)
      assert(rows.forall(_.getLong(1) != q), "self excluded")
      // top-1 neighbor shares the query's cluster (same parity)
      val top = rows.minBy(_.getInt(3))
      assert(top.getLong(1) % 2 === q % 2, s"cluster recall for q=$q")
    }
  }

  test("quantizedTopK: corpus and query id columns may share a name " +
       "(self-query), and mixed-dim candidates are dropped, not " +
       "null-ranked") {
    val vecs = (0 until 10).map(i =>
      (i.toLong, Array(1f + i, 2f, 3f))).toDF("vec_id", "embedding")
    // same column names on both sides — previously an ambiguous-
    // reference analysis failure
    val out = SimilarityOps.quantizedTopK(
      vecs, "vec_id", "embedding",
      vecs.limit(2), "vec_id", "embedding", k = 3)
    assert(out.columns.toSeq ===
      Seq("vec_id", "vec_id_corpus", "score_q", "rank"))
    val rows = out.collect()
    assert(rows.length === 6)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // a dim-2 intruder never scores against dim-3 queries
    val mixed = vecs.unionByName(
      Seq((99L, Array(9f, 9f))).toDF("vec_id", "embedding"))
    val got = SimilarityOps.quantizedTopK(
        mixed, "vec_id", "embedding",
        vecs.limit(2), "vec_id", "embedding", k = 100)
      .filter($"vec_id_corpus" === 99L).count()
    assert(got === 0L)
  }

  test("unique: every null-key row counts as a violation (documented " +
       "strict semantics), non-null duplicates count as rows - distinct") {
    import graft.ops.ValidationOps
    val df = Seq(Some(1L), Some(2L), Some(2L), None, None)
      .toDF("k")
    val r = ValidationOps.runChecks(df,
      Seq("k_unique" -> ValidationOps.unique($"k"))).head
    // 5 rows, 2 distinct non-null keys -> 3 violations (dup 2 + both nulls)
    assert(r.getLong(1) === 3L)
  }
}
