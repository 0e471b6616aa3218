package graft

import org.apache.spark.sql.SparkSession

/**
 * The SQL surface of the native expressions (GraftExtensions) — what a
 * pure-SQL user (the reference's Presto audience) sees.
 */
class ExtensionsSpec extends SparkSpec {

  test("extensions register SQL functions usable from spark.sql") {
    // getOrCreate would reuse the shared suite session, which was built
    // WITHOUT extensions — exercise the late-bind path instead (the
    // extensions path itself is the same registrations list).
    val s: SparkSession = spark.newSession()
    GraftExtensions.register(s)
    val h = s.sql("SELECT graft_poly_hash('ab') AS h").head().getLong(0)
    // (0*31+97)*31+98
    assert(h === (97L * 31 + 98))
    val sig = s.sql(
      "SELECT graft_minhash_sig(graft_shingle_hashes('a b c d', 3), 4) AS s")
      .head().getSeq[Long](0)
    assert(sig.length === 4)
    val dot = s.sql(
      "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot === 11.0)
    val sh = s.sql("SELECT graft_simhash(array(CAST(5 AS BIGINT))) AS s")
      .head().getLong(0)
    assert(sh === 5L) // single feature: its own bits win every vote
    val b = s.sql(
      "SELECT graft_hyperplane_bucket(array(CAST(1.0 AS FLOAT)), 4, 0) AS b")
      .head().getLong(0)
    assert(b >= 0L && b < 16L)
    // cell 1's centroid equals the probe vector -> cosine 1, argmax = 1
    val cell = s.sql(
      """SELECT graft_nearest_cell(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(named_struct('cell_id', CAST(0 AS BIGINT),
        |          'cvec', array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))),
        |        named_struct('cell_id', CAST(1 AS BIGINT),
        |          'cvec', array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))))) AS c""".stripMargin)
      .head().getLong(0)
    assert(cell === 1L)
  }

  test("DESCRIBE FUNCTION reports usable metadata (ExpressionInfo wiring)") {
    val s: SparkSession = spark.newSession()
    GraftExtensions.register(s)
    val desc = s.sql("DESCRIBE FUNCTION EXTENDED graft_poly_hash")
      .collect().map(_.getString(0)).mkString("\n")
    // function resolves under its own name and the usage text is in the
    // usage field (the 3-arg ExpressionInfo ctor garbled this: usage
    // landed in the name slot)
    assert(desc.contains("Function: graft_poly_hash"))
    assert(desc.contains("mod-prime polynomial rolling hash"))
    assert(desc.contains("Class: graft.functions.PolyHashExpr"))
  }
}
