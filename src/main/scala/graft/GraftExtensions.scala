package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers graft's native
 * expressions as SQL functions, so the pure-SQL surface (spark.sql /
 * thriftserver users — the audience the reference served via Presto,
 * README "Querying with Presto") can call the same codepaths the
 * DataFrame API uses.
 *
 * Activate with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
 * `.withExtensions(new GraftExtensions)`.
 *
 * SQL surface:
 *  - graft_poly_hash(str) -> bigint
 *  - graft_shingle_hashes(str, n) -> array<bigint>   (with multiplicity)
 *  - graft_minhash_sig(array<bigint>, perms) -> array<bigint>
 *  - graft_simhash(array<bigint>) -> bigint
 *  - graft_vec_dot(array<float>, array<float>) -> double
 *  - graft_hyperplane_bucket(array<float>, nbits, offset) -> bigint
 *  - graft_nearest_cell(array<float>, array<struct<cell_id,cvec>>) -> bigint
 */
object GraftExtensions {
  /** Register the SQL functions on an ALREADY-RUNNING session (the
    * spark.sql.extensions conf only applies at session build time;
    * notebooks and shared test sessions need this late-bind path). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    new GraftExtensions().registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** The function registrations, shared by the extensions path
    * (injectFunction) and the late-bind path (registry.registerFunction). */
  private[graft] val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    val out = Seq.newBuilder[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)]
    // ExpressionInfo's 3-arg constructor is (className, db, name) — passing
    // usage there garbles DESCRIBE FUNCTION metadata; use the 5-arg form
    // with the real expression class so catalogs introspect correctly.
    def register(name: String, usage: String, clazz: Class[_])(builder: PartialFunction[Seq[Expression], Expression]): Unit =
      out += ((new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getCanonicalName, null, name, usage, ""),
        args => builder.applyOrElse(args, (bad: Seq[Expression]) =>
          throw new IllegalArgumentException(
            s"$name: wrong number of arguments (${bad.length}); usage: $usage"))))

    register("graft_poly_hash",
      "graft_poly_hash(str) - mod-prime polynomial rolling hash",
      classOf[PolyHashExpr]) {
      case Seq(s) => PolyHashExpr(s)
    }
    register("graft_deflate_len",
      "graft_deflate_len(str) - DEFLATE-compressed byte count (compression-ratio quality signal)",
      classOf[DeflateLenExpr]) {
      case Seq(s) => DeflateLenExpr(s)
    }
    register("graft_shingle_hashes",
      "graft_shingle_hashes(str, n) - hashes of all n-word shingles",
      classOf[ShingleHashList]) {
      case Seq(s, n) => ShingleHashList(s, intLit(n, "n"))
    }
    register("graft_minhash_sig",
      "graft_minhash_sig(hashes, perms) - MinHash signature",
      classOf[MinHashSigExpr]) {
      case Seq(h, p) => MinHashSigExpr(h, intLit(p, "perms"))
    }
    register("graft_simhash",
      "graft_simhash(hashes) - 32-bit SimHash of feature hashes",
      classOf[SimHashExpr]) {
      case Seq(h) => SimHashExpr(h)
    }
    register("graft_vec_dot",
      "graft_vec_dot(a, b) - in-order double dot product of float arrays",
      classOf[VecDotExpr]) {
      case Seq(a, b) => VecDotExpr(a, b)
    }
    register("graft_hyperplane_bucket",
      "graft_hyperplane_bucket(vec, nbits, offset) - hyperplane LSH bucket",
      classOf[HyperplaneBucketExpr]) {
      case Seq(v, n, o) =>
        HyperplaneBucketExpr(v, intLit(n, "nbits"), intLit(o, "offset"))
    }
    register("graft_nearest_cell",
      "graft_nearest_cell(vec, cents) - argmax-cosine cell_id over array<struct<cell_id,cvec>>",
      classOf[NearestCellExpr]) {
      case Seq(v, c) => NearestCellExpr(v, c)
    }
    out.result()
  }

  override def apply(ext: SparkSessionExtensions): Unit =
    registrations.foreach(ext.injectFunction)
}
