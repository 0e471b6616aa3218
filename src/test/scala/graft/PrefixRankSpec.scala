package graft

import graft.ops.PrefixRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Differential evidence for the bucketed prefix-rank operator: on small
 * corpora it must be row-identical to the per-key window formulation it
 * replaces at scale (`row_number()/sum() OVER (PARTITION BY group ORDER
 * BY key, tie)`), across seeds, group skew, duplicate keys, null groups
 * and degenerate bucket counts — because at 100 TB only the bucketed
 * shape runs, so the window itself becomes the sequential reference.
 */
class PrefixRankSpec extends SparkSpec {
  import spark.implicits._

  private val Bound = 1000000007L

  /** Seeded corpus: skewed groups (incl. nulls), duplicate keys spread
    * across the key space, small values for running sums. */
  private def corpus(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val grp = rnd.nextInt(10) match {
        case 0 => None // null group is its own partition
        case k if k <= 6 => Some("hot") // 60% of rows in one group
        case k => Some(s"g$k")
      }
      // duplicate keys from a small pool, scaled to span buckets
      (i.toLong, grp, rnd.nextInt(40).toLong * 25000000L, rnd.nextInt(50).toLong)
    }.toDF("id", "grp", "key", "v")
  }

  private def reference(df: org.apache.spark.sql.DataFrame, grouped: Boolean) = {
    val w =
      if (grouped) Window.partitionBy("grp").orderBy("key", "id")
      else Window.orderBy("key", "id")
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum_v",
        sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "rnk", "cum_v")
  }

  test("keyedPrefix ≡ per-group window (rank + running sum) across seeds and bucket counts") {
    for (seed <- Seq(1L, 7L, 42L); b <- Seq(1, 3, 8)) {
      val df = corpus(seed, 400)
      val got = PrefixRank.keyedPrefix(df, Seq("grp"), col("key"), Bound,
        col("id"), sums = Seq((col("v"), "cum_v")), buckets = b)
        .select("id", "rnk", "cum_v")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val want = reference(df, grouped = true)
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(got === want, s"seed=$seed buckets=$b")
    }
  }

  test("keyedPrefix with no group ≡ global window rank (the epoch-shuffle shape)") {
    val df = corpus(13L, 300)
    val got = PrefixRank.keyedPrefix(df, Nil, col("key"), Bound, col("id"),
      sums = Seq((col("v"), "cum_v")), buckets = 5)
      .select("id", "rnk", "cum_v")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val want = reference(df, grouped = false)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === want)
  }

  test("keyedPrefix result is independent of input partitioning and order") {
    val df = corpus(99L, 250)
    val a = PrefixRank.keyedPrefix(df, Seq("grp"), col("key"), Bound, col("id"))
      .select("id", "rnk").as[(Long, Long)].collect().sortBy(_._1)
    val b = PrefixRank.keyedPrefix(
      df.repartition(7).sortWithinPartitions(desc("v")),
      Seq("grp"), col("key"), Bound, col("id"))
      .select("id", "rnk").as[(Long, Long)].collect().sortBy(_._1)
    assert(a === b)
  }

  test("a null or out-of-range order key fails loudly instead of dropping rows") {
    val df = Seq((1L, "g", Some(5L)), (2L, "g", None))
      .toDF("id", "grp", "key")
    val ex = intercept[Exception] {
      PrefixRank.keyedPrefix(df, Seq("grp"), col("key"), Bound, col("id"))
        .collect()
    }
    assert(ex.getMessage.contains("prefixRank") ||
      ex.getCause != null && ex.getCause.getMessage.contains("prefixRank"))
    val oob = Seq((1L, "g", Bound + 5L)).toDF("id", "grp", "key")
    intercept[Exception] {
      PrefixRank.keyedPrefix(oob, Seq("grp"), col("key"), Bound, col("id"))
        .collect()
    }
  }

  test("keyedPrefix keeps every input row and every input column") {
    val df = corpus(5L, 200)
    val out = PrefixRank.keyedPrefix(df, Seq("grp"), col("key"), Bound, col("id"))
    assert(out.columns.toSet === Set("id", "grp", "key", "v", "rnk"))
    assert(out.count() === 200L)
    assert(out.select("id").distinct().count() === 200L)
  }
}
