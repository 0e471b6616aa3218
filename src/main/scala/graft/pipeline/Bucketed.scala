package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed table layout as a first-class operator — the co-located
 * fact-fact join story for 100 TB (SURVEY.md §2.5 joins): both sides of
 * a recurring join are written bucketed (and sorted) on the join key
 * into the SAME bucket count, so their bucket files are partitioned
 * identically ON DISK and the join plans with NO exchange on either
 * side (q219 pins zero `Exchange hashpartitioning`); a `key = literal`
 * predicate prunes the scan to ONE bucket file (q234 pins
 * `SelectedBucketsCount: 1 out of N`). At scale that is the difference
 * between re-shuffling terabytes per query and a local merge per
 * bucket pair — paid once at write time.
 *
 * THE BUCKET-COUNT-MUST-MATCH RULE: Spark co-locates a join only when
 * both tables were bucketed on the join key with the SAME `nBuckets`
 * (hash placement is `murmur3(key) pmod nBuckets` — different counts
 * map the same key to different files, and the planner re-shuffles).
 * Write every table of a join family with one agreed bucket count.
 *
 * Layout invariant: bucketing lives in the FILE-NAME ↔ bucket mapping
 * (`part-…_00003` = bucket 3). Any job that rewrites the directory
 * without `bucketBy` — compaction above all — silently destroys the
 * mapping while the catalog still promises it, and every later join
 * returns WRONG results (rows hash to buckets the files no longer
 * honor). [[write]] therefore stamps a [[Marker]] file at the data
 * root, and [[Maintenance.compactDir]]/[[Maintenance
 * .compactHivePartitioned]] refuse loudly when they see it; evolving a
 * bucketed table means re-running [[write]] (which rewrites the whole
 * layout with the bucket spec intact).
 *
 * Reference behavior: the reference's Spark notebook lands plain
 * year/month/day partitions (spark-notebook ipynb cells 4-5); bucketed
 * layout is this engine's scale path for the join-heavy analytics the
 * reference runs downstream.
 */
object Bucketed {

  /** Marker file stamped at a bucketed table's data-dir root; the
    * maintenance jobs key their refusal off it. */
  val Marker = "_graft_buckets"

  /**
   * Write `df` as an EXTERNAL bucketed table: data under `path`,
   * registered in the session catalog as `tableName`, bucketed and
   * sorted on `key` into `nBuckets` bucket files. Idempotent
   * re-registration: a stale catalog entry from an earlier JVM (or a
   * partially-failed save) is dropped first and the data dir is
   * overwritten — never `ErrorIfExists` against a persistent metastore.
   */
  def write(df: DataFrame, tableName: String, path: String, key: String,
      nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    df.write.format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(tableName)
    // marker LAST — only a fully-landed layout gets the stamp
    val p = new Path(path, Marker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"key=$key\nbuckets=$nBuckets\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** The registered bucketed table — reads carry the bucket spec from
    * the catalog, which is what enables exchange-free joins and
    * single-bucket point-lookup pruning. */
  def read(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** True iff `dir` is the data root of a bucketed table ([[Marker]]
    * present) — the predicate the maintenance jobs refuse on. */
  def isBucketedDir(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, Marker)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
