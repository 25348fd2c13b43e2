package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write–audit–publish (io9) — the lakehouse commit protocol that
  * keeps readers from ever seeing an unvalidated batch: write the new
  * version to an underscore-prefixed STAGING directory (invisible to
  * Spark readers), run the declarative quality gate over the staged
  * files AS WRITTEN (auditing the input frame would miss write-path
  * corruption), and only then atomically promote it to a versioned
  * directory and swap the `_current` pointer. A failed audit leaves
  * the staging output quarantined under `_rejected_v<n>` and the
  * previous published version untouched — readers resolve the pointer
  * and never observe a partial or invalid state.
  *
  * Scale notes: the protocol adds exactly one metadata rename and one
  * pointer-file write per batch, independent of data size; the audit
  * is [[graft.quality.Checks.report]]'s single shared-aggregate pass
  * over the staged data. On HDFS/local the directory rename is
  * atomic; on object stores the versioned-directory layout is what
  * makes the scheme safe anyway (the pointer swap, not the rename, is
  * the commit point — the same reasoning as Iceberg/Delta pointer
  * commits). */
object Wap {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def currentVersion(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val p = new Path(root, "_current")
    if (!f.exists(p)) 0
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toInt
      finally in.close()
    }
  }

  /** Stage → audit → publish. @return (published?, audit report). */
  def publish(df: DataFrame, root: String,
      rules: Seq[(String, Column)]): (Boolean, DataFrame) = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val next = {
      // next version = 1 + max existing v=<n> (rejected runs burn no
      // version numbers — the pointer only ever moves to a valid dir)
      val rootPath = new Path(root)
      if (!f.exists(rootPath)) 1
      else f.listStatus(rootPath).map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toInt)
        .foldLeft(0)(math.max) + 1
    }
    val staging = new Path(root, s"_staging_v$next")
    df.write.mode("overwrite").parquet(staging.toString)
    val staged = spark.read.parquet(staging.toString)
    // materialized BEFORE the promotion rename: the report is returned
    // to the caller and must not lazily re-read a path that the
    // publish/quarantine step is about to move
    val report = graft.quality.Checks.report(staged, rules)
      .localCheckpoint()
    val pass = report.agg(min(col("pass")).as("ok"))
      .collect().head.getBoolean(0)
    if (pass) {
      f.rename(staging, new Path(root, s"v=$next"))
      val tmp = new Path(root, "_current_tmp")
      val out = f.create(tmp, true)
      try out.write(next.toString.getBytes("UTF-8"))
      finally out.close()
      val cur = new Path(root, "_current")
      f.delete(cur, false)
      f.rename(tmp, cur)
    } else {
      f.rename(staging, new Path(root, s"_rejected_v$next"))
    }
    (pass, report)
  }

  /** Read whatever version the pointer currently names. */
  def readPublished(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root)
    require(v > 0, s"nothing published under $root")
    spark.read.parquet(s"$root/v=$v")
  }

  /** TIME TRAVEL (io11): read a specific published snapshot version —
    * the Iceberg/Delta `VERSION AS OF` primitive the versioned-
    * directory layout gives for free: every publish keeps its
    * predecessor's directory intact (the pointer moves, data never
    * mutates), so any audit, backfill reproduction, or A/B-against-
    * yesterday reads an older version by number with zero extra
    * storage machinery. Rejected batches burn no version numbers, so
    * the sequence 1..currentVersion is dense. */
  def readVersion(spark: SparkSession, root: String,
      version: Int): DataFrame = {
    val f = fs(spark, root)
    require(version > 0 && f.exists(new Path(root, s"v=$version")),
      s"version $version does not exist under $root")
    spark.read.parquet(s"$root/v=$version")
  }

  /** The published-version history: (version, is_current), ascending —
    * the snapshot catalog a lakehouse surfaces as `DESCRIBE HISTORY`.
    * Metadata-only (one directory listing + one pointer read). */
  def versions(spark: SparkSession, root: String): Seq[(Int, Boolean)] = {
    val f = fs(spark, root)
    val cur = currentVersion(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt)
      .sorted.toSeq
      .map(v => (v, v == cur))
  }
}
