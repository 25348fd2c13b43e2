package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file COMPACTION (io14) — the lake-maintenance job every
  * partitioned table needs once ingestion has fragmented it (daily
  * partitions land small; scans then pay one task + one open per
  * tiny file): group adjacent partitions into row-count-targeted
  * bins and rewrite each bin as ONE file — what Iceberg's
  * `rewrite_data_files` / Delta `OPTIMIZE` do, expressed on plain
  * parquet with a deterministic plan.
  *
  * The PLAN is metadata-only: per-partition row counts come from
  * parquet FOOTERS (the ZoneMap discipline — no row reads; a table
  * format serves the same numbers from its manifest), and binning is
  * start-offset arithmetic on the ordered partition list:
  * bin(p) = (Σ rows of earlier partitions) div targetRows — contiguous
  * partitions, deterministic given the data, and exactly replayable
  * in SQL from the row grain (what the io14 oracle does). The
  * EXECUTE step reads only each bin's member partitions and writes
  * one file per bin; cost is one pass over the compacted bytes, the
  * floor for any rewrite. Partition values stay recoverable (the bin
  * file carries the partition column as data).
  *
  * At 100 TB the same plan runs per table-partition subtree and bins
  * cap at the format's target file size; the engine-side shape —
  * footer-metadata plan, contiguous-range bins, one write per bin —
  * is unchanged. */
object Compaction {

  final case class PartInfo(value: Long, rows: Long)

  /** Footer-only (partition value → row count) for `col=<v>` dirs,
    * ordered by value. */
  def partitionRows(spark: SparkSession, root: String,
      partCol: String): Seq[PartInfo] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rp = new Path(root)
    val fs = rp.getFileSystem(conf)
    if (!fs.exists(rp)) return Seq.empty
    val prefix = s"$partCol="
    fs.listStatus(rp).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(prefix))
      .map { dir =>
        val rows = fs.listStatus(dir).toSeq.map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet") &&
            !p.getName.startsWith("_") && !p.getName.startsWith("."))
          .map { p =>
            val rd = ParquetFileReader.open(
              HadoopInputFile.fromPath(p, conf))
            try rd.getFooter.getBlocks.asScala.map(_.getRowCount).sum
            finally rd.close()
          }.sum
        PartInfo(dir.getName.stripPrefix(prefix).toLong, rows)
      }
      .sortBy(_.value)
  }

  /** Start-offset binning: partition p lands in bin
    * (rows-before-p) div targetRows. */
  def plan(parts: Seq[PartInfo], targetRows: Long)
      : Seq[(Long, Seq[PartInfo])] = {
    require(targetRows > 0,
      s"targetRows must be positive, got $targetRows")
    var cum = 0L
    parts.map { p =>
      val bin = cum / targetRows
      cum += p.rows
      (bin, p)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, ps) => (b, ps.map(_._2)) }
  }

  /** Plan from footers, rewrite each bin as ONE file under
    * `dstRoot/bin=<b>`, and return the compacted frame (original
    * columns + `bin`).
    *
    * Execution is ONE job, not a driver loop over bins: the
    * (partition value → bin) map is broadcast onto a single read of
    * the source tree, rows shuffle once on `bin`
    * (`repartition(bin)` puts every bin in exactly one task), and
    * `partitionBy(bin)` makes each task emit one file per bin it
    * holds — together: exactly one file per bin. A per-bin driver
    * loop serializes what the cluster should do in parallel and pays
    * job-submission latency per bin (at 100 TB, thousands of bins). */
  def compact(spark: SparkSession, srcRoot: String, dstRoot: String,
      partCol: String, targetRows: Long): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val bins = plan(partitionRows(spark, srcRoot, partCol), targetRows)
    val binOf = spark.createDataFrame(
      bins.flatMap { case (b, ps) => ps.map(p => (p.value, b)) })
      .toDF(partCol, "bin")
    // basePath keeps the partition column as DATA in the bin file,
    // so partition values survive the rewrite
    spark.read.option("basePath", srcRoot).parquet(srcRoot)
      .join(broadcast(binOf), partCol)
      .repartition(col("bin"))
      .write.partitionBy("bin").mode("overwrite").parquet(dstRoot)
    spark.read.parquet(dstRoot)
  }
}
