package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** File-level ZONE MAPS (min/max data-skipping index) — the statistic
  * Delta/Iceberg/ClickHouse keep per file/granule so selective scans
  * read only the files whose [min, max] intersects the predicate. The
  * layout half of the story lives in io5/io7 (Z-order / Hilbert
  * clustering make per-file ranges NARROW); this is the consuming half:
  * build the index, prune the file list, scan the survivors.
  *
  * The index is built from parquet FOOTER metadata only
  * (`ParquetFileReader.getFooter` — row counts + per-column-chunk
  * min/max statistics), never by scanning rows: at 100 TB the build
  * cost is one footer read per file (the same planning-time work
  * Spark's own parquet scan does), and the index itself is |files|-
  * sized — exactly the metadata a table format persists in its
  * manifest so even the footer reads amortize to zero. The driver-side
  * materialization here is the documented metadata-sized collect (the
  * cms1 class): a row per file, never a row per record.
  *
  * Pruning contract: a file is kept iff min ≤ hi AND max ≥ lo — the
  * file may still contain non-matching rows (zone maps are one-sided),
  * so the residual predicate stays on the scan. Completeness (pruning
  * never loses a matching row) is what the io10 oracle certifies;
  * that skipping actually HAPPENS on a bucket-clustered layout is
  * pinned in IoSpec.
  */
object ZoneMap {

  /** One file's zone: (path, rows, min, max) for a double column.
    * Files PROVABLY all-NULL for the column (stats present, no
    * non-null value) get no zone row — no range predicate can match
    * them; files whose stats were never written get an unbounded
    * (−∞, +∞) zone so they always survive pruning. */
  final case class FileZone(path: String, rows: Long, min: Double,
      max: Double)

  /** Footer-only zone-map build over the data files of `dir` for a
    * required DOUBLE column. */
  def build(spark: SparkSession, dir: String, column: String)
      : Seq[FileZone] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .flatMap { p =>
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try {
          var rows = 0L
          var min = Double.PositiveInfinity
          var max = Double.NegativeInfinity
          var seen = false
          var statsMissing = false
          rd.getFooter.getBlocks.asScala.foreach { b =>
            rows += b.getRowCount
            b.getColumns.asScala
              .filter(_.getPath.toDotString == column)
              .foreach { c =>
                val st = c.getStatistics
                if (st == null || st.isEmpty) {
                  // stats not WRITTEN (disabled writer / legacy file):
                  // the file's content is unknown — it must stay
                  // scannable, the conservative direction. Distinct
                  // from hasNonNullValue=false with stats present
                  // (provably all-NULL ⇒ no range predicate can match
                  // ⇒ skipping is exact).
                  statsMissing = true
                } else if (st.hasNonNullValue) {
                  seen = true
                  min = math.min(min,
                    st.genericGetMin.asInstanceOf[Number].doubleValue())
                  max = math.max(max,
                    st.genericGetMax.asInstanceOf[Number].doubleValue())
                }
              }
          }
          if (statsMissing)
            Some(FileZone(p.toString, rows, Double.NegativeInfinity,
              Double.PositiveInfinity))
          else if (seen) Some(FileZone(p.toString, rows, min, max))
          else None
        } finally rd.close()
      }
  }

  /** The files a `lo ≤ col ≤ hi` scan must read. */
  def prunedPaths(zones: Seq[FileZone], lo: Double, hi: Double)
      : Seq[String] =
    zones.filter(z => z.min <= hi && z.max >= lo).map(_.path)
}
