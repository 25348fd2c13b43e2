package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Partition-level retention sweep (io13) — the TTL / compliance
  * enforcement job every partitioned lake runs: drop partitions whose
  * value fell behind the retention cutoff by deleting their
  * DIRECTORIES. Metadata-only — no rewrite, no row scan; cost is one
  * LIST plus one delete per expired partition, independent of data
  * size, which is exactly why retention policies are expressed on
  * partition columns in the first place (a row-level TTL would be a
  * full rewrite). Readers see the survivors through ordinary
  * partition discovery; nothing else changes.
  *
  * The sweep refuses non-conforming directory names rather than
  * guessing (a stray dir under a partitioned root is a layout bug
  * worth failing loudly on). */
object Retention {

  /** Delete `col=<v>` partition directories with v < cutoff.
    * @return the deleted partition values, sorted */
  def sweep(spark: SparkSession, root: String, col: String,
      cutoff: Long): Seq[Long] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val prefix = s"$col="
    val parts = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory)
      .map(_.getPath)
    parts.flatMap { dir =>
      val name = dir.getName
      require(name.startsWith(prefix),
        s"non-partition directory under retention root: $name")
      val v = name.stripPrefix(prefix).toLong
      if (v < cutoff) {
        fs.delete(dir, true)
        Some(v)
      } else None
    }.sorted
  }
}
