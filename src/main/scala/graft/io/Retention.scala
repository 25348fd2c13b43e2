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
  * worth failing loudly on) — and it validates the ENTIRE listing
  * before deleting anything, so a stray directory aborts the sweep
  * with the root untouched instead of half-swept (round-7 advisor
  * fix: the validate-delete interleaving could delete some expired
  * partitions before hitting the stray). */
object Retention {

  /** Delete `col=<v>` partition directories with v < cutoff.
    * Two-phase: parse + validate every directory name first; delete
    * only after the whole listing conforms.
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
    // phase 1: validate + parse the full listing, touching nothing
    val parsed = parts.map { dir =>
      val name = dir.getName
      require(name.startsWith(prefix),
        s"non-partition directory under retention root: $name")
      val v = try name.stripPrefix(prefix).toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"unparseable partition value under retention root: $name")
      }
      (dir, v)
    }
    // phase 2: the listing conforms — delete the expired partitions
    parsed.collect { case (dir, v) if v < cutoff =>
      fs.delete(dir, true)
      v
    }.sorted
  }
}
