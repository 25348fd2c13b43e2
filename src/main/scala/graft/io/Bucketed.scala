package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout: the shuffle-free co-located join.
  *
  * Writing both sides of a recurring join bucketed by the join key (same
  * bucket count, same hash — Spark's Murmur3 `pmod` bucketing) lets every
  * subsequent join between them plan WITHOUT an Exchange on either side:
  * bucket i of table A joins bucket i of table B in place. At 100 TB this
  * converts the nightly fact⋈dim reshuffle (the single most expensive
  * stage of a recurring pipeline) into a scan-side merge — you pay the
  * shuffle once at layout time, then never again.
  *
  * `sortBy` on the same key additionally persists within-bucket order, so
  * the sort-merge join's per-partition sort can drop too when each bucket
  * is a single file. The repartition before write produces exactly one
  * file per bucket (repartition hash ≡ bucket hash), avoiding the
  * files-per-bucket explosion that would otherwise void the sorted
  * property.
  */
object Bucketed {

  /** Write `df` as a bucketed + sorted external table at `path`. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int, path: String): Unit =
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(tableName)

  /** Lay out orders + customer bucketed by custkey, then run the
    * co-located join: revenue + order count per market segment. The join
    * itself plans with zero Exchange operators (pinned by
    * PlanShapeSpec); the only shuffles in the query are the layout
    * writes and the 5-row segment aggregate. */
  // Per-JVM token in table names and layout paths: concurrent sessions
  // on the same dataset (a bench pass overlapping a test run) must not
  // race on one catalog entry / external-table directory. Within a JVM
  // the token is stable, so repeated passes reuse (overwrite) one
  // layout, and a shutdown hook removes it — tokens never accumulate
  // dead copies in tmpdir. `graft.bucketed.token` pins the token when a
  // deterministic artifact is needed (graft.Explain sets it so the
  // committed EXPLAIN.md plan text is byte-reproducible across runs).
  private lazy val jvmToken: String =
    sys.props.getOrElse("graft.bucketed.token",
      java.util.UUID.randomUUID().toString.take(8))

  // one hook, one base per dataset dir touched this JVM
  private val cleanupBases =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cleanupBases.forEach { base =>
        try {
          val p = java.nio.file.Paths.get(base)
          if (java.nio.file.Files.exists(p)) {
            val walk = java.nio.file.Files.walk(p)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
            finally walk.close()
          }
        } catch { case _: Throwable => () }
      }))

  private def registerCleanup(base: String): Unit = {
    cleanupHook
    cleanupBases.add(base)
  }

  def coLocatedSegmentRevenue(s: SparkSession, d: String,
      buckets: Int = 8): DataFrame = {
    val tag = s"${d.split('/').last.replace('.', '_')}_$jvmToken"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_$tag"
    registerCleanup(base)
    val orders = s.read.parquet(s"$d/orders.parquet")
    val customer = s.read.parquet(s"$d/customer.parquet")
    writeBucketed(orders, s"b_orders_$tag", "o_custkey", buckets,
      s"$base/orders")
    writeBucketed(customer, s"b_customer_$tag", "c_custkey", buckets,
      s"$base/customer")
    bucketedJoinPlan(s, tag)
  }

  /** The read+join half (separated so tests can re-plan without
    * rewriting the layout). The MERGE hint pins the sort-merge strategy:
    * at test scale AQE would broadcast the (tiny) customer side and never
    * touch the bucketed path being demonstrated — at real scale both
    * sides are fact-sized and SMJ is what the planner picks anyway. */
  def bucketedJoinPlan(s: SparkSession, tag: String): DataFrame = {
    val o = s.table(s"b_orders_$tag")
    val c = s.table(s"b_customer_$tag")
    o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy(col("c_mktsegment"))
  }
}
