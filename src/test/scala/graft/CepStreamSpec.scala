package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CepStream

class CepStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // (event_id, minute, user, type)
  private def run(batches: Seq[Seq[(Long, Int, Long, String)]],
      closerMinute: Int = 130): Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val matches = CepStream.matchFunnel(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type"))
    val q = matches.toDF().writeStream.format("memory")
      .queryName("cep_spec").outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map { case (id, m, u, t) => (id, ts(m), u, t) })
        q.processAllAvailable()
      }
      // a far-future event on a throwaway user closes every buffer
      mem.addData(Seq((9999L, ts(closerMinute), 999L, "noise")))
      q.processAllAvailable()
      spark.table("cep_spec")
        .select(col("user_id"), col("view_us"), col("click_us"),
          col("purchase_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._1)
    } finally q.stop()
  }

  private def us(min: Int): Long = ts(min).getTime * 1000L

  test("in-order funnel matches with the earliest stages") {
    // user 1: view@1, view@2, click@3, purchase@5 -> (1, 3, 5)
    val got = run(Seq(Seq((1L, 1, 1L, "view"), (2L, 2, 1L, "view"),
      (3L, 3, 1L, "click"), (4L, 5, 1L, "purchase"))))
    assert(got === Seq((1L, us(1), us(3), us(5))))
  }

  test("stage order is event-time, not arrival: out-of-order batches " +
    "still match") {
    // purchase and click ARRIVE first; the view arrives in a later
    // batch but has the earliest event time — the buffered NFA must
    // still match (1, 2, 4)
    val got = run(Seq(
      Seq((1L, 4, 1L, "purchase"), (2L, 2, 1L, "click")),
      Seq((3L, 1, 1L, "view"))))
    assert(got === Seq((1L, us(1), us(2), us(4))))
  }

  test("wrong order never matches; stages must strictly increase") {
    // user 1: purchase@1, click@2, view@3 (reverse) -> no match
    // user 2: view@1, click@1 same-ts (not strictly after) -> no match
    val got = run(Seq(Seq(
      (1L, 1, 1L, "purchase"), (2L, 2, 1L, "click"), (3L, 3, 1L, "view"),
      (4L, 1, 2L, "view"), (5L, 1, 2L, "click"), (6L, 4, 2L, "purchase"))))
    assert(got === Seq.empty)
  }

  test("only the first completion emits; later purchases are ignored") {
    val got = run(Seq(Seq(
      (1L, 1, 1L, "view"), (2L, 2, 1L, "click"),
      (3L, 3, 1L, "purchase"), (4L, 10, 1L, "purchase"))))
    assert(got === Seq((1L, us(1), us(2), us(3))))
  }

  test("events inside the watermark horizon stay unmatched") {
    // closer at minute 70 -> watermark 10 min; purchase@65 never closes
    val got = run(Seq(Seq((1L, 1, 1L, "view"), (2L, 2, 1L, "click"),
      (3L, 65, 1L, "purchase"))), closerMinute = 70)
    assert(got === Seq.empty)
  }
}
