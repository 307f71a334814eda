package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Self-upgrading gate for the live Kafka seam (O1): this environment has
  * no kafka connector jar (see BASELINE.md), so the envelope decode is
  * unit-tested against a mock wire-schema DataFrame — but the day a
  * `spark-sql-kafka` jar lands on the classpath these tests stop being
  * canceled and exercise the REAL provider, with zero code changes:
  *
  *  - wire-schema pin: `.format("kafka").load()` defines its schema
  *    without contacting a broker; assert it carries exactly the columns
  *    [[CdcDecode.fromKafkaEnvelopeWithMeta]] consumes.
  *  - full round-trip: additionally gated on `SPARK_GRAFT_KAFKA_BOOTSTRAP`
  *    (a live broker's bootstrap servers): produce CDC JSON through the
  *    kafka sink, read it back through the kafka source, decode, compare.
  */
class KafkaGateSpec extends SparkSpec {

  private def kafkaProviderPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: Throwable => false }

  test("kafka wire schema matches the envelope decode contract (gated on the jar)") {
    if (!kafkaProviderPresent)
      cancel("no spark-sql-kafka jar on the classpath — decode is covered by " +
        "CdcDecodeSpec's mock-envelope tests; this pin activates when the jar lands")
    val wire = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", "localhost:1")
      .option("subscribe", "graft-gate")
      .load() // schema definition only; no broker contact until start()
    val bySchema = wire.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    // the columns fromKafkaEnvelopeWithMeta consumes, with their wire types
    assert(bySchema.get("value").contains("binary"))
    assert(bySchema.get("topic").contains("string"))
    assert(bySchema.get("partition").contains("integer"))
    assert(bySchema.get("offset").contains("long"))
    assert(bySchema.get("timestamp").contains("timestamp"))
  }

  test("kafka round-trip: produce, consume, decode (gated on jar + live broker)") {
    if (!kafkaProviderPresent)
      cancel("no spark-sql-kafka jar on the classpath")
    val bootstrap = sys.env.getOrElse("SPARK_GRAFT_KAFKA_BOOTSTRAP",
      cancel("set SPARK_GRAFT_KAFKA_BOOTSTRAP=<host:port> to run the live round-trip"))
    import spark.implicits._
    val topic = s"graft-gate-${System.nanoTime()}"
    val events = EventGen.generate(nTx = 20, seed = 5L)
    CdcDecode.toJson(events.toDS()).select(col("json").as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()
    val back = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    val decoded = CdcDecode.fromKafkaEnvelope(back).collect().sortBy(_.id)
    assert(decoded.map(_.id).toSeq == events.sortBy(_.id).map(_.id).toSeq,
      "every produced event must survive the broker round-trip and decode")
  }
}
