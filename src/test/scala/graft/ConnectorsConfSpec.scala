package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Connectors.PipelineConf

/** The reference-compatible `application.properties` surface: the SAME
  * property names the reference's jobs read must parse into the Spark
  * Kafka/JDBC option maps — credential JAAS line, offsets-mode mapping,
  * topic routing, batch/poll sizing, defaults for absent keys, loud
  * failure for missing required ones. (All values here are test
  * dummies; connectivity itself is out of scope in this zero-egress
  * sandbox — topologies are spec-verified via MemoryStream.) */
class ConnectorsConfSpec extends AnyFunSuite {

  private def props(kv: (String, String)*): java.util.Properties = {
    val p = new java.util.Properties()
    kv.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  private def full = props(
    "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
    "kafka.sasl.username" -> "test-user",
    "kafka.sasl.password" -> "test-pass",
    "kafka.starting.offsets" -> "EARLIEST",
    "kafka.topic.crt.request" -> "t.crt.req",
    "kafka.topic.upd.request" -> "t.upd.req",
    "kafka.topic.del.request" -> "t.del.req",
    "kafka.topic.rep.request" -> "t.rep.req",
    "kafka.topic.adj.request" -> "t.adj.req",
    "kafka.topic.crt.response" -> "t.crt.res",
    "kafka.topic.upd.response" -> "t.upd.res",
    "kafka.topic.del.response" -> "t.del.res",
    "kafka.topic.rep.response" -> "t.rep.res",
    "kafka.topic.adj.response" -> "t.adj.res",
    "kafka.group.id.crt.request" -> "g-crt",
    "mysql.jdbc.url" -> "jdbc:mysql://db:3306/testdb",
    "mysql.username" -> "dbuser",
    "mysql.password" -> "dbpass",
    "mysql.table.name" -> "async_inv_in",
    "mysql.batch.size" -> "2000",
    "mysql.batch.interval.ms" -> "5000",
    "mysql.max.retries" -> "3",
    "mysql.polling.interval.ms" -> "500",
    "mysql.fetch.size" -> "2000",
    "group.id.max.value" -> "4",
    "app.max.retries" -> "3",
    "app.retry.interval.ms" -> "10000")

  test("full property file parses into the Spark option surface") {
    val c = PipelineConf.fromProperties(full)
    assert(c.bootstrapServers === "broker1:9092,broker2:9092")
    assert(c.requestTopics === Map(
      "crt" -> "t.crt.req", "upd" -> "t.upd.req", "del" -> "t.del.req",
      "rep" -> "t.rep.req", "adj" -> "t.adj.req"))
    assert(c.responseTopics("adj") === "t.adj.res")
    assert(c.groupIds === Map("crt" -> "g-crt"))
    assert(c.jdbcBatchSize === 2000 && c.jdbcPollIntervalMs === 500L &&
      c.jdbcFetchSize === 2000 && c.groupIdMaxValue === 4 &&
      c.appMaxRetries === 3 && c.appRetryIntervalMs === 10000L)
    val o = c.kafkaOptions
    assert(o("kafka.security.protocol") === "SASL_PLAINTEXT")
    assert(o("kafka.sasl.mechanism") === "PLAIN")
    // the exact JAAS line FlinkJobUtils builds (:37-43)
    assert(o("kafka.sasl.jaas.config") ===
      "org.apache.kafka.common.security.plain.PlainLoginModule required " +
        """username="test-user" password="test-pass";""")
    assert(o("startingOffsets") === "earliest")
  }

  test("offsets modes: LATEST default, COMMITTED_OFFSETS defers to the checkpoint") {
    val p = full
    p.remove("kafka.starting.offsets")
    assert(PipelineConf.fromProperties(p).kafkaOptions("startingOffsets") === "latest")
    p.setProperty("kafka.starting.offsets", "COMMITTED_OFFSETS")
    // Spark's committed-offset analogue is the query checkpoint: no
    // startingOffsets override at all (connector default applies on a
    // genuinely fresh query, checkpoint wins on restart)
    assert(!PipelineConf.fromProperties(p).kafkaOptions.contains("startingOffsets"))
    p.setProperty("kafka.starting.offsets", "BOGUS")
    intercept[IllegalArgumentException](PipelineConf.fromProperties(p))
  }

  test("no SASL credentials -> no security options; missing required keys fail loudly by name") {
    val p = full
    p.remove("kafka.sasl.username")
    val o = PipelineConf.fromProperties(p).kafkaOptions
    assert(!o.contains("kafka.security.protocol") &&
      !o.contains("kafka.sasl.jaas.config"))
    val bad = full
    bad.remove("mysql.jdbc.url")
    val e = intercept[IllegalArgumentException](PipelineConf.fromProperties(bad))
    assert(e.getMessage.contains("mysql.jdbc.url"))
  }

  test("subscribing with zero configured request topics fails loudly by key name") {
    val p = full
    Seq("crt", "upd", "del", "rep", "adj").foreach(o =>
      p.remove(s"kafka.topic.$o.request"))
    val c = PipelineConf.fromProperties(p) // parse itself is fine
    assert(c.requestTopics.isEmpty)
    // the guard fires before the session is touched — passing null
    // keeps this suite free of SparkSession side effects (a stray
    // getOrCreate here could pin a wrong master for later suites)
    val e = intercept[IllegalArgumentException](
      graft.streaming.Connectors.kafkaRequestSource(
        null.asInstanceOf[org.apache.spark.sql.SparkSession], c))
    assert(e.getMessage.contains("kafka.topic"), e.getMessage)
  }

  test("sizing defaults match the reference's documented values when keys are absent") {
    val p = props(
      "kafka.bootstrap.servers" -> "b:9092",
      "mysql.jdbc.url" -> "jdbc:mysql://db:3306/x",
      "mysql.username" -> "u",
      "mysql.password" -> "pw")
    val c = PipelineConf.fromProperties(p)
    assert(c.jdbcTable === "async_inv_in")
    assert(c.jdbcBatchSize === 2000 && c.jdbcBatchIntervalMs === 5000L &&
      c.jdbcMaxRetries === 3 && c.jdbcPollIntervalMs === 500L &&
      c.jdbcFetchSize === 2000)
    assert(c.groupIdMaxValue === 4 && c.appMaxRetries === 3 &&
      c.appRetryIntervalMs === 10000L)
    assert(c.requestTopics.isEmpty && c.kafkaOptions("startingOffsets") === "latest")
  }
}
