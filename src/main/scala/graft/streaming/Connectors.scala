package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Streaming/external bindings for the harness's logical pipelines.
  *
  * The reference wires Kafka sources/sinks and JDBC polling by hand
  * (`/root/reference/src/main/java/com/thaihoc/util/FlinkJobUtils.java:28-87`,
  * `source/AsyncInvInSource.java:11-117`). In Spark the same bindings are
  * configuration, not code: the logical DataFrame programs in
  * `graft.operators` are source-agnostic, and this object binds them to
  * real Kafka (value-string contract, S1/K4) or micro-batch JDBC when
  * deployed. The harness environment is zero-egress, so these are
  * compile-checked and unit-tested only at the contract level — the
  * operators themselves are verified over parquet stand-ins.
  */
object Connectors {

  /** S1 — Kafka value-as-string source over n topics
    * (`util/FlinkJobUtils.java:28-62`; starting offsets map to the
    * reference's EARLIEST/LATEST/COMMITTED modes). One subscription
    * covers all 5 request topics; `topic` survives as a column (the
    * Spark-side improvement over 5 separate sources, SURVEY §2.1 S1). */
  def kafkaStringSource(spark: SparkSession, bootstrap: String,
      topics: Seq[String], startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"), col("topic"))

  /** K4 — Kafka sink with per-row topic routing: ONE sink with a `topic`
    * column replaces the reference's 5 hand-wired producers
    * (`util/FlinkJobUtils.java:64-87`, wired
    * `job/InvoiceResponse.java:124-143`); at-least-once comes from
    * checkpointing, matching `DeliveryGuarantee.AT_LEAST_ONCE` (`:85`). */
  def kafkaRoutedSink(packets: DataFrame, bootstrap: String,
      checkpointDir: String): DataStreamWriter[Row] =
    packets
      .select(col("topic"), col("value").cast("string").as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("checkpointLocation", checkpointDir)

  /** S2/S3 — one incremental poll of a JDBC staging table: the pushed
    * predicate + watermark + limit shape of `AsyncInvInSource.java:55`.
    * The caller advances `lastId` with the max id seen (`:83-94`) —
    * driver-held offset state, exactly like the reference's
    * `lastProcessedId`. Predicate/limit push down to the remote server. */
  def jdbcIncrementalPoll(spark: SparkSession, url: String, table: String,
      props: java.util.Properties, predicate: String, lastId: Long,
      fetch: Int): DataFrame =
    spark.read.jdbc(url, table, props)
      .filter(expr(predicate) && col("id") > lastId)
      .orderBy(col("id"))
      .limit(fetch)

  /** K1 — batched JDBC append (`job/InvoiceRequest.java:111-157`): Spark
    * JDBC writer batches inserts (`batchsize`, default 1000; the
    * reference used 2000/5000 ms). Called per micro-batch from
    * `foreachBatch`. */
  def jdbcBatchAppend(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 2000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
}
