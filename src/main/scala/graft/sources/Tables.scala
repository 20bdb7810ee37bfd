package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table access for the harness.
  *
  * In the reference, inputs are Kafka topics and MySQL tables
  * (`/root/reference/src/main/java/com/thaihoc/job/InvoiceRequest.java:53-69`,
  * `source/AsyncInvInSource.java:55`). The harness binds the same logical
  * pipelines to the driver's deterministic parquet tables (TESTDATA.md);
  * `graft.streaming.Connectors` binds them to real Kafka/JDBC in streaming
  * mode. Reads go through `spark.read.parquet` so Catalyst's column pruning
  * and filter pushdown reach the scan — at 100 TB the scan is the dominant
  * cost and pruning/pushdown are the first-order optimizations.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    // rejects by default; read nanos as long (callers convert with
    // timestamp_micros(ts/1000) when they need wall-clock semantics).
    // Set here — not in the session builders — so the driver's own session
    // (which smoke-runs SparkEntry.entry) gets it too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
