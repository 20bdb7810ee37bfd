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
    // events.parquet has shipped as both TIMESTAMP(NANOS) (rounds ≤7)
    // and timestamp[us] (round 8+). Keep nanosAsLong on so a NANOS file
    // reads as raw-long instead of erroring (it is a no-op for µs
    // files); ALL ts consumers normalize through ScanOps.eventsTs /
    // tsMicros, which dispatch on the arrived dtype — EventsSchemaSpec
    // pins the supported set. Set here — not in the session builders —
    // so the driver's own session (which smoke-runs SparkEntry.entry)
    // gets it too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // naive timestamp[us] parquet (round 8+ events.ts) would otherwise
    // read as TimestampNTZ; with inference off the stored micros read
    // as a plain epoch instant (TimestampType) — the same integers
    // DuckDB sees, independent of session timezone
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
