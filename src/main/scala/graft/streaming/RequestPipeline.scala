package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.InvoiceModel

/** Streaming restatement of reference job 1 (SURVEY §3.1,
  * `/root/reference/src/main/java/com/thaihoc/job/InvoiceRequest.java:25-162`):
  *
  *   Kafka value-string packets → T2 explode (`inv_pack` element + index)
  *   → T3 validate with nested fallback → T4 derive → split → K1 staging
  *   append + K2 create-retry append, both in ONE `foreachBatch`.
  *
  * The packet parses once (`from_json` + `posexplode` — the built-in
  * generator covers the reference's UDTF-style flatMap,
  * `InvoiceRequestTransformer.java:34-53`); element-level failures
  * become rows in the retry output instead of poisoning the batch,
  * mirroring the element-scoped try/catch at `:42-49`. The `foreachBatch`
  * multi-write replaces Flink side-output tags: one cached micro-batch,
  * two filtered writes — in production the writers are
  * `Connectors.jdbcBatchAppend` (K1) and the K2 DML apply; the harness
  * binds them to parquet appends.
  *
  * Scale: everything before the sink is narrow (parse+generate+project
  * in one codegen stage, no shuffle); parallelism is the Kafka partition
  * count. The uuid() default for a missing syncid is generated at write
  * time exactly like the reference's `UUID.randomUUID()`
  * (`InvoiceRequestTransformer.java:88`).
  */
object RequestPipeline {

  /** T2+T3+T4 over a `value: string` packet stream — works identically on
    * a batch or streaming DataFrame. Output carries both branches,
    * discriminated by `error_message IS NULL`. */
  def transform(packets: DataFrame): DataFrame =
    packets
      .select(col("value"),
        posexplode(from_json(col("value"), InvoiceModel.packetSchema)("inv_pack"))
          .as(Seq("pos", "e")))
      .select(
        col("pos"),
        coalesce(col("e.stax"), col("e.inv.stax")).as("stax"),
        coalesce(col("e.sid"), col("e.inv.sid")).as("sid"),
        coalesce(col("e.syncid"), col("e.inv.syncid"), uuid()).as("syncid"),
        col("e.api_type").cast("tinyint").as("api_type"),
        to_json(col("e")).as("inv"),
        pmod(col("pos"), lit(InvoiceModel.GroupIdBuckets)).cast("tinyint").as("group_id"),
        when(coalesce(col("e.stax"), col("e.inv.stax")).isNull, "stax is null")
          .when(coalesce(col("e.sid"), col("e.inv.sid")).isNull, "sid is null")
          .when(col("e.api_type").isNull, "api_type is null")
          .as("error_message"))

  /** Wire the transform to a micro-batched dual sink: valid rows append
    * to `<outDir>/async_inv_in` (K1) with the reference's full 18-column
    * binding (`job/InvoiceRequest.java:111-143`: `tax_schema` IS the
    * extracted stax, response/callback columns null at ingest, retry 0,
    * state 0), rejects to `<outDir>/invoice_retry` (K2 CREATE branch,
    * retry_count 0 / PENDING per
    * `InvoiceRequestTransformer.java:158-168`). */
  def run(packets: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    transform(packets).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          b.filter(col("error_message").isNull)
            .select(
              col("stax").as("tax_schema"),
              col("inv"),
              col("api_type"),
              lit(null).cast("tinyint").as("res_type"),
              lit(null).cast("string").as("fpt_einvoice_res_code"),
              lit(null).cast("string").as("fpt_einvoice_res_msg"),
              lit(null).cast("string").as("fpt_einvoice_res_json"),
              lit(0).cast("tinyint").as("retry"),
              lit(0).cast("tinyint").as("state"),
              col("group_id"),
              current_timestamp().as("created_date"),
              lit(null).cast("timestamp").as("updated_date"),
              lit(null).cast("string").as("callback_res_code"),
              lit(null).cast("string").as("callback_res_msg"),
              lit(null).cast("string").as("callback_res_json"),
              col("sid"), col("syncid"),
              lit(null).cast("string").as("process_kafka"))
            .write.mode("append").parquet(s"$outDir/async_inv_in")
          b.filter(col("error_message").isNotNull)
            .select(col("inv").as("payload"), col("error_message"),
              col("sid"), col("syncid"),
              lit(0).cast("tinyint").as("retry_count"),
              lit("PENDING").as("state"), lit("REQUEST").as("job"),
              // first retry slot one base interval out
              // (`InvoiceRequestTransformer.java:48`)
              lit(InvoiceModel.RetryBaseSeconds).as("next_retry_secs"))
            .write.mode("append").parquet(s"$outDir/invoice_retry")
        } finally b.unpersist()
        ()
      }
      .start()
}
