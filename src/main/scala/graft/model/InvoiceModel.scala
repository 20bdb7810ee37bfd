package graft.model

import org.apache.spark.sql.types._

/** Schemas for the reference's record shapes (FIXTURES.md; reconstructed from
  * `/root/reference/src/main/java/com/thaihoc/model/...`). All schemas are
  * explicit — never inferred — per SURVEY.md §1.3.
  */
object InvoiceModel {

  /** api_type domain: 10=CRT 11=UPD 12=DEL 13=REP 14=ADJ
    * (`/root/reference/src/main/resources/application.properties:7-17`,
    * `process/response/InvoiceResponseKafkaRouter.java:52-70`).
    */
  val ApiTypes: Seq[Int] = Seq(10, 11, 12, 13, 14)

  /** group_id buckets = group.id.max.value(4) + 1
    * (`application.properties:42`, `job/InvoiceRequest.java:43`). */
  val GroupIdBuckets: Int = 5

  /** Retry policy (`application.properties:43-44`): base 10 s, doubling per
    * attempt (`process/request/InvoiceRequestTransformer.java:132`), max 3. */
  val RetryBaseSeconds: Long = 10L
  val MaxRetries: Int = 3

  /** One element of the `inv_pack` array in a request packet
    * (`process/request/InvoiceRequestTransformer.java:55-110`): fields may sit
    * at the element top level OR nested under `inv` (fallback chains at
    * `:57-89`). `inv` carries the arbitrary invoice body; we model the probed
    * fields plus a `body` stand-in.
    */
  val invStruct: StructType = StructType(Seq(
    StructField("sid", StringType),
    StructField("stax", StringType),
    StructField("syncid", StringType),
    StructField("body", StringType)))

  val packElementSchema: StructType = StructType(Seq(
    StructField("api_type", IntegerType),
    StructField("sid", StringType),
    StructField("syncid", StringType),
    StructField("stax", StringType),
    StructField("inv", invStruct)))

  /** Root packet: `{"inv_pack":[element...]}`
    * (`InvoiceRequestTransformer.java:36-53`). */
  val packetSchema: StructType = StructType(Seq(
    StructField("inv_pack", ArrayType(packElementSchema))))

  /** `async_inv_in` staging table — 18 insert columns + auto-increment id
    * (`job/InvoiceRequest.java:111-116`, `source/AsyncInvInSource.java:66-79`). */
  val asyncInvInSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("tax_schema", StringType),
    StructField("inv", StringType),
    StructField("api_type", ByteType),
    StructField("res_type", ByteType),
    StructField("fpt_einvoice_res_code", StringType),
    StructField("fpt_einvoice_res_msg", StringType),
    StructField("fpt_einvoice_res_json", StringType),
    StructField("retry", ByteType),
    StructField("state", ByteType),
    StructField("group_id", ByteType),
    StructField("created_date", TimestampType),
    StructField("updated_date", TimestampType),
    StructField("callback_res_code", StringType),
    StructField("callback_res_msg", StringType),
    StructField("callback_res_json", StringType),
    StructField("sid", StringType),
    StructField("syncid", StringType),
    StructField("process_kafka", StringType)))

  /** `async_inv_out` (`source/AsyncInvOutSource.java:64-79`). */
  val asyncInvOutSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("tax_schema", StringType),
    StructField("gdt_res", StringType),
    StructField("retry", ByteType),
    StructField("state", ByteType),
    StructField("group_id", ByteType),
    StructField("created_date", TimestampType),
    StructField("updated_date", TimestampType),
    StructField("sid", StringType),
    StructField("syncid", StringType),
    StructField("res_type", ByteType),
    StructField("process_kafka", StringType),
    StructField("api_type", ByteType)))

  /** `invoice_retry` state machine (`model/retry/InvoiceRetryRecord.java:5-19`,
    * `sink/InvoiceRetrySink.java:33-42`). `tag` is in-flight only. */
  val invoiceRetrySchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("payload", StringType),
    StructField("error_message", StringType),
    StructField("error_code", StringType),
    StructField("retry_count", ByteType),
    StructField("state", StringType),
    StructField("sid", StringType),
    StructField("syncid", StringType),
    StructField("job", StringType),
    StructField("next_retry_time", TimestampType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  /** `invoice_error_log` dead letters (`model/retry/InvoiceErrorLogRecord.java:5-14`). */
  val errorLogSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("payload", StringType),
    StructField("error_message", StringType),
    StructField("error_code", StringType),
    StructField("attempt", ByteType),
    StructField("sid", StringType),
    StructField("syncid", StringType),
    StructField("created_at", TimestampType)))

  /** `async_inv_succ_log` (`model/response/AsyncInvSuccLogRecord.java:5-22`,
    * `sink/TransactionalLogAndDeleteSink.java:66-70`). */
  val succLogSchema: StructType = StructType(Seq(
    StructField("tax_schema", StringType),
    StructField("api_type", ByteType),
    StructField("res_type", ByteType),
    StructField("fpt_einvoice_res_code", StringType),
    StructField("fpt_einvoice_res_msg", StringType),
    StructField("retry", ByteType),
    StructField("group_id", ByteType),
    StructField("created_date", TimestampType),
    StructField("updated_date", TimestampType),
    StructField("callback_res_code", StringType),
    StructField("callback_res_msg", StringType),
    StructField("sid", StringType),
    StructField("syncid", StringType),
    StructField("gdt_res", StringType)))
}
