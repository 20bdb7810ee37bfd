package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Response-pipeline operators (reference job 2, SURVEY §2 T6-T9, G1-G4,
  * R2, K3).
  *
  * The reference polls two staging tables, discriminates records by
  * field-sniffing, micro-batches them per `api_type`, emits one JSON
  * packet per batch to the matching Kafka topic and transactionally
  * log-and-deletes processed rows
  * (`/root/reference/src/main/java/com/thaihoc/job/InvoiceResponse.java:27-167`).
  * Here every stage is a declarative DataFrame program over a synthetic
  * staging table derived from `events`; the stateful count-OR-timeout
  * trigger (G2) lives in `graft.streaming` — this file carries its
  * deterministic batch restatement (`row_number`-bucketed groups).
  *
  * Scale notes: the natural key domain is ≤6 values (api_type 10-14 + 0
  * fallback), so everything per-key is bucketed by `(batch_key,
  * batch_id)` — the window that assigns `batch_id` is the one shuffle,
  * and its partition count is `batch_key × buckets`, not 6, so a hot
  * api_type does not serialize onto one executor. `collect_list` appears
  * ONLY in G4 where the packet itself is the output, and each group is
  * capped at [[BatchSize]] rows by construction — bounded buffers under
  * any skew.
  */
object ResponseOps {

  /** `response.batch.size` (`application.properties:60`). */
  val BatchSize = 100

  /** Synthetic staging union (async_inv_in ∪ async_inv_out stand-in)
    * derived deterministically from events:
    *   - kind: user_id parity (InvIn/InvOut) — ground truth for T8/T9;
    *     T7 must recover it from the payload alone
    *   - api_type: 10 + id%7 (10..16: 15/16 exercise the T6 domain
    *     check); the COLUMN is null when id%11=0 and the PAYLOAD omits
    *     it when id%13=0, exercising G1's fallback chain
    *   - InvIn payload carries fpt_einvoice_res_* (msg absent when
    *     id%3=0 → T8 default-message branch; json absent when id%5=0)
    *   - InvOut payload carries gdt_res (absent when id%9=0 → sniff
    *     failure, the reference's deserialize-error path)
    */
  def staging(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val id = col("event_id")
    val isIn = col("user_id") % 2 === 0
    val at = (lit(10) + id % 7).cast("tinyint")
    // The record struct is built ONCE and emitted twice: serialized as
    // the `payload` string (what a real source would carry) and as the
    // pre-parsed `pj` struct the operators consume. PayloadParseSpec
    // pins from_json(payload, PayloadSchema) === pj, so the parse
    // fidelity the reference's Jackson deserialization needs is
    // proven, while query plans that never output `payload` prune the
    // to_json entirely — the same arithmetic-only surface the DuckDB
    // oracles restate.
    val record = struct(
      concat(lit("S"), id).as("sid"),
      concat(lit("Y"), id).as("syncid"),
      when(id % 13 =!= 0, at.cast("int")).as("api_type"),
      when(isIn, concat(lit("C"), id % 4)).as("fpt_einvoice_res_code"),
      when(isIn && id % 3 =!= 0, concat(lit("E"), id % 3)).as("fpt_einvoice_res_msg"),
      when(isIn && id % 5 =!= 0,
        concat(lit("{\"x\":"), id % 7, lit("}"))).as("fpt_einvoice_res_json"),
      when(!isIn && id % 9 =!= 0, concat(lit("G"), id)).as("gdt_res"))
    ev.select(
      id.as("id"),
      col("user_id"),
      concat(lit("TX"), id % 10).as("tax_schema"),
      (id % 4).cast("tinyint").as("retry"),
      (id % 5).cast("tinyint").as("group_id"),
      when(isIn, lit("InvIn")).otherwise(lit("InvOut")).as("kind"),
      concat(lit("S"), id).as("sid"),
      concat(lit("Y"), id).as("syncid"),
      when(id % 11 =!= 0, at).as("api_type"),
      to_json(record).as("payload"),
      record.as("pj"))
  }

  /** The payload's record shape (the POJO fields under
    * `model/response/`; both record kinds flattened — absent fields
    * parse to null). On a REAL source this is the `from_json` schema
    * that produces [[staging]]'s `pj` struct; here PayloadParseSpec
    * proves the equivalence. */
  private[graft] val PayloadSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "sid string, syncid string, api_type int, fpt_einvoice_res_code string, " +
        "fpt_einvoice_res_msg string, fpt_einvoice_res_json string, gdt_res string")

  // Note on `pj`: consumers read payload fields through the struct
  // column, never by probing the payload STRING — the Spark
  // restatement of the reference parsing each record into a POJO a
  // single time (`InvoiceResponseBatchProcessor.java:306-316`). The
  // round-4 shape probed with per-field `get_json_object`, and after
  // `CollapseProject` every probe leg re-paid the full
  // synthesize+parse round trip (t7's four-probe sniff measured 1.6 s
  // at sf0.1; t8/t9/g4b/r4 similar). Struct field access is plain
  // column arithmetic and prunes.

  /** G1 — key extraction with JSON fallback
    * (`job/InvoiceResponse.java:98-118`): typed column first, then
    * `payload.api_type`, then 0. */
  private def batchKey: Column = coalesce(
    col("api_type"),
    col("pj.api_type").cast("tinyint"),
    lit(0).cast("tinyint"))

  def keyExtract(s: SparkSession, dir: String): DataFrame =
    staging(s, dir)
      .select(col("id"), batchKey.as("batch_key"))
      .transform(Common.presented(_, col("id")))

  /** T6 — api_type domain check {10..14}
    * (`InvoiceResponseKafkaRouter.java:52-70` default-throw,
    * `InvoiceResponseBatchProcessor.java:285-287`). */
  def apiDomain(s: SparkSession, dir: String): DataFrame =
    staging(s, dir)
      .select(col("id"), batchKey.as("batch_key"),
        when(batchKey.isin(graft.model.InvoiceModel.ApiTypes: _*),
          lit("valid")).otherwise(lit("rejected")).as("domain_status"))
      .transform(Common.presented(_, col("id")))

  /** The T7 sniff expression over the parsed `pj` struct, shared with
    * RetryOps.responseRetry so the probe set can never diverge between
    * T7 and R4 (`InvoiceResponseBatchProcessor.java:306-316`): any fpt
    * field present → InvIn; else gdt_res → InvOut; else null
    * (deserialize error). */
  private[operators] def sniffedKind: Column =
    when(col("pj.fpt_einvoice_res_code").isNotNull ||
         col("pj.fpt_einvoice_res_msg").isNotNull ||
         col("pj.fpt_einvoice_res_json").isNotNull,
      lit("InvIn"))
      .when(col("pj.gdt_res").isNotNull, lit("InvOut"))

  /** T7 — polymorphic payload sniff
    * (`InvoiceResponseBatchProcessor.java:306-316`). */
  def sniff(s: SparkSession, dir: String): DataFrame =
    staging(s, dir)
      .select(col("id"),
        coalesce(sniffedKind, lit("unknown")).as("sniffed_kind"))
      .transform(Common.presented(_, col("id")))

  /** The T8 item fields (`InvoiceResponseItemFactory.java:16-66`),
    * shared by [[items]] and [[itemPackets]] so the default-message /
    * status / resource logic can never diverge between the flat and
    * packet forms. Expects staging columns (`kind`, `sid`, `syncid`,
    * `payload`) in scope. */
  private def itemFields: Seq[Column] = {
    val isIn = col("kind") === "InvIn"
    val resMsg = col("pj.fpt_einvoice_res_msg")
    Seq(
      col("sid"),
      col("syncid").as("sync_sid"),
      when(isIn, col("pj.fpt_einvoice_res_code")).as("res_code"),
      when(isIn, coalesce(resMsg, lit("Tạo mới thành công"))).as("message"),
      when(isIn, when(resMsg.isNull, lit("success")).otherwise(lit("error"))).as("status"),
      when(isIn, lit("fpt")).otherwise(lit("gdt")).as("res_resource"),
      lit(null).cast("int").as("code"),
      when(isIn, col("pj.fpt_einvoice_res_json"))
        .otherwise(col("pj.gdt_res")).as("data"))
  }

  /** InvOut records REQUIRE gdt_res — a null routes to the reject
    * branch (`InvoiceResponseItemFactory.java:62` throw), so packet/item
    * projections exclude those rows. */
  private def itemEligible: Column =
    col("kind") === "InvIn" || col("pj.gdt_res").isNotNull

  /** T8 — response-item projection
    * (`InvoiceResponseItemFactory.java:16-66`). InvIn: default message
    * "Tạo mới thành công"/success when res_msg is null; res_resource
    * fpt; data = res_json (nullable). */
  def items(s: SparkSession, dir: String): DataFrame =
    staging(s, dir)
      .filter(itemEligible)
      .select(col("id") +: itemFields: _*)
      .transform(Common.presented(_, col("id")))

  /** Valid-domain rows with their G2 batch bucket: `batch_id` =
    * (rank within batch_key) div BatchSize — the deterministic batch
    * restatement of the count-trigger path
    * (`InvoiceResponseBatchProcessor.java:130-140`). */
  private def bucketed(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("batch_key")).orderBy(col("id"))
    staging(s, dir)
      .withColumn("batch_key", batchKey)
      .filter(col("batch_key").isin(graft.model.InvoiceModel.ApiTypes: _*))
      .withColumn("batch_id",
        floor((row_number().over(w) - 1) / BatchSize).cast("int"))
  }

  /** G2 (batch restatement) — count-capped micro-batches per key. */
  def batchBuckets(s: SparkSession, dir: String): DataFrame =
    bucketed(s, dir)
      .groupBy(col("batch_key"), col("batch_id"))
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .transform(Common.presented(_, col("batch_key"), col("batch_id")))

  /** Salt fan-out for [[saltedBuckets]]. */
  val SaltBuckets = 8

  /** G2b — SALTED batch buckets: the skew mitigation SCALE.md promises
    * for the ≤6-value api_type key domain, as a checked query. The
    * batch key widens to (batch_key, salt) with `salt = md5(sid) % 8`,
    * so a hot api_type spreads over [[SaltBuckets]] window partitions
    * instead of serializing on one executor — 6 keys → up to 48
    * parallel partitions, each still emitting ≤ [[BatchSize]]-row
    * batches. The reference never guaranteed cross-subtask batch
    * composition (parallelism 6 already splits a key's records across
    * subtasks, SURVEY §7.2), so per-salt batches are semantically
    * equivalent. md5-derived salt keeps the oracle engine-portable
    * (murmur3 `hash()` is not). */
  def saltedBuckets(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    val salted = staging(s, dir)
      .withColumn("batch_key", batchKey)
      .filter(col("batch_key").isin(graft.model.InvoiceModel.ApiTypes: _*))
      .withColumn("salt", (md5Long(col("sid")) % SaltBuckets).cast("int"))
    val w = Window.partitionBy(col("batch_key"), col("salt")).orderBy(col("id"))
    salted
      .withColumn("batch_id",
        floor((row_number().over(w) - 1) / BatchSize).cast("int"))
      .groupBy(col("batch_key"), col("salt"), col("batch_id"))
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .transform(Common.presented(_, col("batch_key"), col("salt"), col("batch_id")))
  }

  /** G3 — dedup / idempotence guard
    * (`InvoiceResponseBatchProcessor.java:110-121`, key format
    * `InvoiceResponseRecordKeyGenerator.java:9-18`). The harness
    * coarsens id to id%3000 so duplicates actually exist; first
    * occurrence (lowest id) wins, matching arrival order. */
  def dedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("kind"), col("dup_id")).orderBy(col("id"))
    staging(s, dir)
      .withColumn("dup_id", col("id") % 3000)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("kind"), col("dup_id"), col("id"),
        concat_ws("_", col("kind"), col("dup_id"), col("sid"), col("syncid"))
          .as("record_key"))
      .transform(Common.presented(_, col("kind"), col("dup_id")))
  }

  /** G4 — batch → packet aggregation
    * (`InvoiceResponseKafkaRouter.java:28-49`, packet shape
    * `model/response/InvoiceResponsePacket.java:7-24`): one row per
    * flushed batch, `inv_pack_res` = JSON array of items. Struct fields
    * are non-null by construction so Spark's null-omitting `to_json`
    * and DuckDB's null-including `to_json` agree. */
  def packets(s: SparkSession, dir: String): DataFrame =
    bucketed(s, dir)
      .groupBy(col("batch_key"), col("batch_id"))
      .agg(
        count(lit(1)).as("packet_size"),
        to_json(sort_array(collect_list(struct(col("id"), col("sid")))))
          .as("inv_pack_res"))
      .transform(Common.presented(_, col("batch_key"), col("batch_id")))

  /** G4b — full-fidelity packets: the complete T8 item shape
    * (`InvoiceResponsePacket.InvoiceResponseItem` — sid, sync_sid,
    * res_code, message, status, res_resource, code, data) inside the
    * packet JSON, nulls RENDERED (`ignoreNullFields=false`) to match
    * the reference's Jackson serialization of null POJO fields — and,
    * conveniently, DuckDB's `to_json`. Item order inside a packet is
    * the deterministic batch order (by id). */
  def itemPackets(s: SparkSession, dir: String): DataFrame =
    bucketed(s, dir)
      .filter(itemEligible)
      .withColumn("item", struct(col("id"), struct(itemFields: _*).as("it")))
      .groupBy(col("batch_key"), col("batch_id"))
      .agg(to_json(
        struct(transform(sort_array(collect_list(col("item"))),
          x => x.getField("it")).as("inv_pack_res")),
        Map("ignoreNullFields" -> "false")).as("packet_json"))
      .transform(Common.presented(_, col("batch_key"), col("batch_id")))

  /** R2 — api_type → response-topic routing
    * (`InvoiceResponseKafkaRouter.java:52-70`; topic names
    * `application.properties:13-17`). One Kafka write with a computed
    * `topic` column replaces the reference's 5 sinks — Spark's Kafka
    * sink routes per row. */
  def topicRoute(s: SparkSession, dir: String): DataFrame =
    bucketed(s, dir)
      .select(col("id"), col("batch_key"),
        when(col("batch_key") === 10, lit("mtt.crt.response"))
          .when(col("batch_key") === 11, lit("mtt.upd.response"))
          .when(col("batch_key") === 12, lit("mtt.del.response"))
          .when(col("batch_key") === 13, lit("mtt.rep.response"))
          .when(col("batch_key") === 14, lit("mtt.adj.response"))
          .as("topic"))
      .transform(Common.presented(_, col("id")))

  /** T9 — staging row → success-log projection
    * (`TransactionalLogAndDeleteSink.java:134-170`, 13-column binding at
    * `:117-131`): InvIn keeps fpt and callback fields and nulls gdt_res;
    * InvOut the reverse; retry/group_id carry over for both kinds.
    * (`created_date = now()` at `:143` and the always-null
    * `updated_date` excluded from oracle-compared output.) */
  def logProject(s: SparkSession, dir: String): DataFrame = {
    val st = staging(s, dir).withColumn("batch_key", batchKey)
      .filter(col("batch_key").isin(graft.model.InvoiceModel.ApiTypes: _*))
    val isIn = col("kind") === "InvIn"
    st.select(
        col("id"),
        col("tax_schema"),
        col("batch_key").as("api_type"),
        lit(2).cast("tinyint").as("res_type"),
        when(isIn, col("pj.fpt_einvoice_res_code")).as("fpt_einvoice_res_code"),
        when(isIn, col("pj.fpt_einvoice_res_msg")).as("fpt_einvoice_res_msg"),
        col("retry"),
        col("group_id"),
        when(isIn, concat(lit("CB"), col("id") % 3)).as("callback_res_code"),
        when(isIn, concat(lit("CBM"), col("id") % 2)).as("callback_res_msg"),
        col("sid"),
        col("syncid"),
        when(!isIn, col("pj.gdt_res")).as("gdt_res"))
      .transform(Common.presented(_, col("id")))
  }

  /** K3 (batch restatement) — transactional log-and-delete
    * (`TransactionalLogAndDeleteSink.java:65-115`): processed rows land
    * in the success log (T9); this is the delete side, stated as an
    * anti-join — staging rows whose id was NOT processed remain. */
  def deleteRemaining(s: SparkSession, dir: String): DataFrame = {
    val st = staging(s, dir).withColumn("batch_key", batchKey)
    val processed = st.filter(
      col("batch_key").isin(graft.model.InvoiceModel.ApiTypes: _*))
      .select(col("id"))
    st.join(processed, Seq("id"), "left_anti")
      .select(col("id"), col("batch_key"))
      .transform(Common.presented(_, col("id")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_batch_key" -> (keyExtract _),
    "t6_api_domain" -> (apiDomain _),
    "t7_sniff" -> (sniff _),
    "t8_items" -> (items _),
    "g2_batch_buckets" -> (batchBuckets _),
    "g2b_salted_buckets" -> (saltedBuckets _),
    "g3_dedup" -> (dedup _),
    "g4_packets" -> (packets _),
    "g4b_item_packets" -> (itemPackets _),
    "r2_topic_route" -> (topicRoute _),
    "t9_log_project" -> (logProject _),
    "k3_delete_remaining" -> (deleteRemaining _))

  /** Oracles restate the post-extraction values from the same event
    * arithmetic (see RequestOps.oracles note). `bk` below is the G1
    * fallback chain: column (id%11), payload (id%13), else 0. */
  private val bkSql =
    """CASE WHEN event_id % 11 <> 0 OR event_id % 13 <> 0
      |     THEN 10 + event_id % 7 ELSE 0 END""".stripMargin

  private val validSql = s"($bkSql) BETWEEN 10 AND 14"

  val oracles: Map[String, String] = Map(
    "g1_batch_key" ->
      s"""SELECT event_id AS id, CAST($bkSql AS TINYINT) AS batch_key
         |FROM events ORDER BY id""".stripMargin,
    "t6_api_domain" ->
      s"""SELECT event_id AS id, CAST($bkSql AS TINYINT) AS batch_key,
         |       CASE WHEN $validSql THEN 'valid' ELSE 'rejected' END AS domain_status
         |FROM events ORDER BY id""".stripMargin,
    "t7_sniff" ->
      """SELECT event_id AS id,
        |       CASE WHEN user_id % 2 = 0 THEN 'InvIn'
        |            WHEN event_id % 9 <> 0 THEN 'InvOut'
        |            ELSE 'unknown' END AS sniffed_kind
        |FROM events ORDER BY id""".stripMargin,
    "t8_items" ->
      """SELECT event_id AS id,
        |       'S' || CAST(event_id AS VARCHAR) AS sid,
        |       'Y' || CAST(event_id AS VARCHAR) AS sync_sid,
        |       CASE WHEN user_id % 2 = 0 THEN 'C' || CAST(event_id % 4 AS VARCHAR) END AS res_code,
        |       CASE WHEN user_id % 2 = 0 THEN
        |         CASE WHEN event_id % 3 = 0 THEN 'Tạo mới thành công'
        |              ELSE 'E' || CAST(event_id % 3 AS VARCHAR) END END AS message,
        |       CASE WHEN user_id % 2 = 0 THEN
        |         CASE WHEN event_id % 3 = 0 THEN 'success' ELSE 'error' END END AS status,
        |       CASE WHEN user_id % 2 = 0 THEN 'fpt' ELSE 'gdt' END AS res_resource,
        |       CAST(NULL AS INT) AS code,
        |       CASE WHEN user_id % 2 = 0 THEN
        |         CASE WHEN event_id % 5 <> 0 THEN '{"x":' || CAST(event_id % 7 AS VARCHAR) || '}' END
        |         ELSE 'G' || CAST(event_id AS VARCHAR) END AS data
        |FROM events
        |WHERE user_id % 2 = 0 OR event_id % 9 <> 0
        |ORDER BY id""".stripMargin,
    "g2_batch_buckets" ->
      s"""SELECT batch_key, batch_id, count(*) AS cnt,
         |       min(id) AS min_id, max(id) AS max_id
         |FROM (SELECT event_id AS id, CAST($bkSql AS TINYINT) AS batch_key,
         |             CAST((row_number() OVER (PARTITION BY CAST($bkSql AS TINYINT) ORDER BY event_id) - 1) // 100 AS INT) AS batch_id
         |      FROM events WHERE $validSql)
         |GROUP BY batch_key, batch_id
         |ORDER BY batch_key, batch_id""".stripMargin,
    "g2b_salted_buckets" ->
      s"""SELECT batch_key, salt, batch_id, count(*) AS cnt,
         |       min(id) AS min_id, max(id) AS max_id
         |FROM (SELECT id, batch_key, salt,
         |             CAST((row_number() OVER (PARTITION BY batch_key, salt ORDER BY id) - 1) // 100 AS INT) AS batch_id
         |      FROM (SELECT event_id AS id, CAST($bkSql AS TINYINT) AS batch_key,
         |                   CAST(CAST(('0x' || substr(md5('S' || CAST(event_id AS VARCHAR)),1,15)) AS BIGINT) % 8 AS INT) AS salt
         |            FROM events WHERE $validSql))
         |GROUP BY batch_key, salt, batch_id
         |ORDER BY batch_key, salt, batch_id""".stripMargin,
    "g3_dedup" ->
      """SELECT kind, dup_id, id,
        |       kind || '_' || CAST(dup_id AS VARCHAR) || '_S' || CAST(id AS VARCHAR)
        |            || '_Y' || CAST(id AS VARCHAR) AS record_key
        |FROM (SELECT event_id AS id,
        |             CASE WHEN user_id % 2 = 0 THEN 'InvIn' ELSE 'InvOut' END AS kind,
        |             event_id % 3000 AS dup_id
        |      FROM events)
        |QUALIFY row_number() OVER (PARTITION BY kind, dup_id ORDER BY id) = 1
        |ORDER BY kind, dup_id""".stripMargin,
    "g4b_item_packets" ->
      s"""SELECT batch_key, batch_id,
         |       to_json(struct_pack(inv_pack_res := list(struct_pack(
         |         sid := sid, sync_sid := sync_sid, res_code := res_code,
         |         message := message, status := status,
         |         res_resource := res_resource, code := code, data := data
         |       ) ORDER BY id))) AS packet_json
         |FROM (
         |  SELECT batch_key, batch_id, id,
         |         'S' || CAST(id AS VARCHAR) AS sid,
         |         'Y' || CAST(id AS VARCHAR) AS sync_sid,
         |         CASE WHEN is_in THEN 'C' || CAST(id % 4 AS VARCHAR) END AS res_code,
         |         CASE WHEN is_in THEN
         |           CASE WHEN id % 3 = 0 THEN 'Tạo mới thành công'
         |                ELSE 'E' || CAST(id % 3 AS VARCHAR) END END AS message,
         |         CASE WHEN is_in THEN
         |           CASE WHEN id % 3 = 0 THEN 'success' ELSE 'error' END END AS status,
         |         CASE WHEN is_in THEN 'fpt' ELSE 'gdt' END AS res_resource,
         |         CAST(NULL AS INT) AS code,
         |         CASE WHEN is_in THEN
         |           CASE WHEN id % 5 <> 0 THEN '{"x":' || CAST(id % 7 AS VARCHAR) || '}' END
         |           ELSE 'G' || CAST(id AS VARCHAR) END AS data,
         |         is_in, has_gdt
         |  FROM (SELECT event_id AS id, CAST($bkSql AS TINYINT) AS batch_key,
         |               CAST((row_number() OVER (PARTITION BY CAST($bkSql AS TINYINT) ORDER BY event_id) - 1) // 100 AS INT) AS batch_id,
         |               user_id % 2 = 0 AS is_in,
         |               event_id % 9 <> 0 AS has_gdt
         |        FROM events WHERE $validSql)
         |)
         |WHERE is_in OR has_gdt
         |GROUP BY batch_key, batch_id
         |ORDER BY batch_key, batch_id""".stripMargin,
    "g4_packets" ->
      s"""SELECT batch_key, batch_id, count(*) AS packet_size,
         |       to_json(list(struct_pack(id := id, sid := 'S' || CAST(id AS VARCHAR)) ORDER BY id)) AS inv_pack_res
         |FROM (SELECT event_id AS id, CAST($bkSql AS TINYINT) AS batch_key,
         |             CAST((row_number() OVER (PARTITION BY CAST($bkSql AS TINYINT) ORDER BY event_id) - 1) // 100 AS INT) AS batch_id
         |      FROM events WHERE $validSql)
         |GROUP BY batch_key, batch_id
         |ORDER BY batch_key, batch_id""".stripMargin,
    "r2_topic_route" ->
      s"""SELECT event_id AS id, CAST($bkSql AS TINYINT) AS batch_key,
         |       CASE $bkSql WHEN 10 THEN 'mtt.crt.response'
         |            WHEN 11 THEN 'mtt.upd.response'
         |            WHEN 12 THEN 'mtt.del.response'
         |            WHEN 13 THEN 'mtt.rep.response'
         |            WHEN 14 THEN 'mtt.adj.response' END AS topic
         |FROM events WHERE $validSql
         |ORDER BY id""".stripMargin,
    "t9_log_project" ->
      s"""SELECT event_id AS id,
         |       'TX' || CAST(event_id % 10 AS VARCHAR) AS tax_schema,
         |       CAST($bkSql AS TINYINT) AS api_type,
         |       CAST(2 AS TINYINT) AS res_type,
         |       CASE WHEN user_id % 2 = 0 THEN 'C' || CAST(event_id % 4 AS VARCHAR) END AS fpt_einvoice_res_code,
         |       CASE WHEN user_id % 2 = 0 AND event_id % 3 <> 0 THEN 'E' || CAST(event_id % 3 AS VARCHAR) END AS fpt_einvoice_res_msg,
         |       CAST(event_id % 4 AS TINYINT) AS retry,
         |       CAST(event_id % 5 AS TINYINT) AS group_id,
         |       CASE WHEN user_id % 2 = 0 THEN 'CB' || CAST(event_id % 3 AS VARCHAR) END AS callback_res_code,
         |       CASE WHEN user_id % 2 = 0 THEN 'CBM' || CAST(event_id % 2 AS VARCHAR) END AS callback_res_msg,
         |       'S' || CAST(event_id AS VARCHAR) AS sid,
         |       'Y' || CAST(event_id AS VARCHAR) AS syncid,
         |       CASE WHEN user_id % 2 <> 0 AND event_id % 9 <> 0 THEN 'G' || CAST(event_id AS VARCHAR) END AS gdt_res
         |FROM events WHERE $validSql
         |ORDER BY id""".stripMargin,
    "k3_delete_remaining" ->
      s"""SELECT event_id AS id, CAST($bkSql AS TINYINT) AS batch_key
         |FROM events WHERE NOT ($validSql)
         |ORDER BY id""".stripMargin)
}
