package graft

import org.apache.spark.sql.functions._
import graft.operators.ResponseOps

/** The parse-fidelity contract behind the response operators' `pj`
  * struct: [[ResponseOps.staging]] emits the record both serialized
  * (`payload`) and pre-parsed (`pj`), and the operators consume `pj`.
  * That is only sound if deserializing the string with
  * [[ResponseOps.PayloadSchema]] — what a REAL Kafka/JDBC source would
  * do — reproduces `pj` exactly, null-for-null, on every row. */
class PayloadParseSpec extends SparkSpec {

  test("from_json(payload, PayloadSchema) === pj on every staging row") {
    val st = ResponseOps.staging(spark, Sf)
      .withColumn("reparsed", from_json(col("payload"), ResponseOps.PayloadSchema))
    val diverging = st.filter(
      !(col("reparsed") <=> col("pj"))).count()
    assert(diverging === 0)
    // and the probe fields the operators rely on are exercised in both
    // populated and absent forms (the harness modulos guarantee it)
    val n = st.count()
    Seq("api_type", "fpt_einvoice_res_code", "fpt_einvoice_res_msg",
      "fpt_einvoice_res_json", "gdt_res").foreach { f =>
      val present = st.filter(col(s"pj.$f").isNotNull).count()
      assert(present > 0 && present < n, s"$f not exercised both ways")
    }
  }

  test("request side: from_json(j, packElementSchema) === e on every row") {
    val we = graft.operators.RequestOps.withElementJson(
      graft.sources.Tables.events(spark, Sf))
      .withColumn("reparsed",
        from_json(col("j"), graft.model.InvoiceModel.packElementSchema))
    assert(we.filter(!(col("reparsed") <=> col("e"))).count() === 0)
  }
}
