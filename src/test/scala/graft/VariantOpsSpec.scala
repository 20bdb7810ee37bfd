package graft

import graft.operators.{RequestOps, VariantOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** VARIANT semantics the oracles can't see: the missing-path contract
  * the fallback coalesce relies on, agreement between the variant path
  * and the schema-full struct path over identical JSON, and the
  * schema-drift observability that motivates the type. */
class VariantOpsSpec extends SparkSpec {
  import spark.implicits._

  test("try_variant_get yields NULL for missing paths and typed values for present ones") {
    val r = Seq("""{"a": 5, "inv": {"b": "x"}}""").toDF("j")
      .select(
        try_variant_get(parse_json($"j"), "$.a", "long").as("a"),
        try_variant_get(parse_json($"j"), "$.missing", "string").as("m"),
        try_variant_get(parse_json($"j"), "$.inv.b", "string").as("b"),
        try_variant_get(parse_json($"j"), "$.inv.missing", "string").as("im"))
      .head()
    assert(r.getLong(0) === 5L)
    assert(r.isNullAt(1))
    assert(r.getString(2) === "x")
    assert(r.isNullAt(3))
  }

  test("variant extraction equals the schema-full struct extraction row-for-row") {
    // same JSON, two parse paths: parse_json+try_variant_get (v1) vs
    // the from_json-equivalent struct arithmetic that t3 consumes
    val viaVariant = VariantOps.variantExtract(spark, Sf)
    val viaStruct = RequestOps.withElementJson(Tables.events(spark, Sf))
      .select(
        col("event_id"),
        coalesce(col("e.stax"), col("e.inv.stax")).as("stax"),
        coalesce(col("e.sid"), col("e.inv.sid")).as("sid"),
        coalesce(col("e.syncid"), col("e.inv.syncid")).as("syncid"),
        col("e.api_type").as("api_type"))
      .orderBy(col("event_id"))
    assert(viaVariant.collect().toSeq === viaStruct.collect().toSeq)
  }

  test("schema_of_variant observes the per-row schema drift v1 exists for") {
    val schemas = RequestOps.withElementJson(Tables.events(spark, Sf))
      .select(schema_of_variant(parse_json(col("j"))).as("sch"))
      .distinct().as[String].collect()
    // field placement varies row to row — multiple distinct shapes,
    // every one an OBJECT (never a bare scalar)
    assert(schemas.length > 1)
    assert(schemas.forall(_.startsWith("OBJECT<")))
  }
}
