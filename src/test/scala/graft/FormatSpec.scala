package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source/sink format breadth beyond the harness parquet: ORC, CSV and
  * JSON-lines round-trips preserve rows, and the columnar formats keep
  * predicate pushdown (the reference's Kafka value-only strings are the
  * JSON-lines case — schema-on-read with an explicit schema, never
  * inference, which at scale costs a full pre-scan). */
class FormatSpec extends SparkSpec {

  private lazy val src = Tables.events(spark, Sf)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  test("ORC round-trip with pushdown") {
    val dir = Files.createTempDirectory("fmt_orc").toString
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    val plan = back.filter(col("event_id") > 500)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(event_id,500)"))
  }

  test("CSV round-trip with explicit schema") {
    val dir = Files.createTempDirectory("fmt_csv").toString
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(src.schema).option("header", "true").csv(dir)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("JSON-lines round-trip with explicit schema (the Kafka-value shape)") {
    val dir = Files.createTempDirectory("fmt_json").toString
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
    // and the from_json path used by the request pipeline parses the
    // same lines when they arrive as raw strings (value-only topic)
    val raw = spark.read.text(dir)
    val parsed = raw.select(from_json(col("value"),
        org.apache.spark.sql.types.StructType(src.schema.fields)).as("e"))
      .select(col("e.*"))
    assert(parsed.exceptAll(src).count() === 0)
  }
}
