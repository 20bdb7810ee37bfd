package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** The dtype contract for EVERY harness table — EventsSchemaSpec
  * generalized (round 8's lesson: a testdata regen that shifts one
  * physical type takes down every consumer with opaque analysis
  * errors; this spec makes the next shift fail in ONE place with a
  * message naming the column and the fix). Each load-bearing column
  * lists its SUPPORTED dtypes — the set the operators (and, where it
  * matters, the DuckDB oracles) actually handle — not one frozen
  * schema, so benign regens keep passing. A failure here means: add a
  * normalization dispatch at the Tables/ScanOps layer (as eventsTs
  * does for ts) AND mirror the cast in the affected oracle SQL, then
  * widen the set. */
class FixtureSchemaSpec extends SparkSpec {

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val fractional: Set[DataType] = Set(DoubleType)
  private val text: Set[DataType] = Set(StringType)
  private val instant: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  /** table → (column → allowed dtypes). Only columns operators consume
    * in a type-sensitive way are pinned. */
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "events" -> Map("event_id" -> integral, "user_id" -> integral,
      "event_type" -> text, "value" -> fractional, "props" -> text,
      "ts" -> instant),
    "documents" -> Map("doc_id" -> integral, "text" -> text,
      "lang" -> text, "source" -> text, "n_chars" -> integral),
    // embedding MUST stay float: the compiled FloatVecDot fold and the
    // float→double→decimal determinism contract are float32-specific —
    // an array<double> regen needs a dispatched cast here AND
    // `embedding::FLOAT4[]` in SimilarityOps.corpusSql before widening
    "embeddings" -> Map("vec_id" -> integral,
      "embedding" -> Set[DataType](ArrayType(FloatType),
        ArrayType(FloatType, containsNull = false)),
      "label" -> integral),
    "lineitem" -> Map("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> fractional, "l_extendedprice" -> fractional,
      "l_discount" -> fractional, "l_tax" -> fractional,
      "l_returnflag" -> text, "l_linestatus" -> text,
      "l_shipdate" -> instant),
    "orders" -> Map("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> text, "o_totalprice" -> fractional,
      "o_orderdate" -> instant, "o_orderpriority" -> text),
    "customer" -> Map("c_custkey" -> integral, "c_nationkey" -> integral,
      "c_acctbal" -> fractional, "c_mktsegment" -> text),
    "supplier" -> Map("s_suppkey" -> integral, "s_nationkey" -> integral,
      "s_acctbal" -> fractional),
    "part" -> Map("p_partkey" -> integral, "p_size" -> integral,
      "p_retailprice" -> fractional, "p_type" -> text, "p_brand" -> text),
    "nation" -> Map("n_nationkey" -> integral, "n_regionkey" -> integral,
      "n_name" -> text),
    "region" -> Map("r_regionkey" -> integral, "r_name" -> text))

  test("every harness table's load-bearing columns carry supported dtypes") {
    val drifts = for {
      (table, cols) <- contract.toSeq.sortBy(_._1)
      schema = Tables.table(spark, Sf, table).schema
      (name, allowed) <- cols.toSeq.sortBy(_._1)
      drift <- schema.find(_.name == name) match {
        case None => Some(s"$table.$name: column MISSING after regen")
        case Some(f) if !allowed(f.dataType) =>
          Some(s"$table.$name regenerated as ${f.dataType} — supported: " +
            s"${allowed.mkString("/")}; add a normalization dispatch " +
            "(see ScanOps.eventsTs) and mirror it in the oracle SQL")
        case _ => None
      }
    } yield drift
    assert(drifts.isEmpty, drifts.mkString("\n"))
  }
}
