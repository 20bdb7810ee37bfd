package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._

/** Model-based quality filtering over the `documents` table — the
  * LEARNED companion to tx2's heuristic gate (builder brief; no
  * reference analog — the reference's closest shape is its per-row
  * validation split, `/root/reference/src/main/java/com/thaihoc/process/
  * request/InvoiceRequestTransformer.java:98-131`: score a row, route on
  * the verdict).
  *
  * The production pattern this models is the fastText-style quality
  * classifier every large pretraining pipeline runs (hashed bag-of-words
  * features → linear model → threshold): the model is a few KB of
  * weights, inference is embarrassingly parallel, and the only sane
  * 100 TB plan is weights-as-broadcast + one scan-bound projection per
  * document — never a shuffle, never a driver round-trip.
  *
  * The weight vector here is a deterministic stand-in "trained model":
  * weight j is derived from md5("qfw" + j) — computed once driver-side
  * (a real pipeline would load it from the model store) and inlined as a
  * LITERAL array column, which is exactly the plan a broadcast of a real
  * weight array produces: [[QfBuckets]] longs living in the task binary,
  * consumed inside whole-stage codegen. The oracle recomputes the same
  * weights in SQL, so the scoring contract (hash → bucket → weight →
  * integer sum) is pinned cross-engine, bit-for-bit.
  *
  * Integer discipline (the engine-wide contract): token-bucket hashes
  * are [[graft.functions.TextFunctions.md5Long]] 60-bit longs, weights
  * are integers in [-[[QfWeightSpan]]/2, [[QfWeightSpan]]/2], scores are
  * integer sums (|score| ≤ 1000·n_tokens — no overflow anywhere near
  * 2⁶³), and the only double is the final mean, one long/long IEEE
  * division on identical operands on both engines.
  */
object QualityFilterOps {

  /** Hashed-feature bucket count (the fastText `-hash` dimension,
    * harness-sized). */
  val QfBuckets = 64

  /** Weight range: md5-derived integer in [-1000, 1000]. */
  val QfWeightSpan = 2001

  /** The stand-in model: weight j = md5Long("qfw" + j) % span − 1000,
    * computed driver-side with the SAME md5→15-hex-chars→long rule as
    * [[graft.functions.TextFunctions.md5Long]] (QfSpec pins the Scala
    * and column paths against each other). */
  val QfWeights: IndexedSeq[Long] = (0 until QfBuckets).map { j =>
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"qfw$j".getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % QfWeightSpan - 1000L
  }

  /** The inference kernel as a Column: the compiled
    * [[graft.functions.HashedBowScore]] over the literal weight array
    * (one expression call per row; the HOF restatement it replaces runs
    * five interpreted expression evals PER TOKEN — see
    * [[scoreColumnReference]], kept for the spec to pin equivalence). */
  private def scoreColumn(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.HashedBowScore(
      GraftSqlBridge.expression(toks),
      GraftSqlBridge.expression(array(QfWeights.map(lit): _*))))
  }

  /** The pure-`functions._` reference form of [[scoreColumn]] —
    * interpreter-bound (HOF lambda per element), retained ONLY as the
    * spec-side semantic reference; operators must use the compiled
    * expression. */
  private[graft] def scoreColumnReference(toks: Column): Column = {
    val w = array(QfWeights.map(lit): _*)
    aggregate(toks, lit(0L),
      (acc, t) => acc +
        element_at(w, (md5Long(t) % QfBuckets).cast("int") + 1))
  }

  /** Per-document classifier score over any (doc_id, text) frame —
    * sort-free and shuffle-free (one narrow projection), so it binds
    * unchanged to a streaming source. score = Σ_tokens w[bucket(tok)],
    * all integer. */
  private[graft] def scoreCore(docs: DataFrame,
      carry: Seq[Column] = Nil): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(Seq(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      scoreColumn(toks).as("score")) ++ carry: _*)
  }

  /** QF1 — linear quality-classifier inference: hashed bag-of-words
    * features scored against the broadcast weight vector, one
    * scan-bound projection per document (zero shuffle before the
    * presentation sort; the weights are a literal array inside
    * whole-stage codegen). keep = score > 0, the classifier's decision
    * gate — the downstream curation flow consumes `keep` exactly as it
    * consumes tx2's heuristic bucket. */
  def classify(s: SparkSession, dir: String): DataFrame =
    scoreCore(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        (col("score") / col("n_tokens")).as("mean_score"),
        when(col("score") > 0, lit(1)).otherwise(lit(0)).as("keep"))
      .transform(Common.presented(_, col("doc_id")))

  /** QF2's operating points: fixed score thresholds swept by the
    * precision/recall audit. */
  val QfThresholds: Seq[Long] =
    Seq(-500L, -250L, -100L, -50L, 0L, 50L, 100L, 250L, 500L)

  /** QF2 — threshold sweep (the classifier-calibration audit): for each
    * candidate decision threshold θ, the confusion row of "keep docs
    * with score > θ" against tx2's heuristic `ok` verdict as the weak
    * label — n_kept, true positives, precision, recall. The operating
    * points are FIXED thresholds, not rank deciles, deliberately: the
    * whole sweep is then one pass over the scored scan — each doc fans
    * out to the ≤|θ| thresholds via a broadcast cross of a 9-row table,
    * and the 9-group aggregate takes map-side partials — where a
    * decile/PR-curve form would need a global rank (a full sort of the
    * corpus) for the same decision information. At 100 TB this is the
    * difference between a scan and a sort. Label totals ride along as
    * conditional sums, so precision and recall are single divisions of
    * exact integers. */
  def thresholdSweep(s: SparkSession, dir: String): DataFrame = {
    // label is a pure projection of the same text the score reads, so
    // both FUSE into one scan: scoreCore carries TextOps.okLabel (the
    // single definition of tx2's verdict) through its projection
    // (tx13's fusion discipline — a composed score×quality join
    // computes identical rows but scans twice)
    val sc = scoreCore(Tables.documents(s, dir),
      carry = Seq(TextOps.okLabel.as("label")))
    val th = s.createDataFrame(
      s.sparkContext.parallelize(QfThresholds.map(Tuple1(_)), 1))
      .toDF("threshold")
    // after the threshold cross every θ-group contains ALL docs, so the
    // corpus totals ride along as plain aggregates of the same groupBy
    // — no separate totals branch, no second scan of the corpus
    sc.crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("score") > col("threshold"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("score") > col("threshold"), col("label"))
          .otherwise(0L)).as("tp"),
        count(lit(1)).as("n_docs"),
        sum(col("label")).as("n_pos"))
      .select(col("threshold"), col("n_kept"), col("tp"),
        col("n_docs"), col("n_pos"),
        // NULL (not NaN) when a threshold keeps nothing: Spark's
        // long/long divide yields NaN on 0/0 where DuckDB yields NULL —
        // an explicit guard makes both engines emit NULL, so the row
        // stays hash-stable even under a testdata regen that empties a
        // high threshold
        when(col("n_kept") > 0, col("tp") / col("n_kept")).as("precision"),
        when(col("n_pos") > 0, col("tp") / col("n_pos")).as("recall"))
      .transform(Common.presented(_, col("threshold")))
  }

  /** QF3 — per-slice calibration cells: qf2's confusion arithmetic at
    * the decision threshold (score > 0), broken out by (lang, source)
    * — the fairness/QA audit every production filter ships ("does the
    * gate hold its precision on every slice, or is it starving one
    * source?"). One fused scan carries score, label and both slice
    * columns; the cell aggregate is |langs|×|sources| groups with
    * map-side partials; rates are NULL-safe single divisions of exact
    * integers. keep_rate vs base_rate per cell is the drift signal a
    * monitor thresholds (dq2's discipline on the classifier's own
    * output). */
  def calibrationCells(s: SparkSession, dir: String): DataFrame = {
    scoreCore(Tables.documents(s, dir),
        carry = Seq(TextOps.okLabel.as("label"),
          col("lang"), col("source")))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_kept"),
        sum(col("label")).as("n_pos"),
        sum(when(col("score") > 0, col("label")).otherwise(0L)).as("tp"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_kept"),
        col("n_pos"), col("tp"),
        when(col("n_kept") > 0, col("tp") / col("n_kept")).as("precision"),
        (col("n_kept") / col("n_docs")).as("keep_rate"),
        (col("n_pos") / col("n_docs")).as("base_rate"))
      .transform(Common.presented(_, col("lang"), col("source")))
  }

  /** The per-lang keep profile (n_ref docs, kept_ref passing the gate)
    * — the broadcast reference [[keepDriftAgainst]] monitors micro-
    * batches against (dq2's reference-profile shape for the
    * classifier's own output). */
  def keepProfile(docs: DataFrame): DataFrame =
    scoreCore(docs, carry = Seq(col("lang")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ref"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("kept_ref"))

  /** The classifier-DRIFT monitor core: one micro-batch scored and
    * collapsed to per-lang keep counts, compared against the broadcast
    * reference profile — the "is the gate suddenly starving a slice"
    * alarm a production filter runs on every ingest batch (dq2's
    * `driftAgainst` discipline applied to the classifier's own output).
    * The flag is keep-RATE divergence beyond 2× either way, by integer
    * cross-multiplication — exact, zero-count-safe, no division. A
    * lang absent from either side surfaces with zero counts and does
    * NOT flag (zero rows carry no rate evidence — both cross-products
    * are 0); the consumer watches the emitted counts for
    * novel/vanished langs, the same way dq1 separates presence checks
    * from dq2's distribution checks. Bound per micro-batch from
    * `foreachBatch` (QualityFilterSpec plants a zero-keep batch and
    * pins flag, no-flag and absent-lang rows). */
  def keepDriftAgainst(batch: DataFrame, reference: DataFrame): DataFrame = {
    val cells = scoreCore(batch, carry = Seq(col("lang")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_batch"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("kept_batch"))
    // cross-products in DOUBLE, the ir8 guard: each long operand
    // converts exactly below 2^53, and at the 100 TB design point a
    // corpus-scale reference (n_ref ~10^12) times a wide batch would
    // push the i64 product past 2^63 — ANSI overflow killing the
    // monitor batch, or a silent wrap flipping the flag
    def d(c: Column) = c.cast("double")
    reference.join(cells, Seq("lang"), "full_outer")
      .na.fill(0L, Seq("n_ref", "kept_ref", "n_batch", "kept_batch"))
      .select(col("lang"), col("n_ref"), col("kept_ref"),
        col("n_batch"), col("kept_batch"),
        when(d(col("kept_batch")) * d(col("n_ref")) >
            lit(2d) * d(col("kept_ref")) * d(col("n_batch")), 1)
          .when(d(col("kept_ref")) * d(col("n_batch")) >
            lit(2d) * d(col("kept_batch")) * d(col("n_ref")), 1)
          .otherwise(0).as("drift"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qf1_classifier" -> (classify _),
    "qf2_threshold_sweep" -> (thresholdSweep _),
    "qf3_calibration_cells" -> (calibrationCells _))

  private val toksSql = tokensSql("text")
  private val weightsSql =
    s"""(SELECT j, ${md5LongSql("'qfw' || CAST(j AS VARCHAR)")} % $QfWeightSpan - 1000 AS wt
       |      FROM (SELECT CAST(unnest(range($QfBuckets)) AS BIGINT) AS j))""".stripMargin
  // n_tokens is len() per DOCUMENT (not a count of unnested token rows)
  // and the score sum left-joins back, so a document whose token list is
  // NULL (null text) still emits its row with NULL n_tokens/score —
  // matching the Spark side's size()/null-poisoned projection instead of
  // vanishing from the oracle under a null-text fixture regen
  private val scoreSql =
    s"""SELECT d.doc_id, len($toksSql) AS n_tokens, sums.score
       |      FROM documents d
       |      LEFT JOIN (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score
       |                 FROM (SELECT doc_id, ${md5LongSql("t.tok")} % $QfBuckets AS j
       |                       FROM (SELECT doc_id, unnest($toksSql) AS tok
       |                             FROM documents) t) f
       |                 JOIN w USING (j)
       |                 GROUP BY doc_id) sums
       |      ON sums.doc_id = d.doc_id""".stripMargin
  private val stopList =
    TextOps.StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
  private val labelSql =
    s"""CASE WHEN len($toksSql) >= 30
       |        AND len(list_filter($toksSql, t -> list_contains($stopList, t))) * 2 <= len($toksSql)
       |        AND len(list_distinct($toksSql)) * 3 >= len($toksSql)
       |   THEN 1 ELSE 0 END""".stripMargin

  val oracles: Map[String, String] = Map(
    "qf1_classifier" ->
      s"""WITH w AS $weightsSql,
         |sc AS ($scoreSql)
         |SELECT doc_id, n_tokens, score, score / n_tokens AS mean_score,
         |       CASE WHEN score > 0 THEN 1 ELSE 0 END AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,
    "qf2_threshold_sweep" ->
      s"""WITH w AS $weightsSql,
         |sc AS ($scoreSql),
         |lab AS (SELECT doc_id, CAST($labelSql AS BIGINT) AS label
         |        FROM documents),
         |j AS (SELECT sc.doc_id, score, label
         |      FROM sc JOIN lab ON lab.doc_id = sc.doc_id),
         |th AS (SELECT CAST(unnest([${QfThresholds.mkString(", ")}]) AS BIGINT)
         |              AS threshold),
         |tot AS (SELECT count(*) AS n_docs, CAST(sum(label) AS BIGINT) AS n_pos
         |        FROM j),
         |conf AS (SELECT threshold,
         |                CAST(sum(CASE WHEN score > threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |                CAST(sum(CASE WHEN score > threshold THEN label ELSE 0 END) AS BIGINT) AS tp
         |         FROM j CROSS JOIN th GROUP BY threshold)
         |SELECT threshold, n_kept, tp, n_docs, n_pos,
         |       CASE WHEN n_kept > 0 THEN tp / n_kept END AS precision,
         |       CASE WHEN n_pos > 0 THEN tp / n_pos END AS recall
         |FROM conf, tot ORDER BY threshold""".stripMargin,
    "qf3_calibration_cells" ->
      s"""WITH w AS $weightsSql,
         |sc AS ($scoreSql),
         |lab AS (SELECT doc_id, CAST($labelSql AS BIGINT) AS label,
         |               lang, source
         |        FROM documents),
         |j AS (SELECT sc.doc_id, score, label, lang, source
         |      FROM sc JOIN lab ON lab.doc_id = sc.doc_id)
         |SELECT lang, source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(sum(label) AS BIGINT) AS n_pos,
         |       CAST(sum(CASE WHEN score > 0 THEN label ELSE 0 END) AS BIGINT) AS tp,
         |       CASE WHEN sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) > 0
         |            THEN CAST(sum(CASE WHEN score > 0 THEN label ELSE 0 END) AS BIGINT)
         |                 / CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |       END AS precision,
         |       CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         / count(*) AS keep_rate,
         |       CAST(sum(label) AS BIGINT) / count(*) AS base_rate
         |FROM j GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin)
}
