package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Common, QualityFilterOps, TextOps}
import graft.sources.Tables

/** The learned quality-filter tier (qf1/qf2) against plain-Scala
  * references: the driver-side weight table must equal the column-path
  * md5 derivation, the classifier score must equal a per-token Scala
  * replay, the sweep's confusion rows must equal brute-force counting,
  * and the inference plan must stay shuffle-free (the whole point of
  * the weights-as-literal design). The streaming test binds the same
  * scoreCore to a MemoryStream — inference is stateless, so streamed
  * scores must equal the batch rule row-for-row.
  */
class QualityFilterSpec extends SparkSpec {

  private def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  test("qf weights: driver-side MessageDigest table == the column md5Long path") {
    val viaColumns = spark.range(QualityFilterOps.QfBuckets)
      .select(((Common.md5Long(concat(lit("qfw"), col("id").cast("string")))
        % QualityFilterOps.QfWeightSpan) - 1000L).as("w"))
      .collect().map(_.getLong(0)).toIndexedSeq
    assert(viaColumns == QualityFilterOps.QfWeights,
      "literal weight array drifted from the md5 column derivation")
    assert(QualityFilterOps.QfWeights.forall(w => w >= -1000L && w <= 1000L))
  }

  test("qf1: score, mean and keep equal a per-token Scala replay") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = QualityFilterOps.classify(spark, Sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val text = docs(r.getLong(0))
      val toks = text.split(" ", -1)
      val score = toks.map(t => QualityFilterOps.QfWeights(
        (md5Long60(t) % QualityFilterOps.QfBuckets).toInt)).sum
      assert(r.getLong(1) == toks.length, s"doc ${r.getLong(0)} n_tokens")
      assert(r.getLong(2) == score, s"doc ${r.getLong(0)} score")
      assert(r.getDouble(3) == score.toDouble / toks.length)
      assert(r.getInt(4) == (if (score > 0) 1 else 0))
    }
    // both verdicts must occur, or the gate is vacuous at fixture scale
    val keeps = got.map(_.getInt(4)).toSet
    assert(keeps == Set(0, 1), s"degenerate keep distribution: $keeps")
  }

  test("compiled HashedBowScore == the interpreted HOF reference on every fixture doc") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions.tokens
    val cmp = Tables.documents(spark, Sf).select(
      col("doc_id"),
      QualityFilterOps.scoreColumnReference(tokens(col("text"))).as("ref"))
      .join(QualityFilterOps.scoreCore(Tables.documents(spark, Sf))
        .select(col("doc_id"), col("score")), Seq("doc_id"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.getLong(0)}: compiled score drifted from the HOF reference"))
  }

  test("hashed_bow_score is callable from SQL with an inline weight table") {
    GraftExtensions.register(spark)
    // 2-bucket table: every token hashes to bucket md5Long(t) % 2
    val r = spark.sql(
      """SELECT hashed_bow_score(split('alpha beta', ' '),
        |         array(CAST(10 AS BIGINT), CAST(-3 AS BIGINT))) AS s""".stripMargin)
      .head().getLong(0)
    val want = Seq("alpha", "beta").map(t =>
      if (md5Long60(t) % 2 == 0) 10L else -3L).sum
    assert(r == want)
    // malformed-but-type-checked SQL input must yield NULL, never a
    // task-killing throw: null token, null weight slot, empty table
    val edges = spark.sql(
      """SELECT hashed_bow_score(array('a', CAST(NULL AS STRING)),
        |         array(CAST(1 AS BIGINT))) AS null_tok,
        |       hashed_bow_score(split('a', ' '),
        |         array(CAST(NULL AS BIGINT))) AS null_wt,
        |       hashed_bow_score(split('a', ' '),
        |         CAST(array() AS ARRAY<BIGINT>)) AS empty_wt,
        |       hashed_bow_score(split('a', ' '), array()) AS bare_empty""".stripMargin)
      .head()
    assert(edges.isNullAt(0) && edges.isNullAt(1) && edges.isNullAt(2))
    // a BARE untyped empty literal (array<null>) is accepted as the
    // degenerate no-model table — same NULL verdict, no cast required
    assert(edges.isNullAt(3), "bare array() must be NULL, not an analysis error")
    // an array<int> weight literal is read natively (integral widening
    // in the element reader, no Catalyst cast) — a SQL caller does not
    // have to CAST every weight to BIGINT by hand...
    val coerced = spark.sql(
      "SELECT hashed_bow_score(split('alpha beta', ' '), array(10, -3)) AS s")
      .head().getLong(0)
    assert(coerced == want, "int weight literals must widen to bigint")
    // ...but a FRACTIONAL weight table fails analysis loudly in every
    // session mode — under non-ANSI legacy coercion an implicit-cast
    // signature would silently truncate the model to bigint
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT hashed_bow_score(split('a', ' '), array(0.5, 1.5)) AS s")
        .head()
    }
    assert(err.getMessage.contains("hashed_bow_score"),
      s"expected the kernel's own type-check message, got: ${err.getMessage}")
  }

  test("qf1 plan: inference is shuffle-free (only the presentation exchange)") {
    val plan = QualityFilterOps.classify(spark, Sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected only the presentation repartition(1), got $exchanges:\n$plan")
  }

  test("qf2: every threshold row equals brute-force confusion counting") {
    val scores = QualityFilterOps.classify(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val labels = TextOps.qualityCore(Tables.documents(spark, Sf)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (if (r.getAs[String]("quality_bucket") == "ok") 1L else 0L)).toMap
    val nPos = labels.values.sum
    val rows = QualityFilterOps.thresholdSweep(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == QualityFilterOps.QfThresholds)
    rows.foreach { r =>
      val th = r.getLong(0)
      val kept = scores.filter(_._2 > th).keySet
      val tp = kept.toSeq.map(labels).sum
      assert(r.getLong(1) == kept.size, s"θ=$th n_kept")
      assert(r.getLong(2) == tp, s"θ=$th tp")
      assert(r.getLong(3) == scores.size && r.getLong(4) == nPos)
      // branch like the qf3 test: on a fixture where a high threshold
      // keeps zero docs the operator's guard yields NULL precision — an
      // unconditional getDouble would NPE instead of failing an assert
      if (kept.nonEmpty)
        assert(r.getDouble(5) == tp.toDouble / kept.size, s"θ=$th precision")
      else assert(r.isNullAt(5), s"θ=$th precision must be NULL on empty keep")
      if (nPos > 0)
        assert(r.getDouble(6) == tp.toDouble / nPos, s"θ=$th recall")
      else assert(r.isNullAt(6), s"θ=$th recall must be NULL with no positives")
    }
    // monotonicity: raising the threshold never keeps more
    val kept = rows.map(_.getLong(1)).toSeq
    assert(kept == kept.sorted.reverse, "n_kept not monotone in θ")
  }

  test("qf3: every (lang, source) cell equals brute-force slice counting") {
    val scores = QualityFilterOps.classify(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val labels = TextOps.qualityCore(Tables.documents(spark, Sf)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (if (r.getAs[String]("quality_bucket") == "ok") 1L else 0L)).toMap
    val slices = Tables.documents(spark, Sf)
      .select("doc_id", "lang", "source").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val rows = QualityFilterOps.calibrationCells(spark, Sf).collect()
    val byCell = slices.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == byCell.keySet)
    rows.foreach { r =>
      val ids = byCell((r.getString(0), r.getString(1)))
      val kept = ids.filter(scores(_) > 0L)
      val tp = kept.map(labels).sum
      assert(r.getLong(2) == ids.size, "n_docs")
      assert(r.getLong(3) == kept.size, "n_kept")
      assert(r.getLong(4) == ids.map(labels).sum, "n_pos")
      assert(r.getLong(5) == tp, "tp")
      if (kept.nonEmpty)
        assert(r.getDouble(6) == tp.toDouble / kept.size, "precision")
      else assert(r.isNullAt(6), "precision must be NULL on an empty keep set")
      assert(r.getDouble(7) == kept.size.toDouble / ids.size, "keep_rate")
    }
  }

  test("qf fuzz: random token soups — compiled score == Scala replay, 3 seeds") {
    import spark.implicits._
    for (seed <- Seq(11, 19, 37)) {
      val rnd = new scala.util.Random(seed)
      // random texts over a random vocabulary, including repeated and
      // 1-char tokens; empty-ish docs exercise the single-token edge
      val vocab = (0 until 50).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val docs = (1L to 60L).map { i =>
        val n = 1 + rnd.nextInt(30)
        (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = QualityFilterOps.scoreCore(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ", -1)
        val want = toks.map(t => QualityFilterOps.QfWeights(
          (md5Long60(t) % QualityFilterOps.QfBuckets).toInt)).sum
        assert(got(id) == ((toks.length.toLong, want)), s"seed $seed doc $id")
      }
    }
  }

  test("qf drift monitor: a low-score planted batch flags its lang; an identical-rate batch does not") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, Sf)
    val reference = QualityFilterOps.keepProfile(docs)
    val refRows = reference.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val someLang = refRows.collect {
      case (l, (_, kept)) if kept > 0 => l }.head
    // tokens the stand-in model HATES: weight < -500 → a doc of them
    // scores far below 0 and the gate drops it
    val badToks = Iterator.from(0).map(i => s"tok$i")
      .filter { t =>
        val w = QualityFilterOps.QfWeights(
          (md5Long60(t) % QualityFilterOps.QfBuckets).toInt)
        w < -500L
      }.take(5).toSeq
    val planted = (1L to 20L).map(i =>
      (i, badToks.mkString(" "), someLang))
    // control batch: the lang's EXACT fixture docs → identical keep
    // rate by construction → no flag
    val control = docs.filter(col("lang") === someLang)
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSeq
    val in = MemoryStream[(Long, String, String)]
    val flags = new scala.collection.mutable.ArrayBuffer[(Long, String, Int)]
    val q = in.toDF().toDF("doc_id", "text", "lang").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        QualityFilterOps.keepDriftAgainst(batch, reference)
          .collect().foreach { r =>
            flags.synchronized {
              flags += ((id, r.getString(0), r.getAs[Int]("drift")))
            }
          }
        ()
      }.start()
    try {
      in.addData(control: _*)
      q.processAllAvailable()
      in.addData(planted: _*)
      q.processAllAvailable()
      val byBatch = flags.groupBy(_._1)
      assert(byBatch(0L).collect {
        case (_, l, d) if l == someLang => d }.head == 0,
        "identical-rate batch must not flag")
      assert(byBatch(1L).collect {
        case (_, l, d) if l == someLang => d }.head == 1,
        "planted zero-keep batch must flag its lang")
      // a lang absent from the batch has zero batch counts on both
      // sides of the cross-multiplication — no rate evidence, no flag
      val other = refRows.keys.find(_ != someLang)
      other.foreach { l =>
        assert(byBatch(1L).collect { case (_, `l`, d) => d }.head == 0,
          "an absent lang carries no rate evidence and must not flag")
      }
    } finally q.stop()
  }

  test("qf streaming: scored micro-batches equal the batch rule") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val q = QualityFilterOps.scoreCore(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qf_stream")
      .outputMode("append").start()
    try {
      in.addData(1L -> "the quick brown fox", 2L -> "of and to in")
      q.processAllAvailable()
      in.addData(3L -> "the quick brown fox") // same text, later batch
      q.processAllAvailable()
      val got = spark.table("qf_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = Seq(1L -> "the quick brown fox", 2L -> "of and to in",
          3L -> "the quick brown fox").map { case (id, text) =>
        val toks = text.split(" ", -1)
        (id, toks.length.toLong, toks.map(t => QualityFilterOps.QfWeights(
          (md5Long60(t) % QualityFilterOps.QfBuckets).toInt)).sum)
      }.toSet
      assert(got == want)
      // identical text scores identically in whichever batch it arrives
      val byId = got.map(r => r._1 -> r._3).toMap
      assert(byId(1L) == byId(3L))
    } finally q.stop()
  }
}
