package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.streaming.RequestPipeline

/** SURVEY §5.3 — property-based invariants (scalacheck) over the request
  * transform: random packets → explode is lossless and every element
  * lands in exactly one of {staged, retry}. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val fieldGen: Gen[Option[String]] =
    Gen.option(Gen.identifier.map(_.take(8)))

  /** One random inv_pack element: each probed field present/absent at
    * top level and/or nested under inv, api_type sometimes missing. */
  private val elemGen: Gen[String] = for {
    sidTop <- fieldGen; sidInv <- fieldGen
    staxTop <- fieldGen; staxInv <- fieldGen
    sync <- fieldGen
    api <- Gen.option(Gen.choose(10, 16))
  } yield {
    def q(k: String, v: Option[String]) = v.map(x => s""""$k":"$x"""")
    val inv = Seq(q("sid", sidInv), q("stax", staxInv)).flatten.mkString(",")
    (Seq(q("sid", sidTop), q("stax", staxTop), q("syncid", sync)).flatten ++
      api.map(a => s""""api_type":$a""") :+ s""""inv":{$inv}""")
      .mkString("{", ",", "}")
  }

  private val packetGen: Gen[List[String]] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, elemGen))

  test("request transform: branches partition every element; pos is the packet index") {
    import spark.implicits._
    check(Prop.forAllNoShrink(Gen.listOfN(5, packetGen)) { packets =>
      val json = packets.map(p => s"""{"inv_pack":[${p.mkString(",")}]}""")
      val out = RequestPipeline.transform(json.toDF("value")).cache()
      try {
        val total = packets.map(_.size).sum
        val staged = out.filter(col("error_message").isNull).count()
        val retry = out.filter(col("error_message").isNotNull).count()
        val posCounts = out.groupBy("pos").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val expected = packets.flatMap(_.indices).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        val groupIdOk = out.filter(col("group_id") =!=
          pmod(col("pos"), lit(5)).cast("tinyint")).count() == 0
        val syncidOk = out.filter(col("error_message").isNull &&
          col("syncid").isNull).count() == 0
        (staged + retry == total) && posCounts == expected &&
          groupIdOk && syncidOk
      } finally out.unpersist()
    }, 10)
  }

  test("dedup idempotence: processing a batch twice equals once") {
    import spark.implicits._
    check(Prop.forAllNoShrink(Gen.listOfN(40, Gen.choose(0, 12))) { ids =>
      val once = ids.toDF("id").dropDuplicates("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      val twice = (ids ++ ids).toDF("id").dropDuplicates("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      once == twice
    }, 5)
  }

  test("presented(df, keys) is row-for-row identical to orderBy(keys) on random frames") {
    import spark.implicits._
    // the single-partition presentation sort must preserve the exact
    // global order of the range sort it replaced (ties included: both
    // are followed by the same deterministic unique-key ordering in
    // registered queries, but the invariant is checked on DUPLICATE
    // keys too via the secondary column)
    val rowGen = Gen.zip(Gen.choose(0, 5), Gen.choose(-100, 100))
    check(Prop.forAllNoShrink(Gen.listOfN(60, rowGen)) { rows =>
      val df = rows.toDF("k", "v")
      val a = graft.operators.Common.presented(df, col("k"), col("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val b = df.orderBy(col("k"), col("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      a == b
    }, 5)
  }

  test("termBucketOf == termBucketCol on arbitrary unicode strings (the static-predicate soundness)") {
    import spark.implicits._
    // ir15/ir17's partition pruning is only sound if the driver-side
    // bucket function reproduces the engine's for ANY token the
    // tokenizer could emit — not just the fixture vocabulary. md5
    // agreement hinges on identical UTF-8 byte encoding on both
    // sides, so the generator leans on multibyte and astral chars.
    // code points stay WHOLE (astral chars as full surrogate pairs):
    // parquet strings are valid UTF-8, so a lone surrogate is out of
    // contract — and it would round-trip through UTF8String as '?',
    // changing the comparison key itself
    val tokGen = Gen.nonEmptyListOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("ä", "ß", "中", "文", "é", "λ", "ж"),
      1 -> Gen.oneOf("😀", "🚀", "🐘", "𝄞")) // surrogate pairs intact
    ).map(_.mkString)
    check(Prop.forAllNoShrink(Gen.listOfN(50, tokGen)) { toks =>
      val got = toks.toDF("tok")
        .select(col("tok"),
          graft.operators.RetrievalOps.termBucketCol(col("tok")).as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      toks.forall(t =>
        got(t) == graft.operators.RetrievalOps.termBucketOf(t))
    }, 5)
  }

  test("tx8 max_run equals the plain-Scala run-length reference on random token lists") {
    import spark.implicits._
    // small alphabet so runs actually form; batch the random docs into
    // ONE DataFrame per prop evaluation to keep the round-trips cheap
    val docGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
    check(Prop.forAllNoShrink(Gen.listOfN(25, docGen)) { docs =>
      def refRun(ts: List[String]): Int =
        ts.foldLeft(("", 0, 0)) { case ((prev, cur, mx), t) =>
          val c = if (t == prev) cur + 1 else 1
          (t, c, math.max(mx, c))
        }._3
      def refDup(ts: List[String]): Long =
        if (ts.size < 2) 0L
        else (ts.size - 1) - ts.sliding(2).map(_.mkString(" ")).toSet.size
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      graft.operators.TextOps.repetitionCore(df).collect().forall { r =>
        val ts = docs(r.getAs[Long]("doc_id").toInt)
        r.getAs[Int]("max_run") == refRun(ts) &&
          r.getAs[Long]("n_dup_bigrams") == refDup(ts)
      }
    }, 5)
  }

  test("tx20 top-gram equals the plain-Scala argmax reference on random token lists") {
    import spark.implicits._
    // tiny alphabet so n-grams repeat and ties actually occur — the
    // tie-break (count DESC, then gram ASC by binary order) is the part
    // worth fuzzing; reference recomputes the argmax independently
    val docGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
    check(Prop.forAllNoShrink(Gen.listOfN(25, docGen)) { docs =>
      def ref(ts: List[String], n: Int): Option[(String, Int)] =
        if (ts.size < n) None
        else {
          val counts = ts.sliding(n).map(_.mkString(" ")).toList
            .groupBy(identity).view.mapValues(_.size).toMap
          Some(counts.toSeq.minBy { case (g, c) => (-c, g) } match {
            case (g, c) => (g, c)
          })
        }
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      graft.operators.TextOps.topGramCore(df).collect().forall { r =>
        val ts = docs(r.getAs[Long]("doc_id").toInt)
        Seq(2, 3, 4).forall { n =>
          val got = Option(r.getAs[String](s"top${n}_gram"))
            .map(g => (g, r.getAs[Long](s"top${n}_count").toInt))
          got == ref(ts, n) && (ref(ts, n) match {
            case Some((g, c)) =>
              val len = ts.mkString(" ").length
              r.getAs[Double](s"top${n}_mass") ==
                (c.toLong * g.length).toDouble / len.toDouble
            case None => r.isNullAt(r.fieldIndex(s"top${n}_mass"))
          })
        }
      }
    }, 5)
  }

  test("tx20 planted boilerplate loop dominates; short docs yield null legs") {
    import spark.implicits._
    // "x y x y x y" — bigram "x y" occurs 3×, covering 9 of 11 chars;
    // the tie between "x y" and "y x" (2 each) inside "x y x y x"
    // breaks to the lexicographically smaller gram
    val df = Seq(
      (1L, "x y x y x y"),
      (2L, "x y x y x"),
      (3L, "solo"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.topGramCore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("top2_gram") === "x y")
    assert(out(1L).getAs[Long]("top2_count") === 3L)
    assert(out(1L).getAs[Double]("top2_mass") === 9.0 / 11.0)
    // tie at count 2: "x y" < "y x" in binary order
    assert(out(2L).getAs[String]("top2_gram") === "x y")
    assert(out(2L).getAs[Long]("top2_count") === 2L)
    // one token: no bigrams at all
    assert(out(3L).isNullAt(out(3L).fieldIndex("top2_gram")))
    // two tokens: a bigram exists but no trigram
    assert(out(4L).getAs[String]("top2_gram") === "a b")
    assert(out(4L).isNullAt(out(4L).fieldIndex("top3_gram")))
  }

  test("property: bloom filter never false-negatives and codegen == library probe") {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import graft.functions.{BloomBuildAgg, BloomMightContain}
    import spark.implicits._
    val keysGen = Gen.nonEmptyListOf(Gen.choose(-100000L, 100000L))
    check(Prop.forAllNoShrink(keysGen, keysGen) { (members, probes) =>
      val bytes = members.toDF("k")
        .agg(column(BloomBuildAgg(expression(col("k")), 4096, 0.03)
          .toAggregateExpression()))
        .head().getAs[Array[Byte]](0)
      val lib = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      val hits = (members ++ probes).distinct.toDF("k")
        .select(col("k"), column(BloomMightContain(
          expression(lit(bytes)), expression(col("k")))).as("hit"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      members.forall(hits(_)) && // no false negatives, ever
        hits.forall { case (k, h) => h == lib.mightContainLong(k) }
    }, 10)
  }

  test("property: containment ratios match a plain-Scala shingle reference") {
    import spark.implicits._
    import graft.functions.ShingleExpressions._
    import graft.functions.TextFunctions.tokens
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    // plain-Scala reference: hashed-bigram sets via the same md5-60bit rule
    def hs(text: String): Set[Long] = {
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet[String]
        .map { s =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val d = md.digest(s.getBytes("UTF-8"))
          (0 until 15).foldLeft(0L) { (h, k) =>
            val b = d(k / 2) & 0xff
            (h << 4) | (if (k % 2 == 0) b >>> 4 else b & 0xf)
          }
        }
    }
    check(Prop.forAllNoShrink(textGen, textGen) { (ta, tb) =>
      val (sa, sb) = (hs(ta), hs(tb))
      sa.isEmpty || sb.isEmpty || {
        val df = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
          .select(col("doc_id"),
            hashedShingleSet(tokens(col("text")), 2).as("hs"))
        val inter = df.as("x").join(df.as("y"),
            col("x.doc_id") < col("y.doc_id"))
          .select(sortedIntersectCount(col("x.hs"), col("y.hs")).cast("long"),
            size(col("x.hs")).cast("long"), size(col("y.hs")).cast("long"))
          .head()
        inter.getLong(0) == (sa & sb).size &&
          inter.getLong(1) == sa.size && inter.getLong(2) == sb.size
      }
    }, 15)
  }

  test("property: dotD is BIT-exactly the plain-Scala left fold of double products") {
    // the fold contract every compared double in the x-family rests on
    // (cosines, squared-L2, ADC sums all reach the oracle hash through
    // FloatVecDot): each product in double, accumulated left-to-right —
    // compared via doubleToLongBits, not a tolerance
    import spark.implicits._
    import graft.functions.VectorFunctions.dotD
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(64)
      (i.toLong, Array.fill(n)((rnd.nextFloat() - 0.5f) * 10f),
        Array.fill(n)((rnd.nextFloat() - 0.5f) * 10f))
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), dotD(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, b) =>
      val ref = a.zip(b).foldLeft(0.0)((acc, p) =>
        acc + p._1.toDouble * p._2.toDouble)
      assert(java.lang.Double.doubleToLongBits(got(id)) ===
        java.lang.Double.doubleToLongBits(ref),
        s"row $id: ${got(id)} != fold $ref")
    }
  }
}
