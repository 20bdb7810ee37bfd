package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotD
import graft.operators.SimilarityOps

/** Product-quantization contracts x8/x9's oracle parity can't state:
  * the encode is lossless exactly on codebook vectors, and the ADC
  * identity — an ADC distance IS the exact distance to the
  * RECONSTRUCTED (quantized) vector, so for zero-error vectors it
  * equals the true distance. */
class PqSpec extends SparkSpec {

  private def emb = graft.sources.Tables.embeddings(spark, Sf)
    .select(col("vec_id"), col("embedding").cast("array<float>").as("v"))

  /** The ONE reference SQ8 quantizer both x21 and x22 tests pin
    * against: per-dim (mn, mx) plus the clamped mid-tread code rule. */
  private lazy val sq8Ref: (Map[Long, Array[Double]], Array[Double],
      Array[Double], (Double, Int) => Int) = {
    val ref = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray))
    val dims = ref.head._2.length
    val mn = Array.tabulate(dims)(d => ref.map(_._2(d)).min)
    val mx = Array.tabulate(dims)(d => ref.map(_._2(d)).max)
    def codeOf(x: Double, d: Int): Int =
      if (mx(d) > mn(d))
        math.min(255L, math.max(0L,
          math.floor((x - mn(d)) * 255.0 / (mx(d) - mn(d))).toLong)).toInt
      else 0
    (ref.toMap, mn, mx, codeOf)
  }

  test("x21: SQ8 codes == plain-Scala reference; mid-rise residual bounded by half a step") {
    val (byVec, mn, mx, codeOf) = sq8Ref
    val dims = mn.length
    val got = SimilarityOps.sq8Encode(spark, Sf).collect()
    assert(got.length == byVec.size * dims)
    got.foreach { r =>
      val (id, d) = (r.getAs[Long]("vec_id"), r.getAs[Int]("d"))
      val x = byVec(id)(d)
      val code = r.getAs[Int]("code")
      assert(code == codeOf(x, d), s"vec $id dim $d")
      val dq = r.getAs[Double]("dq")
      assert(dq == mn(d) + ((code.toDouble + 0.5) * (mx(d) - mn(d))) / 255.0,
        s"vec $id dim $d reconstruction")
      // the SQ8 point: dequantization never strays more than half a
      // quantization step from the original (clamp included)
      val step = (mx(d) - mn(d)) / 255.0
      assert(math.abs(x - dq) <= step * 0.5 + 1e-12,
        s"vec $id dim $d residual ${math.abs(x - dq)} > half-step $step")
    }
    // codes actually use the range (non-degenerate fixture)
    assert(got.map(_.getAs[Int]("code")).distinct.length > 100,
      "fixture regression: SQ8 code space collapsed")
  }

  test("x22: SDC top-k == plain-Scala integer recount over the reference codes") {
    val (byVec, mn, _, codeOf) = sq8Ref
    val dims = mn.length
    val codes = byVec.map { case (id, v) =>
      id -> Array.tabulate(dims)(d => codeOf(v(d), d).toLong) }
    def sdc(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(d => (a(d) - b(d)) * (a(d) - b(d))).sum
    val expected = (0L until SimilarityOps.NumQueries).flatMap { q =>
      codes.keys.filter(_ != q).toSeq
        .map(n => (n, sdc(codes(q), codes(n))))
        .sortBy { case (n, d2) => (d2, n) }
        .take(SimilarityOps.K).zipWithIndex
        .map { case ((n, d2), i) => (q, i + 1, n, d2) }
    }.toSet
    val rows = SimilarityOps.sq8Sdc(spark, Sf).collect()
    val got = rows
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("code_d2"))).toSet
    assert(got === expected)
    // structural: every query emits exactly ranks 1..K, distances
    // non-negative and non-decreasing in rank (implementation output,
    // not the reference)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ==
        (1 to SimilarityOps.K), s"query $q ranks")
      val d2s = byRank.map(_.getAs[Long]("code_d2")).toSeq
      assert(d2s.head >= 0L && d2s == d2s.sorted, s"query $q distances")
    }
  }

  test("x23: packed-codes serve == x22's exploded form, bit-exact") {
    // the packed BinaryType fold must reproduce the exploded grouped
    // form's exact integer distances and ranking — the equality that
    // lets the at-rest serve replace the relational one query-by-query
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("code_d2"))
    val exploded = SimilarityOps.sq8Sdc(spark, Sf).collect().map(key).toSeq
    spark.sharedState.cacheManager.clearCache()
    val packed = SimilarityOps.sq8PackedServe(spark, Sf).collect().map(key).toSeq
    assert(packed == exploded)
  }

  test("x24: cell-restricted SDC == plain-Scala recount (assign, restrict, rank)") {
    val (byVec, mn, _, codeOf) = sq8Ref
    val dims = mn.length
    val codes = byVec.map { case (id, v) =>
      id -> Array.tabulate(dims)(d => codeOf(v(d), d).toLong) }
    // coarse assignment: argmax cosine over the seed-slice centroids,
    // left-to-right double fold (VectorFunctions' contract), ties to
    // the smaller cell id
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val cents = (SimilarityOps.NumQueries.toLong until
        (SimilarityOps.NumQueries + SimilarityOps.NumCentroids).toLong)
      .map(id => id -> byVec(id)).toMap
    val nrm = byVec.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val cellOf = byVec.keys.map { id =>
      id -> cents.keys.toSeq
        .map(c => (c, dot(byVec(id), cents(c)) / (nrm(id) * nrm(c))))
        .minBy { case (c, cos) => (-cos, c) }._1
    }.toMap
    def sdc(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(d => (a(d) - b(d)) * (a(d) - b(d))).sum
    val expected = (0L until SimilarityOps.NumQueries).flatMap { q =>
      codes.keys.filter(n => n != q && cellOf(n) == cellOf(q)).toSeq
        .map(n => (n, sdc(codes(q), codes(n))))
        .sortBy { case (n, d2) => (d2, n) }
        .take(SimilarityOps.K).zipWithIndex
        .map { case ((n, d2), i) => (q, i + 1, n, cellOf(q), d2) }
    }.toSet
    val got = SimilarityOps.sq8CellServe(spark, Sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("code_d2"))).toSet
    assert(got === expected)
    // the restriction actually bites on the fixture: fewer candidate
    // pairs than the brute Q×(N−1) space
    assert(expected.nonEmpty)
  }

  test("x25: quantized-shortlist + exact re-rank == plain-Scala two-stage recount") {
    val (byVec, mn, _, codeOf) = sq8Ref
    val dims = mn.length
    val codes = byVec.map { case (id, v) =>
      id -> Array.tabulate(dims)(d => codeOf(v(d), d).toLong) }
    def sdc(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(d => (a(d) - b(d)) * (a(d) - b(d))).sum
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val nrm = byVec.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val expected = (0L until SimilarityOps.NumQueries).flatMap { q =>
      val shortlist = codes.keys.filter(_ != q).toSeq
        .map(n => (n, sdc(codes(q), codes(n))))
        .sortBy { case (n, d2) => (d2, n) }
        .take(SimilarityOps.RerankR)
      shortlist
        .map { case (n, d2) =>
          (n, d2, dot(byVec(q), byVec(n)) / (nrm(q) * nrm(n))) }
        .sortBy { case (n, _, cos) => (-cos, n) }
        .take(SimilarityOps.K).zipWithIndex
        .map { case ((n, d2, cos), i) => (q, i + 1, n, cos, d2) }
    }.toSet
    val got = SimilarityOps.sq8Rerank(spark, Sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"),
        r.getAs[Long]("code_d2"))).toSet
    assert(got === expected)
    // the refine point: the exact stage REORDERS the quantized stage's
    // shortlist on the fixture (otherwise the test pins nothing beyond
    // x23) — at least one query's top-K by cosine differs in order
    // from its top-K by code distance
    val reordered = (0L until SimilarityOps.NumQueries).exists { q =>
      val byD2 = codes.keys.filter(_ != q).toSeq
        .map(n => (n, sdc(codes(q), codes(n))))
        .sortBy { case (n, d2) => (d2, n) }
        .take(SimilarityOps.K).map(_._1)
      val byCos = expected.toSeq.filter(_._1 == q).sortBy(_._2).map(_._3)
      byD2 != byCos
    }
    assert(reordered, "fixture regression: refine never changes the ranking")
  }

  test("x30: IVF-restricted shortlist + exact re-rank == plain-Scala full-stack recount") {
    val (byVec, mn, _, codeOf) = sq8Ref
    val dims = mn.length
    val codes = byVec.map { case (id, v) =>
      id -> Array.tabulate(dims)(d => codeOf(v(d), d).toLong) }
    def sdc(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(d => (a(d) - b(d)) * (a(d) - b(d))).sum
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val cents = (SimilarityOps.NumQueries.toLong until
        (SimilarityOps.NumQueries + SimilarityOps.NumCentroids).toLong)
      .map(id => id -> byVec(id)).toMap
    val nrm = byVec.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val cellOf = byVec.keys.map { id =>
      id -> cents.keys.toSeq
        .map(c => (c, dot(byVec(id), cents(c)) / (nrm(id) * nrm(c))))
        .minBy { case (c, cos) => (-cos, c) }._1
    }.toMap
    val expected = (0L until SimilarityOps.NumQueries).flatMap { q =>
      val shortlist = codes.keys
        .filter(n => n != q && cellOf(n) == cellOf(q)).toSeq
        .map(n => (n, sdc(codes(q), codes(n))))
        .sortBy { case (n, d2) => (d2, n) }
        .take(SimilarityOps.RerankR)
      shortlist
        .map { case (n, d2) =>
          (n, d2, dot(byVec(q), byVec(n)) / (nrm(q) * nrm(n))) }
        .sortBy { case (n, _, cos) => (-cos, n) }
        .take(SimilarityOps.K).zipWithIndex
        .map { case ((n, d2, cos), i) =>
          (q, i + 1, n, cellOf(q), cos, d2) }
    }.toSet
    spark.sharedState.cacheManager.clearCache()
    val got = SimilarityOps.sq8IvfRerank(spark, Sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("cell"),
        r.getAs[Double]("cos"), r.getAs[Long]("code_d2"))).toSet
    assert(got === expected)
    // the cell restriction bites relative to x25's corpus-wide
    // shortlist: some query's in-cell candidate pool is smaller than
    // RerankR, so the tier is genuinely nProbe-bounded on the fixture
    val pooled = (0L until SimilarityOps.NumQueries).map(q =>
      codes.keys.count(n => n != q && cellOf(n) == cellOf(q)))
    assert(pooled.exists(_ < codes.size - 1),
      "fixture regression: every query's cell spans the whole corpus")
    spark.sharedState.cacheManager.clearCache()
  }

  test("x26: sign-word Hamming top-k == plain-Scala recount; words reconstruct the signs") {
    val (byVec, _, _, _) = sq8Ref
    val dims = byVec.head._2.length
    assert(dims == 64, "fixture contract: one 64-bit signature in two words")
    def words(v: Array[Double]): (Long, Long) = {
      def word(lo: Int): Long = (lo until lo + 32)
        .map(i => if (v(i) > 0) 1L << (i - lo) else 0L).sum
      (word(0), word(32))
    }
    val sigs = byVec.map { case (id, v) => id -> words(v) }
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val expected = (0L until SimilarityOps.NumQueries).flatMap { q =>
      sigs.keys.filter(_ != q).toSeq
        .map(n => (n, ham(sigs(q), sigs(n))))
        .sortBy { case (n, h) => (h, n) }
        .take(SimilarityOps.K).zipWithIndex
        .map { case ((n, h), i) => (q, i + 1, n, h) }
    }.toSet
    val got = SimilarityOps.signHamming(spark, Sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("hamming"))).toSet
    assert(got === expected)
    // every word stays within its 32-bit budget (the no-overflow
    // argument the BIGINT oracle terms rely on)
    sigs.values.foreach { case (w0, w1) =>
      assert(w0 >= 0L && w0 < (1L << 32) && w1 >= 0L && w1 < (1L << 32))
    }
  }

  test("x27: IVF-PQ shortlist + exact re-rank == plain-Scala full-stack recount") {
    val sim = SimilarityOps
    val byVec = sq8Ref._1
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def sub(v: Array[Double], m: Int): Array[Double] =
      v.slice(m * sim.PqSubDim, (m + 1) * sim.PqSubDim)
    // the shared PQ distance in its exact written order: (|x|²−2x·c)+|c|²
    def pd(x: Array[Double], c: Array[Double]): Double =
      dot(x, x) - 2.0 * dot(x, c) + dot(c, c)
    val centIds = (sim.NumQueries.toLong until
      (sim.NumQueries + sim.NumCentroids).toLong).toSeq
    val nrm = byVec.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    // coarse: argmax cosine, ties to the smaller cell id
    def cellsRanked(id: Long): Seq[Long] = centIds
      .map(cid => (cid, dot(byVec(id), byVec(cid)) / (nrm(id) * nrm(cid))))
      .sortBy { case (cid, cos) => (-cos, cid) }.map(_._1)
    val cellOf = byVec.keys.map(id => id -> cellsRanked(id).head).toMap
    // PQ encode against the seed sub-codebooks: per-subspace argmin
    def codeOf(id: Long): IndexedSeq[Long] = (0 until sim.PqM).map { m =>
      centIds.map(cid => (cid, pd(sub(byVec(id), m), sub(byVec(cid), m))))
        .minBy { case (cid, d2) => (d2, cid) }._1
    }
    val codes = byVec.keys.map(id => id -> codeOf(id)).toMap
    // ADC in m order (the adcSum fold): Σ_m pd(qsub_m, centsub(code_m))
    def adc(q: Long, n: Long): Double =
      (0 until sim.PqM).map(m =>
        pd(sub(byVec(q), m), sub(byVec(codes(n)(m)), m))).reduce(_ + _)
    val expected = (0L until sim.NumQueries).flatMap { q =>
      val probed = cellsRanked(q).take(sim.ProbeCells).toSet
      val shortlist = byVec.keys
        .filter(n => n != q && probed(cellOf(n))).toSeq
        .map(n => (n, adc(q, n)))
        .sortBy { case (n, a) => (a, n) }
        .take(sim.RerankR)
      shortlist
        .map { case (n, a) =>
          (n, a, dot(byVec(q), byVec(n)) / (nrm(q) * nrm(n))) }
        .sortBy { case (n, _, cos) => (-cos, n) }
        .take(sim.K).zipWithIndex
        .map { case ((n, a, cos), i) => (q, i + 1, n, cellOf(n), cos, a) }
    }.toSet
    val got = sim.ivfPqRerank(spark, Sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("cell"),
        r.getAs[Double]("cos"), r.getAs[Double]("adc"))).toSet
    assert(got === expected)
    spark.sharedState.cacheManager.clearCache() // x27 persists the corpus
  }

  test("x28: spread-balanced encode == plain-Scala permuted recount; corpus qerr improves") {
    val sim = SimilarityOps
    val (byVec, mn, mx, _) = sq8Ref
    val dims = mn.length
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def pd(x: Array[Double], c: Array[Double]): Double =
      dot(x, x) - 2.0 * dot(x, c) + dot(c, c)
    val centIds = (sim.NumQueries.toLong until
      (sim.NumQueries + sim.NumCentroids).toLong).toSeq
    def qerrAll(subOf: (Array[Double], Int) => Array[Double]): Map[Long, Double] =
      byVec.map { case (id, v) =>
        id -> (0 until sim.PqM).map { m =>
          centIds.map(cid => (cid, pd(subOf(v, m), subOf(byVec(cid), m))))
            .minBy { case (cid, d2) => (d2, cid) }._2
        }.reduce(_ + _)
      }
    def subN(v: Array[Double], m: Int): Array[Double] =
      v.slice(m * sim.PqSubDim, (m + 1) * sim.PqSubDim)
    // spread-ranked round-robin deal, exactly the registered mapping
    val order = (0 until dims).sortBy(d => (-(mx(d) - mn(d)), d))
    val dimsFor: Int => Array[Int] = {
      val assign = order.zipWithIndex
        .map { case (d, r) => d -> (r % sim.PqM, r / sim.PqM) }.toMap
      m => (0 until dims).filter(d => assign(d)._1 == m)
        .sortBy(d => assign(d)._2).toArray
    }
    def subB(v: Array[Double], m: Int): Array[Double] = dimsFor(m).map(v(_))
    val qn = qerrAll(subN)
    val qb = qerrAll(subB)
    val got = sim.pqBalanced(spark, Sf).collect()
    assert(got.length == byVec.size)
    got.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Double]("qerr_nat") == qn(id), s"vec $id natural")
      assert(r.getAs[Double]("qerr_bal") == qb(id), s"vec $id balanced")
      assert((r.getAs[Int]("improved") == 1) == (qb(id) < qn(id)), s"vec $id flag")
    }
    // the OPQ claim the audit exists to measure: balancing the spread
    // lowers TOTAL corpus quantization error on the fixture
    assert(qb.values.sum < qn.values.sum,
      s"balanced grouping did not improve: ${qb.values.sum} vs ${qn.values.sum}")
    spark.sharedState.cacheManager.clearCache() // x28 persists the corpus
  }

  test("x29: recall counts == overlap recount of the tiers' own outputs; refine dominates its quantized stage") {
    val sim = SimilarityOps
    def keyset(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val m = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      spark.sharedState.cacheManager.clearCache()
      m
    }
    val brute = keyset(sim.knnBrute(spark, Sf))
    val sdc = keyset(sim.sq8Sdc(spark, Sf))
    val ham = keyset(sim.signHamming(spark, Sf))
    val sq8rr = keyset(sim.sq8Rerank(spark, Sf))
    val ivfrr = keyset(sim.ivfPqRerank(spark, Sf))
    val ivfsq = keyset(sim.sq8IvfRerank(spark, Sf))
    val rows = sim.quantRecall(spark, Sf).collect()
    spark.sharedState.cacheManager.clearCache()
    assert(rows.length == sim.NumQueries)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      def ck(mark: String, tier: Map[Long, Set[Long]]): Int = {
        val n = r.getAs[Int](s"n_$mark")
        assert(n == (brute(q) & tier.getOrElse(q, Set.empty)).size,
          s"query $q n_$mark")
        assert(r.getAs[Double](s"recall_$mark") == n.toDouble / sim.K,
          s"query $q recall_$mark")
        n
      }
      ck("sdc", sdc); ck("ham", ham)
      val nrr = ck("sq8rr", sq8rr); ck("ivfrr", ivfrr)
      // x30's recall is NOT ordered against x25's in general (a true
      // neighbor can make the less-competitive in-cell shortlist while
      // missing the corpus-wide one) — only the count identity is pinned
      ck("ivfsq", ivfsq)
      // structural domination: a brute neighbor inside the SDC
      // shortlist is globally cosine-best, so the exact re-rank always
      // keeps it — x25's recall can never fall below x22's
      assert(nrr >= (brute(q) & sdc.getOrElse(q, Set.empty)).size,
        s"query $q: refine lost a hit its quantized stage had")
    }
  }

  test("seeds encode to themselves with exactly zero quantization error") {
    val enc = SimilarityOps.pqEncode(spark, Sf)
      .filter(col("vec_id") >= SimilarityOps.NumQueries &&
        col("vec_id") < SimilarityOps.NumQueries + SimilarityOps.NumCentroids)
      .collect()
    assert(enc.length === SimilarityOps.NumCentroids)
    enc.foreach { r =>
      val id = r.getLong(0)
      // each seed's nearest sub-centroid in every subspace is itself
      assert((1 to 4).map(r.getLong) === Seq.fill(4)(id),
        s"seed $id not self-coded: $r")
      // d2(x,x) = xx - 2*xx + xx is exactly 0.0 in double arithmetic
      assert(r.getDouble(5) === 0.0, s"seed $id has nonzero qerr")
    }
  }

  test("ADC identity: against zero-error vectors, ADC == true squared L2") {
    val zeroErr = SimilarityOps.pqEncode(spark, Sf)
      .filter(col("qerr") === 0.0).select(col("vec_id"))
    // the full pre-top-k distance frame: every (query, zero-error vec)
    // pair, whether or not it would make a top-k cut
    val adc = SimilarityOps.pqAdcDistances(spark, Sf)
      .join(zeroErr, Seq("vec_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
    // exact squared L2 between query and neighbor from the raw vectors
    val q = emb.select(col("vec_id").as("query_id"), col("v").as("qv"))
    val n = emb.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
    val d2 = dotD(col("qv"), col("qv")) -
      lit(2.0) * dotD(col("qv"), col("nv")) + dotD(col("nv"), col("nv"))
    val rows = adc.join(q, Seq("query_id")).join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("adc"), d2.as("exact"))
      .collect()
    assert(rows.nonEmpty, "no zero-error vectors reached any query's top-k")
    rows.foreach { r =>
      val (a, e) = (r.getDouble(2), r.getDouble(3))
      // ADC sums 4 subspace folds; the full-vector fold groups the same
      // doubles differently — equal to fp association error only
      assert(math.abs(a - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"ADC ${a} != exact ${e} for $r")
    }
  }

  /** Exact top-[[SimilarityOps.K]] (query, neighbor) truth pairs. */
  private def truthPairs = {
    val c = SimilarityOps.corpus(spark, Sf)
    SimilarityOps.knnBruteCore(c)
      .select(col("query_id"), col("neighbor_id"))
  }

  private def recallOf(topk: org.apache.spark.sql.DataFrame): Double = {
    val hits = truthPairs.join(topk.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    hits.toDouble / (SimilarityOps.NumQueries * SimilarityOps.K)
  }

  test("x12: one Lloyd's step never worsens total quantization error, and ADC recall holds up") {
    val c = SimilarityOps.corpus(spark, Sf)
    def totalQerr(enc: org.apache.spark.sql.DataFrame): Double =
      enc.agg(sum(col("qerr"))).collect().head.getDouble(0)
    val seedQerr = totalQerr(SimilarityOps.pqEncode(spark, Sf))
    val trainedQerr = totalQerr(SimilarityOps.pqEncodeTrained(spark, Sf))
    // Lloyd's guarantee: re-centering each (subspace, code) on its
    // members' mean cannot increase their summed distortion, and the
    // final re-assign only ever moves a subvector to a closer code —
    // so the trained total is <= the seed total up to float rounding
    // of the recomputed centroids
    assert(trainedQerr <= seedQerr * (1 + 1e-9),
      s"training worsened qerr: seed=$seedQerr trained=$trainedQerr")
    assert(trainedQerr < seedQerr * 0.9,
      s"training should visibly improve the arbitrary seed codebooks: " +
        s"seed=$seedQerr trained=$trainedQerr")
    val seedRecall = recallOf(SimilarityOps.adcTopKWith(c, SimilarityOps.pqSeedCents(c)))
    val trainedRecall = recallOf(SimilarityOps.adcTopKWith(c, SimilarityOps.pqTrainedCents(c)))
    info(f"qerr: seed=$seedQerr%.2f trained=$trainedQerr%.2f; " +
      f"ADC recall@${SimilarityOps.K}: seed=$seedRecall%.2f trained=$trainedRecall%.2f")
    assert(trainedRecall >= seedRecall - 0.11,
      s"trained codebooks should not collapse recall: seed=$seedRecall trained=$trainedRecall")
  }

  test("x15: the append manifest covers exactly the batch, and the dup-check respects cells") {
    val rows = SimilarityOps.ivfPqAppend(spark, Sf).collect()
    val expectedIds = SimilarityOps.corpus(spark, Sf)
      .filter(col("vec_id") % graft.operators.DedupOps.IncomingMod === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet === expectedIds,
      "every new vector must appear exactly once in the manifest")
    assert(rows.length === expectedIds.size)
    rows.foreach { r =>
      val occ = r.getAs[Long]("n_cell_existing")
      val nn = Option(r.getAs[java.lang.Long]("nn_id"))
      // an empty target cell has no existing neighbor to check against;
      // a non-empty one must produce a non-negative ADC distance
      if (occ == 0L) assert(nn.isEmpty, s"nn from an empty cell: $r")
      else {
        assert(nn.isDefined, s"occupied cell but no dup-check neighbor: $r")
        assert(r.getAs[Double]("nn_adc") >= 0.0, s"negative ADC: $r")
        assert(!expectedIds(nn.get), s"dup-check matched another NEW vector: $r")
      }
      assert(r.getAs[Double]("qerr") >= 0.0)
    }
  }

  test("x16: splits hit exactly the oversized cells, children partition the parent, balance improves") {
    val c = SimilarityOps.corpus(spark, Sf)
    val coarse = SimilarityOps.coarseCentroids(c)
    val byCell = SimilarityOps.coarseProbe(c, coarse, 1)
      .select(col("vec_id"), col("cell_id")).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    val total = byCell.values.map(_.size).sum
    val threshold = total.toDouble / SimilarityOps.NumCentroids
    val oversized = byCell.filter(_._2.size > threshold).keySet
    assert(oversized.nonEmpty, "fixture regression: no cell above the balanced share")

    val split = SimilarityOps.cellSplit(spark, Sf).collect()
      .groupBy(_.getAs[Long]("cell"))
    assert(split.keySet === oversized,
      s"split cells ${split.keySet} != oversized $oversized")
    split.foreach { case (cell, rows) =>
      val parent = byCell(cell)
      // serve invariance is this partition property: a probe reading
      // BOTH children sees exactly the parent's candidate set, and ADC
      // scores don't depend on the cell label — so split-then-probe
      // returns the same neighbors as probing the unsplit cell
      val children = rows.groupBy(_.getAs[Int]("c2"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
      assert(children.values.toSeq.map(_.size).sum === parent.size)
      assert(children.values.foldLeft(Set.empty[Long])(_ ++ _) === parent,
        s"cell $cell: children do not partition the parent")
      assert(children.keySet === Set(0, 1),
        s"cell $cell: a child is empty — the split didn't split")
      assert(children.values.map(_.size).max < parent.size)
      info(s"cell $cell: ${parent.size} -> ${children.values.map(_.size).toSeq.sorted.mkString("+")}")
    }
  }

  test("x17: compaction rewrites ONLY the affected cell partition; untouched cells' files survive byte-identical") {
    import java.io.File
    val root = "target/graft-index/spec-x17"
    val c = SimilarityOps.corpus(spark, Sf)
    SimilarityOps.buildIndex(spark, root, c,
      SimilarityOps.coarseCentroids(c), SimilarityOps.pqSeedCents(c))
    def snapshot(): Map[String, Set[(String, Long, Long)]] =
      new File(s"$root/codes").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSet).toMap
    val before = snapshot()
    val pre = spark.read.parquet(s"$root/codes")
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // delete exactly one non-seed vector → exactly one affected cell
    val victim = pre.keySet.filter(_ >= SimilarityOps.NumQueries +
      SimilarityOps.NumCentroids).min
    SimilarityOps.compactIndex(spark, root, col("vec_id") === victim)
    val after = snapshot()
    val affected = s"cell_id=${pre(victim)}"
    before.keySet.foreach { cell =>
      if (cell == affected)
        assert(after(cell) !== before(cell), s"$cell was not rewritten")
      else assert(after(cell) === before(cell),
        s"$cell is unaffected but its files changed — compaction rewrote too much")
    }
    val post = spark.read.parquet(s"$root/codes")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(post === pre.keySet - victim,
      "compaction must drop exactly the tombstoned vector")
    // stats stayed consistent through the incremental (no-rescan) merge
    val occ = spark.read.parquet(s"$root/occupancy")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recount = post.groupBy(v => pre(v).toLong).view.mapValues(_.size.toLong)
    assert(occ === recount.toMap, "occupancy diverged from a recount")
    // restart-safe: a second compaction resolves an empty delete set
    // and must be a no-op, not a crash on the empty staging dir
    SimilarityOps.compactIndex(spark, root, col("vec_id") === victim)
    assert(spark.read.parquet(s"$root/codes")
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet === post,
      "re-running compaction changed the index")
  }

  test("x19: applying the append only ADDS files in target cells; standing files untouched") {
    import java.io.File
    val root = "target/graft-index/spec-x19"
    val c = SimilarityOps.corpus(spark, Sf)
    val isNew = col("vec_id") % graft.operators.DedupOps.IncomingMod === 0
    SimilarityOps.buildIndex(spark, root, c.filter(!isNew),
      SimilarityOps.coarseCentroids(c), SimilarityOps.pqSeedCents(c))
    def snapshot(): Map[String, Set[(String, Long)]] =
      new File(s"$root/codes").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length)).toSet).toMap
    val before = snapshot()
    val preIds = spark.read.parquet(s"$root/codes")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    SimilarityOps.applyAppend(spark, root, c.filter(isNew))
    val after = snapshot()
    val targets = SimilarityOps.coarseProbe(c.filter(isNew),
        SimilarityOps.coarseCentroids(c), 1)
      .select(col("cell_id")).collect()
      .map(r => s"cell_id=${r.getLong(0)}").toSet
    after.keySet.foreach { cell =>
      val b = before.getOrElse(cell, Set.empty[(String, Long)])
      if (targets(cell))
        assert(b.subsetOf(after(cell)) && after(cell) != b,
          s"$cell: standing files disturbed, or nothing appended")
      else assert(after(cell) === b,
        s"$cell gained/lost files but no batch vector routes there")
    }
    val postIds = spark.read.parquet(s"$root/codes")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val batchIds = c.filter(isNew)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(postIds === preIds ++ batchIds,
      "the applied index must hold exactly standing ∪ batch")
    // the incremental stats merge (old + batch delta, no rescan) must
    // equal a recount of the applied codes
    val occ = spark.read.parquet(s"$root/occupancy")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recount = spark.read.parquet(s"$root/codes")
      .groupBy(col("cell_id").cast("long")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(occ === recount, "occupancy diverged from a recount after apply")
  }

  test("x18: training the coarse quantizer never worsens mean assignment cosine, and rebalances cells") {
    val c = SimilarityOps.corpus(spark, Sf)
    def profile(coarse: org.apache.spark.sql.DataFrame): (Double, Seq[Long]) = {
      val aw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("cc").desc, col("cell_id"))
      val a = c.join(org.apache.spark.sql.functions.broadcast(coarse))
        .withColumn("cc", dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(aw))
        .filter(col("rn") === 1)
        .select(col("cell_id"), col("cc")).collect()
      (a.map(_.getDouble(1)).sum / a.length,
        a.groupBy(_.getLong(0)).values.map(_.length.toLong).toSeq.sorted)
    }
    val (seedCos, seedOcc) = profile(SimilarityOps.coarseCentroids(c))
    val (trainCos, trainOcc) = profile(SimilarityOps.refinedCoarse(c))
    info(f"mean assignment cosine: seed=$seedCos%.4f trained=$trainCos%.4f")
    info(s"occupancy histogram: seed=$seedOcc trained=$trainOcc")
    // the Lloyd's update pulls each centroid to its members' mean, so
    // the mean member-to-centroid cosine must not degrade
    assert(trainCos >= seedCos - 1e-9,
      s"training worsened coarse assignment: $seedCos -> $trainCos")
    // and the occupancy spread (max-min imbalance) must not widen:
    // centroids move toward dense regions, splitting their load
    assert(trainOcc.last - trainOcc.head <= seedOcc.last - seedOcc.head,
      s"training widened the cell imbalance: $seedOcc -> $trainOcc")
  }

  test("x13: probed-cell candidate recall is monotone in P, and end recall never exceeds it") {
    val c = SimilarityOps.corpus(spark, Sf)
    val coarse = SimilarityOps.coarseCentroids(c)
    val cells = SimilarityOps.coarseProbe(c, coarse, 1)
      .select(col("vec_id").as("neighbor_id"), col("cell_id"))
    val truth = truthPairs
    val results = Seq(1, 2, 4).map { p =>
      // candidate pairs: true neighbors whose cell is among the
      // query's top-P cells — the probe either covers a truth pair or
      // top-k can never return it
      val probed = SimilarityOps.coarseProbe(
          c.filter(col("vec_id") < SimilarityOps.NumQueries), coarse, p)
        .select(col("vec_id").as("query_id"), col("cell_id"))
      val candHits = truth.join(cells, Seq("neighbor_id"))
        .join(probed, Seq("query_id", "cell_id")).count()
      val candRecall = candHits.toDouble /
        (SimilarityOps.NumQueries * SimilarityOps.K)
      val endRecall = recallOf(SimilarityOps.ivfPqProbeCore(c, p))
      info(f"P=$p: candidate recall=$candRecall%.2f, top-k ADC recall=$endRecall%.2f")
      assert(endRecall <= candRecall + 1e-9,
        s"P=$p: retrieved a neighbor outside the probed cells")
      (candRecall, endRecall)
    }
    // probe sets nest by rank, so candidate coverage can only grow
    results.sliding(2).foreach { case Seq((c1, _), (c2, _)) =>
      assert(c2 >= c1 - 1e-9, s"candidate recall not monotone: $results")
    }
  }

  test("applyAppend is idempotent under retry and heals a torn stats write") {
    val root = "target/graft-index/spec-append-heal"
    val c = SimilarityOps.corpus(spark, Sf)
    val isNew = col("vec_id") % graft.operators.DedupOps.IncomingMod === 0
    SimilarityOps.buildIndex(spark, root, c.filter(!isNew),
      SimilarityOps.coarseCentroids(c), SimilarityOps.pqSeedCents(c))
    val occSchema = spark.read.parquet(s"$root/occupancy").schema
    val occ0 = spark.read.parquet(s"$root/occupancy").collect().toSeq
    def codes() = spark.read.parquet(s"$root/codes")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq.sorted
    def occ() = spark.read.parquet(s"$root/occupancy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    SimilarityOps.applyAppend(spark, root, c.filter(isNew))
    val codes1 = codes(); val occ1 = occ()
    assert(codes1.distinct === codes1, "append landed a vector twice")
    // operator retry: the whole job reruns — nothing may change
    SimilarityOps.applyAppend(spark, root, c.filter(isNew))
    assert(codes() === codes1, "rerun duplicated codes")
    assert(occ() === occ1, "rerun moved the stats")
    // torn write: the codes landed but the stats write was lost —
    // restore the PRE-append occupancy and rerun; the touched-cell
    // recount must repair the stats without touching the codes
    spark.createDataFrame(spark.sparkContext.parallelize(occ0), occSchema)
      .write.mode("overwrite").parquet(s"$root/occupancy")
    SimilarityOps.applyAppend(spark, root, c.filter(isNew))
    assert(codes() === codes1, "heal rerun duplicated codes")
    assert(occ() === occ1, "torn stats write was not healed")
  }

  test("x17: a cell whose members are ALL deleted drops its directory and stats row; the planted crash window converges") {
    val root = "target/graft-index/spec-x17-emptycell"
    val rootB = "target/graft-index/spec-x17-emptycell-clean"
    Seq(root, rootB).foreach { r =>
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(r), true)
    }
    val c = SimilarityOps.corpus(spark, Sf)
    SimilarityOps.buildIndex(spark, root, c,
      SimilarityOps.coarseCentroids(c), SimilarityOps.pqSeedCents(c))
    // the cell-emptying delete pattern the harness cohorts never
    // produce: EVERY member of one chosen cell, plus one vector of
    // another (so the compaction also has a normal partial cell)
    val byCell = spark.read.parquet(s"$root/codes")
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val victimCell = byCell.minBy { case (_, vs) => (vs.size, vs.min) }._1
    val partialCell = byCell.keys.filter(_ != victimCell).min
    val delIds = byCell(victimCell) +
      byCell(partialCell).filterNot(byCell(victimCell)).min
    val pred = col("vec_id").isin(delIds.toSeq: _*)
    SimilarityOps.compactIndex(spark, root, pred)
    assert(!new java.io.File(s"$root/codes/cell_id=$victimCell").exists(),
      "the all-members-deleted cell kept its stale directory")
    val occ = spark.read.parquet(s"$root/occupancy")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!occ.contains(victimCell.toLong),
      "the emptied cell kept its stats row")
    val recount = spark.read.parquet(s"$root/codes")
      .groupBy(col("cell_id")).count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(occ == recount, "occupancy diverged from a recount")
    assert(!new java.io.File(s"$root/staging").exists(),
      "a completed compaction must clear its staging table")
    // the planted crash: codes overwritten, drop + stats + staging
    // cleanup lost — the rerun must converge to the same end state
    SimilarityOps.buildIndex(spark, rootB, c,
      SimilarityOps.coarseCentroids(c), SimilarityOps.pqSeedCents(c))
    SimilarityOps.compactIndex(spark, rootB, pred,
      crashAfterOverwrite = true)
    assert(new java.io.File(s"$rootB/codes/cell_id=$victimCell").exists(),
      "fixture regression: the crash state must hold the stale dir")
    assert(new java.io.File(s"$rootB/staging").exists(),
      "fixture regression: the crash state must hold the staging table")
    SimilarityOps.compactIndex(spark, rootB, pred)
    def state(r: String) = spark.read.parquet(s"$r/codes")
      .select(col("vec_id"), col("cell_id")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(state(rootB) == state(root),
      "crash-rerun codes diverged from the clean compaction")
    assert(spark.read.parquet(s"$rootB/occupancy")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == occ,
      "crash-rerun occupancy diverged from the clean compaction")
    assert(!new java.io.File(s"$rootB/codes/cell_id=$victimCell").exists(),
      "the rerun must drop the stale emptied-cell directory")
  }

  test("compactIndex rerun after a torn stats write heals occupancy by recount") {
    val root = "target/graft-index/spec-compact-heal"
    val c = SimilarityOps.corpus(spark, Sf)
    SimilarityOps.buildIndex(spark, root, c,
      SimilarityOps.coarseCentroids(c), SimilarityOps.pqSeedCents(c))
    val occSchema = spark.read.parquet(s"$root/occupancy").schema
    val occPre = spark.read.parquet(s"$root/occupancy").collect().toSeq
    def codes() = spark.read.parquet(s"$root/codes")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq.sorted
    def occ() = spark.read.parquet(s"$root/occupancy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    SimilarityOps.compactIndex(spark, root)
    val codesPost = codes(); val occPost = occ()
    assert(codesPost.size < occPre.map(_.getLong(1)).sum,
      "fixture regression: compaction deleted nothing")
    // torn write: the codes were rewritten but the stats decrement was
    // lost — restore the PRE-compact occupancy and rerun. The rerun
    // resolves an empty tombstone set (ids already gone) and cannot
    // know the affected cells, so it must heal by full recount.
    spark.createDataFrame(spark.sparkContext.parallelize(occPre), occSchema)
      .write.mode("overwrite").parquet(s"$root/occupancy")
    SimilarityOps.compactIndex(spark, root)
    assert(codes() === codesPost, "heal rerun disturbed the codes")
    assert(occ() === occPost, "torn stats write was not healed")
  }

  test("x32: sign-index append lands exactly-once with standing files untouched; forget == rebuild over survivors; both rerun as no-ops") {
    val so = SimilarityOps
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
    val isNew = col("vec_id") % graft.operators.DedupOps.IncomingMod === 0
    val isDel = col("vec_id") % so.DeleteMod === so.DeleteRem
    val root = "target/graft-index/spec-x32"
    val rootB = "target/graft-index/spec-x32-rebuild"
    def rm(r: String): Unit = {
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(r), true)
      ()
    }
    def rows(r: String): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$r/signatures")
        .select(col("vec_id"), col("w0"), col("w1"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    def files(r: String): Set[(String, Long, Long)] =
      new java.io.File(s"$r/signatures").listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath.stripPrefix(r), f.length, f.lastModified)).toSet
    rm(root); rm(rootB)
    so.writeSignIndex(spark, root, vecs.filter(!isNew))
    val standing = files(root)
    so.appendSignIndex(spark, root, vecs.filter(isNew))
    assert(standing.subsetOf(files(root)),
      "append rewrote a standing signature file")
    so.writeSignIndex(spark, rootB, vecs)
    assert(rows(root) == rows(rootB), "append != rebuild over the union")
    so.appendSignIndex(spark, root, vecs.filter(isNew))
    assert(rows(root) == rows(rootB), "retried append landed rows twice")
    // forget the delete cohort — id-bucketed sweep
    so.forgetSignIndex(spark, root, vecs.filter(isDel).select(col("vec_id")))
    rm(rootB)
    so.writeSignIndex(spark, rootB, vecs.filter(!isDel))
    assert(rows(root) == rows(rootB), "forget != rebuild over survivors")
    so.forgetSignIndex(spark, root, vecs.filter(isDel).select(col("vec_id")))
    assert(rows(root) == rows(rootB), "retried forget moved the table")
    rm(root); rm(rootB)
  }
}
