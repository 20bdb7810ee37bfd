package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.sources.Tables

/** The banding schemes' DETERMINISTIC guarantees (probabilistic recall
  * is measured by x5; these are the cases where the math promises 100%):
  *
  *   - d2: identical shingle sets → identical MinHash signatures → all
  *     four bands collide → the pair IS a candidate. So every
  *     exact-duplicate pair must appear with Jaccard 1.
  *   - d3b: 4 bands × 15 bits over a 60-bit SimHash; hamming ≤ 3 can
  *     touch at most 3 bands, so one band always matches (pigeonhole)
  *     → EXACT recall at the threshold, verified against brute force.
  */
class DedupGuaranteesSpec extends SparkSpec {

  test("d2's bucket join finds EXACTLY the brute-force band-collision pairs") {
    // ground truth: all-pairs over the collected signatures — any of
    // the 4 band values equal ⇒ the pair must be a d2 candidate, and
    // nothing else may be
    GraftExtensions.register(spark)
    val sigRows = spark.sql(
      s"""SELECT doc_id, minhash_sig(hashed_shingle_set(split(text, ' '), 2)) AS mh
         |FROM parquet.`$Sf/documents.parquet`""".stripMargin)
      .collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val M = graft.functions.TextFunctions.HashMod
    def bands(mh: Array[Long]): Array[Long] =
      Array.tabulate(DedupOps.Bands)(b => mh(2 * b) * M + mh(2 * b + 1))
    val truth = (for {
      i <- sigRows.indices.iterator
      j <- (i + 1) until sigRows.length
      if bands(sigRows(i)._2).zip(bands(sigRows(j)._2)).exists(p => p._1 == p._2)
    } yield {
      val (a, b) = (sigRows(i)._1, sigRows(j)._1)
      if (a < b) (a, b) else (b, a)
    }).toSet
    assert(truth.nonEmpty) // non-vacuous on harness data
    val found = DedupOps.minhashLsh(spark, Sf)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === truth,
      s"candidate sets diverge: missed=${(truth -- found).take(3)} extra=${(found -- truth).take(3)}")
  }

  test("d3b achieves EXACT recall at hamming <= 3 (pigeonhole), vs brute force") {
    // brute-force ground truth on the collected 60-bit signatures
    GraftExtensions.register(spark)
    val sigRows = spark.sql(
      s"""SELECT doc_id, simhash_long(split(text, ' '), 60) AS sig
         |FROM parquet.`$Sf/documents.parquet`""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      i <- sigRows.indices.iterator
      j <- (i + 1) until sigRows.length
      if java.lang.Long.bitCount(sigRows(i)._2 ^ sigRows(j)._2) <= DedupOps.SimhashMaxHamming
    } yield {
      val (a, b) = (sigRows(i), sigRows(j))
      if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
    }).toSet
    assert(truth.nonEmpty) // non-vacuous on harness data
    val found = DedupOps.simhashNearDup(spark, Sf)
      .filter(col("is_near_dup") === 1)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(found),
      s"pigeonhole violated: ${(truth -- found).take(3)} missed")
    // and no false positives below the threshold flag
    assert(found.subsetOf(truth), "a pair flagged near-dup exceeds the hamming bound")
  }

  test("d7 verdict precedence: corpus-dup beats batch-dup beats new") {
    val out = DedupOps.incrementalDedup(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("head_key"), r.getAs[String]("verdict"))).toMap
    // every verdicted doc is from the incoming batch
    assert(out.keys.forall(_ % DedupOps.IncomingMod == 0))
    // recompute ground truth from the raw table with an independent
    // key derivation (plain Scala string ops, not the Column expr)
    val all = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val head = r.getAs[String]("text").split(" ", -1)
          .take(DedupOps.HeadKeyTokens).mkString(" ")
        r.getAs[Long]("doc_id") -> head
      }
    val corpusKeys = all.collect {
      case (id, m) if id % DedupOps.IncomingMod != 0 => m
    }.toSet
    val firstInBatch = all.filter(_._1 % DedupOps.IncomingMod == 0)
      .groupBy(_._2).map { case (m, xs) => m -> xs.map(_._1).min }
    out.foreach { case (id, (_, verdict)) =>
      val m = all.find(_._1 == id).get._2
      val expected =
        if (corpusKeys(m)) "dup_of_corpus"
        else if (firstInBatch(m) != id) "dup_in_batch"
        else "new"
      assert(verdict === expected, s"doc $id")
    }
    // the fixture exercises all three verdicts
    assert(out.values.map(_._2).toSet ===
      Set("new", "dup_in_batch", "dup_of_corpus"))
  }

  test("d8's plan broadcasts the eval shingle set; corpus side never shuffles pre-agg") {
    val plan = DedupOps.decontaminate(spark, Sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$plan")
    // the corpus leg reaches its per-doc aggregate through exactly one
    // doc_id exchange; the only other hash exchange allowed is the
    // tiny eval-side distinct (and the presentation sort's range
    // exchange, which partitions on doc_id but is not hash)
    val docEx = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).length
    assert(docEx === 1, s"corpus side shuffled more than the agg:\n$plan")
  }

  /** Plain-Scala winnowing reference: gram hashes via the shared md5
    * rule, min per sliding window (window q covers gram positions
    * [q, min(q+w−1, G−1)], q = 0..max(G−w, 0)), distinct sorted. */
  private def winnowRef(toks: Seq[String], k: Int, w: Int): Seq[Long] = {
    def md5Long60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    if (toks.length < k) return Seq.empty
    val hs = toks.sliding(k).map(g =>
      md5Long60(g.mkString(" ")) % graft.functions.TextFunctions.HashMod).toArray
    val g = hs.length
    (0 to math.max(g - w, 0)).map { q =>
      hs.slice(q, math.min(q + w, g)).min
    }.distinct.sorted
  }

  test("d17's compiled winnowing == the plain-Scala reference (seeded fuzz)") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(17)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    // lengths straddle every geometry edge: < k tokens, exactly k,
    // fewer grams than the window, and long runs with repeats
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    import spark.implicits._
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.ShingleExpressions.winnowedFingerprintSet(
          split(col("text"), " "), DedupOps.WinnowK, DedupOps.WinnowW).as("fp"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    docs.foreach { case (id, text) =>
      val toks = if (text.isEmpty) Seq("") else text.split(" ").toSeq
      val want = winnowRef(toks, DedupOps.WinnowK, DedupOps.WinnowW)
      assert(got(id) == want, s"doc $id (${toks.length} tokens)")
    }
  }

  test("d17 guarantee: a shared run of k+w-1 tokens always yields a shared fingerprint") {
    // two documents share exactly one 7-token run (k+w−1 = 7) embedded
    // in otherwise-disjoint text: winnowing's local guarantee says the
    // full window of k-grams inside the run selects the same minimum
    // on both sides — so the pair MUST surface in d17's output
    val run = (0 until DedupOps.WinnowK + DedupOps.WinnowW - 1)
      .map(i => s"shared$i")
    val a = ((0 until 20).map(i => s"left$i") ++ run ++
      (0 until 20).map(i => s"lA$i")).mkString(" ")
    val b = ((0 until 20).map(i => s"right$i") ++ run ++
      (0 until 20).map(i => s"rB$i")).mkString(" ")
    import spark.implicits._
    val fps = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.ShingleExpressions.winnowedFingerprintSet(
          split(col("text"), " "), DedupOps.WinnowK, DedupOps.WinnowW).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val shared = fps(1L) intersect fps(2L)
    assert(shared.nonEmpty, "guaranteed shared fingerprint missing")
    // and a run ONE token shorter carries no guarantee from these
    // disjoint surroundings (no full gram window fits inside it)
    val short = run.dropRight(1)
    val a2 = ((0 until 20).map(i => s"left$i") ++ short ++
      (0 until 20).map(i => s"lA$i")).mkString(" ")
    val b2 = ((0 until 20).map(i => s"right$i") ++ short ++
      (0 until 20).map(i => s"rB$i")).mkString(" ")
    val ref1 = winnowRef(a2.split(" ").toSeq, DedupOps.WinnowK, DedupOps.WinnowW).toSet
    val ref2 = winnowRef(b2.split(" ").toSeq, DedupOps.WinnowK, DedupOps.WinnowW).toSet
    // not asserted empty (a lucky minimum can still collide) — just
    // strictly weaker than the guaranteed case on this fixture
    assert(ref1.intersect(ref2).size <= shared.size)
  }

  test("d17 on the harness corpus: density reduced, exact-dup pairs at full overlap") {
    // winnowing keeps a strict subset of gram hashes per doc...
    val both = Tables.documents(spark, Sf).limit(50)
      .select(col("doc_id"),
        size(graft.functions.ShingleExpressions.winnowedFingerprintSet(
          split(col("text"), " "), DedupOps.WinnowK, DedupOps.WinnowW)).as("nw"),
        size(graft.functions.ShingleExpressions.hashedShingleSet(
          split(col("text"), " "), DedupOps.WinnowK)).as("ng"))
      .collect()
    both.foreach(r => assert(r.getInt(1) <= r.getInt(2) &&
      (r.getInt(2) == 0 || r.getInt(1) > 0), s"doc ${r.getLong(0)}"))
    // ...and byte-identical documents surface as winnowing pairs with
    // overlap 1.0 — the pair is PLANTED in-test (the sf0.001 fixture
    // has zero exact-duplicate text groups, so asserting on the corpus
    // would be asserting fixture composition), next to an unrelated
    // doc that must not pair at all
    import spark.implicits._
    val dupText = (0 until 30).map(i => s"tok$i").mkString(" ")
    val otherText = (0 until 30).map(i => s"zzz$i").mkString(" ")
    val planted = Seq((1L, dupText), (2L, dupText), (3L, otherText))
      .toDF("doc_id", "text")
    val out = DedupOps.winnowingCore(planted).collect()
    val full = out.filter(_.getAs[Double]("overlap") == 1.0)
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(full === Set((1L, 2L)),
      s"expected exactly the planted dup pair at overlap 1.0, got $full")
    assert(out.forall(r => r.getAs[Long]("a") != 3L && r.getAs[Long]("b") != 3L),
      "the unrelated doc must share no fingerprint")
  }

  test("d18: a lifted paragraph is detected against the frozen index; unrelated docs verdict new") {
    import spark.implicits._
    // corpus: two unrelated docs; incoming: one doc lifting a ≥ k+w−1
    // token run from corpus doc 10, one sharing nothing
    val para = (0 until 12).map(i => s"lift$i").mkString(" ")
    val corpus = Seq(
      (10L, (0 until 10).map(i => s"c$i").mkString(" ") + " " + para),
      (11L, (0 until 25).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (20L, (0 until 10).map(i => s"in$i").mkString(" ") + " " + para),
      (21L, (0 until 25).map(i => s"fresh$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = DedupOps
      .winnowingIncrementalAgainst(incoming, DedupOps.winnowingIndex(corpus))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(20L).getAs[String]("verdict") === "overlaps_corpus")
    assert(out(20L).getAs[Long]("match_doc") === 10L)
    assert(out(20L).getAs[Long]("n_shared") > 0)
    assert(out(21L).getAs[String]("verdict") === "new")
    assert(out(21L).getAs[Long]("n_cand") === 0L)
    assert(out(21L).isNullAt(out(21L).fieldIndex("overlap")))
  }

  test("d19: a batch pushing boilerplate over the cap evicts it everywhere; append == rebuild") {
    import spark.implicits._
    // corpus: exactly Cap docs sharing one paragraph (its fingerprints
    // sit AT the cap — kept); the fresh batch repeats it once more, so
    // the shared hashes cross and must vanish from old AND new rows,
    // while the stats remember the true running DF
    val para = (0 until 12).map(i => s"bp$i").mkString(" ")
    val corpus = (1L to DedupOps.WinnowCap).map(i =>
      (i, s"p${i}a p${i}b p${i}c " + para)).toDF("doc_id", "text")
    val fresh = Seq((100L, "q1 q2 q3 " + para)).toDF("doc_id", "text")
    val (kept, dfAll) = DedupOps.winnowingIndexWithStats(corpus)
    val keptRows = kept.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h")))
    val byDoc = keptRows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val shared = byDoc.values.reduce(_ intersect _)
    assert(shared.nonEmpty, "a 12-token shared run must yield shared fingerprints")
    val (newKept, newDf) = DedupOps.winnowingAppendCore(kept, dfAll, fresh)
    val after = newKept.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h")))
    assert(after.forall(p => !shared.contains(p._2)),
      "crossed-cap hashes must vanish from every doc's rows")
    assert(after.exists(_._1 == 100L),
      "the fresh doc's unique fingerprints must land")
    val nd = newDf.filter(col("h").isin(shared.toSeq: _*))
      .collect().map(_.getAs[Long]("nd"))
    assert(nd.length == shared.size &&
      nd.forall(_ == DedupOps.WinnowCap + 1),
      "stats must retain evicted hashes at their true running DF")
    // append == rebuild, bit-exact, on the planted corpus too
    val rebuilt = DedupOps.winnowingIndex(corpus.unionByName(fresh))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h")))
      .sorted.toSeq
    assert(after.sorted.toSeq === rebuilt)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("d20 rewrite: duplicated aligned spans survive exactly once, at their first occurrence") {
    import spark.implicits._
    // documents assembled from CleanChunk-sized blocks so duplicate
    // spans are grid-aligned; one short tail exercises the partial
    // final chunk
    def blk(c: Char) = c.toString * DedupOps.CleanChunk
    val (a, b, cc, x, y, z) = (blk('a'), blk('b'), blk('c'), blk('x'), blk('y'), blk('z'))
    val docs = Seq(
      (1L, a + b + cc),   // first owner of a, b, c — untouched
      (2L, x + b + y),    // loses its copy of b
      (3L, b + z),        // loses b too
      (4L, cc + "tail")   // loses c; keeps the short unique tail
    ).toDF("doc_id", "text")
    val out = DedupOps.substringDedupCore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val expect = Map(1L -> (a + b + cc, 3L), 2L -> (x + y, 2L),
      3L -> (z, 1L), 4L -> ("tail", 1L))
    for ((id, (clean, nKept)) <- expect) {
      assert(out(id).getAs[String]("clean_md5") === md5Hex(clean),
        s"doc $id reconstruction diverges")
      assert(out(id).getAs[Long]("n_kept") === nKept)
      assert(out(id).getAs[Long]("clean_len") === clean.length.toLong)
    }
    assert(out(1L).getAs[Long]("orig_len") === (3 * DedupOps.CleanChunk).toLong)
  }

  test("d20 owner-join paths agree: bloom-pruned default == forced-broadcast form, bit-exact") {
    // the bloom sketch has no false negatives and the exact join clears
    // its false positives, so the two strategies are result-identical —
    // the invariant that makes the non-broadcast path safe to default
    // at 100 TB (where the dup-digest set outgrows any broadcast budget)
    val docs = Tables.documents(spark, Sf)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("orig_len"),
        r.getAs[Long]("clean_len"), r.getAs[String]("clean_md5")))
      .sortBy(_._1).toSeq
    val bloomPath = canon(DedupOps.substringDedupCore(docs))
    spark.sharedState.cacheManager.clearCache()
    val bcastPath = canon(DedupOps.substringDedupCore(docs, ownerBroadcast = true))
    assert(bloomPath === bcastPath)
  }

  test("d21 owner-lookup paths agree (shared dupOwnerLookup): bloom default == exact join, incl. the planted off-grid duplicate") {
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_segs"),
        r.getAs[Long]("n_dup"), r.getAs[Long]("n_cut"),
        r.getAs[Long]("orig_tokens"), r.getAs[Long]("clean_tokens"),
        r.getAs[String]("clean_md5")))
      .sortBy(_._1).toSeq
    // the harness corpus — both strategies through d20's shared helper
    val docs = Tables.documents(spark, Sf)
    val bloomPath = canon(DedupOps.substringCutCore(docs))
    spark.sharedState.cacheManager.clearCache()
    val exactPath = canon(DedupOps.substringCutCore(docs, ownerBloom = false))
    assert(bloomPath === exactPath)
    spark.sharedState.cacheManager.clearCache()
    // and the planted off-grid duplicate: the excision itself must be
    // strategy-invariant (the bloom path is the one that serves at scale)
    val span = (1 to 80).map(i => s"sp$i")
    val docA = ((1 to 7).map(i => s"pa$i") ++ span ++
      (1 to 9).map(i => s"sa$i")).mkString(" ")
    val docB = ((1 to 13).map(i => s"pb$i") ++ span ++
      (1 to 5).map(i => s"sb$i")).mkString(" ")
    val planted = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val pBloom = canon(DedupOps.substringCutCore(planted))
    spark.sharedState.cacheManager.clearCache()
    val pExact = canon(DedupOps.substringCutCore(planted, ownerBloom = false))
    assert(pBloom === pExact)
    assert(pBloom.find(_._1 == 2L).exists(_._4 > 0L),
      "the planted off-grid duplicate must be cut on the bloom path")
    spark.sharedState.cacheManager.clearCache()
  }

  test("d21 cuts an OFF-GRID duplicated span that the aligned grid (d20) cannot see") {
    import spark.implicits._
    // unique-token prefixes of DIFFERENT lengths push the shared span
    // to different offsets in each document — no 120-char aligned
    // chunk coincides, so d20 is structurally blind to the duplicate;
    // the winnowing anchors are content-chosen, so d21 is not
    val span = (1 to 80).map(i => s"sp$i")
    val docA = ((1 to 7).map(i => s"pa$i") ++ span ++
      (1 to 9).map(i => s"sa$i")).mkString(" ")
    val docB = ((1 to 13).map(i => s"pb$i") ++ span ++
      (1 to 5).map(i => s"sb$i")).mkString(" ")
    val docC = (1 to 60).map(i => s"un$i").mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val out = DedupOps.substringCutCore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the first owner and the unrelated doc are untouched and
    // reconstruct to their own text (token segments rejoin losslessly)
    for (id <- Seq(1L, 3L)) {
      assert(out(id).getAs[Long]("n_cut") === 0L, s"doc $id must keep everything")
      assert(out(id).getAs[Long]("clean_tokens") === out(id).getAs[Long]("orig_tokens"))
    }
    assert(out(1L).getAs[String]("clean_md5") === md5Hex(docA))
    assert(out(3L).getAs[String]("clean_md5") === md5Hex(docC))
    // the later copy loses the span's interior: detection can miss at
    // most ~2(w+k) edge tokens, so at least L − 2(w+k) tokens are cut
    val edgeLoss = 2L * (DedupOps.CutWinnowW + DedupOps.WinnowK)
    val b = out(2L)
    assert(b.getAs[Long]("n_cut") > 0L, "off-grid duplicate went undetected")
    assert(b.getAs[Long]("clean_tokens") <=
      b.getAs[Long]("orig_tokens") - (span.length - edgeLoss),
      s"cut too little: ${b.getAs[Long]("orig_tokens") - b.getAs[Long]("clean_tokens")} " +
        s"of a ${span.length}-token span")
    // and the copy's own prefix/suffix survive (the cut is local)
    assert(b.getAs[Long]("clean_tokens") >= 13L + 5L)
    // d20's aligned grid keeps every chunk of every doc here — the
    // contrast that motivates the alignment-free form
    val gridOut = DedupOps.substringDedupCore(docs).collect()
    gridOut.foreach { r =>
      assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_chunks"),
        s"doc ${r.getAs[Long]("doc_id")}: the grid should be blind to this geometry")
    }
  }

  test("d21 on the harness corpus: structural invariants and untouched-doc round-trip") {
    val docs = Tables.documents(spark, Sf)
    val out = DedupOps.substringCutCore(docs)
    if (out.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      out.persist()
    // cut ⊆ dup ⊆ segments; token accounting is exact
    assert(out.filter(col("n_cut") > col("n_dup")).count() === 0L)
    assert(out.filter(col("n_dup") > col("n_segs")).count() === 0L)
    val tokCheck = out.join(docs, Seq("doc_id"))
      .filter(col("orig_tokens") =!=
        size(split(col("text"), " ")).cast("long")).count()
    assert(tokCheck === 0L, "orig_tokens must equal the document's token count")
    // the corpus actually exercises the operator (tx19's duplicated
    // prose is off-grid-visible too)
    assert(out.filter(col("n_cut") > 0).count() > 0L,
      "fixture regression: no duplicated span long enough to cut")
    // a document that lost nothing reconstructs to its own text
    // bit-exactly (split-on-space rejoin is lossless, empty tokens incl.)
    val untouched = out.filter(col("n_cut") === 0)
      .join(docs, Seq("doc_id"))
      .select(col("clean_md5"), md5(col("text")).as("want")).collect()
    assert(untouched.nonEmpty)
    untouched.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("d20 on the harness corpus: every distinct chunk survives exactly once; untouched docs round-trip") {
    val docs = Tables.documents(spark, Sf)
    val out = DedupOps.substringDedupCore(docs)
    if (out.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      out.persist()
    // global guarantee: Σ n_kept == number of DISTINCT chunk contents
    // (each distinct aligned span is kept exactly once corpus-wide)
    val totKept = out.agg(sum(col("n_kept"))).collect()(0).getLong(0)
    val distinctChunks = docs.select(col("text"),
        explode(sequence(lit(0), greatest(length(col("text")) - 1, lit(0)),
          lit(DedupOps.CleanChunk))).as("s"))
      .select(expr(s"substring(text, s + 1, ${DedupOps.CleanChunk})").as("c"))
      .agg(countDistinct(md5(col("c")))).collect()(0).getLong(0)
    assert(totKept === distinctChunks)
    // a document that lost nothing reconstructs to its own text
    val untouched = out.filter(col("n_kept") === col("n_chunks"))
      .join(docs, Seq("doc_id"))
      .select(col("clean_md5"), md5(col("text")).as("want")).collect()
    assert(untouched.nonEmpty)
    untouched.foreach(r => assert(r.getString(0) === r.getString(1)))
    // and the rewrite never grows a document
    assert(out.filter(col("clean_len") > col("orig_len")).count() === 0L)
  }
}
