package graft

import graft.operators.RetrievalOps

/** IR tier invariants: the index path must be indistinguishable from the
  * scan path (that's what lets it replace it at scale), the fused
  * hybrid list must be recomputable from its rank columns (the RRF
  * formula is engine-exact), and the statistics row must satisfy the
  * dictionary identities. */
class RetrievalOpsSpec extends SparkSpec {

  test("ir4 inverted-index serve is bit-identical to ir2 scan-and-score") {
    val scan = RetrievalOps.bm25TopK(spark, Sf)
    val index = RetrievalOps.invertedServe(spark, Sf)
    // nullability may differ (coalesce-to-0 marks ir4's tf non-null);
    // names and types — what the driver compare sees — must not
    assert(scan.schema.map(f => (f.name, f.dataType)) ==
      index.schema.map(f => (f.name, f.dataType)),
      s"schema drift between the scan and index paths:\n${scan.schema}\n${index.schema}")
    val a = scan.collect().toSeq
    val b = index.collect().toSeq
    assert(a.nonEmpty && a == b,
      "the two BM25 paths diverged — the index path may only change the PLAN")
  }

  test("allPostings (compiled token_counts, shuffle-free) == the relational explode→groupBy aggregate") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, Sf)
    val compiled = RetrievalOps.allPostings(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    val relational = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("dl"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("tf"), max(col("dl")).as("dl"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(compiled.nonEmpty && compiled == relational,
      "token_counts postings drifted from the relational aggregate")
    // schema parity: downstream writers/mergers key on these exact names+types
    val sch = RetrievalOps.allPostings(docs).schema
      .map(f => (f.name, f.dataType.simpleString))
    assert(sch == Seq("tok" -> "string", "doc_id" -> "bigint",
      "tf" -> "int", "dl" -> "int"), s"postings schema drift: $sch")
  }

  test("ir11 MaxScore prune is bit-identical to ir2, and the prune actually bites") {
    val exhaustive = RetrievalOps.bm25TopK(spark, Sf).collect().toSeq
    val pruned = RetrievalOps.maxscoreTopK(spark, Sf).collect().toSeq
    assert(exhaustive.nonEmpty && pruned == exhaustive,
      "MaxScore may only change the PLAN — the top-k must be exhaustive's")
    // the efficiency claim: strictly fewer candidates reach the final
    // ranking than the exhaustive path scores (a θ of −∞ — seed term
    // matching fewer than K docs — would make this vacuous, so the
    // fixture must exercise real pruning)
    val docs = graft.sources.Tables.documents(spark, Sf)
    val full = RetrievalOps.bm25ScoredCore(docs).count()
    val survivors = RetrievalOps.maxscoreSurvivors(docs).count()
    assert(survivors >= RetrievalOps.TopK,
      "survivors must still cover the top-k")
    assert(survivors < full,
      s"prune did not bite: $survivors survivors of $full candidates")
  }

  test("ir12 block-max prune is bit-identical to ir2 and strictly beats ir11's survivor count") {
    val exhaustive = RetrievalOps.bm25TopK(spark, Sf).collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    val pruned = RetrievalOps.blockmaxTopK(spark, Sf).collect().toSeq
    assert(exhaustive.nonEmpty && pruned == exhaustive,
      "block-max may only change the PLAN — the top-k must be exhaustive's")
    val docs = graft.sources.Tables.documents(spark, Sf)
    spark.sharedState.cacheManager.clearCache()
    val msKeys = RetrievalOps.maxscoreSurvivors(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    spark.sharedState.cacheManager.clearCache()
    val bmKeys = RetrievalOps.blockmaxSurvivors(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // per-block maxima dominate per-doc contributions but are bounded
    // by the corpus-global maxima, and both pruners share one θ — so
    // the block-max survivor set is structurally a SUBSET of ir11's
    assert(bmKeys.subsetOf(msKeys),
      s"block-max admitted docs MaxScore pruned: ${(bmKeys -- msKeys).take(5)}")
    // and the measured improvement on the selective probe query: the
    // tighter bounds must actually cut candidates, not just tie
    assert(bmKeys.size < msKeys.size,
      s"block pruning did not improve on MaxScore: ${bmKeys.size} vs ${msKeys.size}")
    assert(bmKeys.size >= RetrievalOps.TopK)
  }

  test("ir13: champions == exhaustive when M covers every list; audit column exact; M=ChampM bounds candidates") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    // with M >= the largest df, every posting is a champion and the
    // serve must reproduce ir2 exactly, with exact_rank == rank
    spark.sharedState.cacheManager.clearCache()
    val nDocs = docs.count().toInt
    val full = RetrievalOps.championCore(docs, nDocs).collect()
      .sortBy(_.getAs[Int]("rank"))
    spark.sharedState.cacheManager.clearCache()
    val exhaustive = RetrievalOps.bm25TopK(spark, Sf).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(full.length == exhaustive.length && full.nonEmpty)
    full.zip(exhaustive).foreach { case (c, e) =>
      assert(c.getAs[Long]("doc_id") == e.getAs[Long]("doc_id"))
      assert(c.getAs[Double]("score") == e.getAs[Double]("score"))
      assert(c.getAs[Int]("exact_rank") == c.getAs[Int]("rank"),
        "with full champion lists the audit column must equal the rank")
    }
    // at the registered M: every emitted doc is a champion of some
    // term, exact_rank is 0 or the true exhaustive rank, and the
    // candidate union respects the hard M·|terms| bound
    spark.sharedState.cacheManager.clearCache()
    val served = RetrievalOps.championTopK(spark, Sf).collect()
    val exactByDoc = exhaustive
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    served.foreach { r =>
      val er = r.getAs[Int]("exact_rank")
      assert(er == exactByDoc.getOrElse(r.getAs[Long]("doc_id"), 0),
        s"doc ${r.getAs[Long]("doc_id")} audit column")
    }
    assert(served.length <=
      math.min(RetrievalOps.TopK,
        RetrievalOps.ChampM * RetrievalOps.QueryTerms.length))
    // the overlap the audit column reports is high but the tier is
    // genuinely inexact somewhere across SFs — structural sanity only:
    // ranks are 1..n with no gaps
    assert(served.sortBy(_.getAs[Int]("rank")).map(_.getAs[Int]("rank")).toSeq ==
      (1 to served.length))
    // championCore persists its scored frame; drop it so later suites'
    // PLAN assertions (ir2's scan count) don't see an InMemoryRelation
    spark.sharedState.cacheManager.clearCache()
  }

  test("ir14: positional-index phrase serve is bit-identical to ir6's scan form") {
    spark.sharedState.cacheManager.clearCache()
    val scan = RetrievalOps.phraseSearch(spark, Sf).collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    val served = RetrievalOps.phraseIndexServe(spark, Sf).collect().toSeq
    assert(scan.nonEmpty && served == scan,
      "the positional index may only change the PLAN — adjacency counts, " +
        "tfs, dl and the ratio must reproduce the scan form exactly")
    spark.sharedState.cacheManager.clearCache()
  }

  test("ir15: the at-rest index serve is bit-identical to ir2; bucket fn agrees driver/engine") {
    spark.sharedState.cacheManager.clearCache()
    val scan = RetrievalOps.bm25TopK(spark, Sf)
    val served = RetrievalOps.indexServe(spark, Sf)
    assert(scan.schema.map(f => (f.name, f.dataType)) ==
      served.schema.map(f => (f.name, f.dataType)),
      s"schema drift between scan and at-rest serve:\n${scan.schema}\n${served.schema}")
    val a = scan.collect().toSeq
    val b = served.collect().toSeq
    assert(a.nonEmpty && a == b,
      "the at-rest index serve may only change the PLAN (and the bytes read)")
    // the static partition predicate is only sound if the driver-side
    // bucket function reproduces the engine's — over the WHOLE corpus
    // vocabulary, not just the probe terms
    import org.apache.spark.sql.functions.{col, explode, array_distinct}
    import graft.functions.TextFunctions.tokens
    val vocab = graft.sources.Tables.documents(spark, Sf)
      .select(explode(array_distinct(tokens(col("text")))).as("tok"))
      .distinct()
      .select(col("tok"), RetrievalOps.termBucketCol(col("tok")).as("b"))
      .collect()
    assert(vocab.nonEmpty)
    vocab.foreach { r =>
      assert(r.getInt(1) == RetrievalOps.termBucketOf(r.getString(0)),
        s"bucket drift for token '${r.getString(0)}'")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("ir24: re-bucket 16→64 serves ir2 bit-identically at the new modulus; crash mid-migration keeps the old-modulus serve exact; driver/engine agree at 64") {
    spark.sharedState.cacheManager.clearCache()
    val root = graft.operators.SimilarityOps.indexRoot(spark, Sf) +
      "/spec-ir24"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val docs = graft.sources.Tables.documents(spark, Sf)
    RetrievalOps.writePostingsIndex(spark, root, docs)
    val before = RetrievalOps.serveFromIndex(spark, root)
      .transform(graft.operators.Common.presented(_,
        org.apache.spark.sql.functions.col("rank")))
      .collect().toSeq
    // plant the land→resolve crash across all three artifacts: the
    // OLD-modulus serve must still be exactly correct (movers' old
    // copies stand; landed copies live in dirs >= 16 that a 16-bucket
    // IN list never includes)
    RetrievalOps.rebucketPostingsIndex(spark, root, crashAfterLand = true)
    val midOld = RetrievalOps.serveFromIndex(spark, root)
      .transform(graft.operators.Common.presented(_,
        org.apache.spark.sql.functions.col("rank")))
      .collect().toSeq
    assert(midOld == before, "old-modulus serve diverged mid-migration")
    // recovery = plain rerun; then the NEW-modulus serve is the one
    RetrievalOps.rebucketPostingsIndex(spark, root)
    val after = RetrievalOps.serveFromIndex(spark, root,
        RetrievalOps.RebucketN)
      .transform(graft.operators.Common.presented(_,
        org.apache.spark.sql.functions.col("rank")))
      .collect().toSeq
    assert(after == before,
      "re-bucketed serve diverged from the pre-migration serve")
    // every artifact's rows sit in their new-modulus directory, no
    // duplicates (count == pre-migration count per artifact)
    import org.apache.spark.sql.functions.col
    for (art <- Seq("postings", "blockmeta", "dict")) {
      val mis = spark.read.parquet(s"$root/$art")
        .filter(col("term_bucket") =!=
          RetrievalOps.termBucketCol(col("tok"), RetrievalOps.RebucketN))
        .count()
      assert(mis == 0L, s"$art holds rows outside their 64-bucket dir")
    }
    // the driver-side bucket twin agrees with the engine at the NEW
    // modulus over the whole corpus vocabulary (ir15's pin at 64)
    import org.apache.spark.sql.functions.{explode, array_distinct}
    import graft.functions.TextFunctions.tokens
    val vocab = docs
      .select(explode(array_distinct(tokens(col("text")))).as("tok"))
      .distinct()
      .select(col("tok"), RetrievalOps.termBucketCol(col("tok"),
        RetrievalOps.RebucketN).as("b"))
      .collect()
    vocab.foreach { r =>
      assert(r.getInt(1) == RetrievalOps.termBucketOf(r.getString(0),
        RetrievalOps.RebucketN),
        s"64-bucket drift for token '${r.getString(0)}'")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("ir16: append==rebuild on every index artifact; the stored-metadata serve is ir2 and the prune bites") {
    import org.apache.spark.sql.functions.col
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.sources.Tables.documents(spark, Sf)
    val rootA = "target/graft-index/spec-ir16-append"
    val rootB = "target/graft-index/spec-ir16-rebuild"
    RetrievalOps.writePostingsIndex(spark, rootA,
      docs.filter(col("doc_id") % graft.operators.DedupOps.IncomingMod =!= 0))
    RetrievalOps.appendPostingsIndex(spark, rootA,
      docs.filter(col("doc_id") % graft.operators.DedupOps.IncomingMod === 0))
    RetrievalOps.writePostingsIndex(spark, rootB, docs)
    // every artifact merges associatively: appended == rebuilt, row-exact
    for (art <- Seq("postings", "blockmeta", "dict", "consts", "doclen")) {
      val a = spark.read.parquet(s"$rootA/$art")
      val b = spark.read.parquet(s"$rootB/$art")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"append != rebuild on $art")
    }
    // serving from the appended artifacts reproduces ir2 bit-exactly
    val served = RetrievalOps.rankedTopK(
      RetrievalOps.blockmaxSurvivorsFrom(spark, rootA)).collect().toSeq
    val exhaustive = RetrievalOps.bm25TopK(spark, Sf).collect().toSeq
    assert(exhaustive.nonEmpty && served == exhaustive,
      "the maintained at-rest block-max serve drifted from the exhaustive scan")
    // and the stored-maxima bound still prunes (looser than ir12's exact
    // per-block contribution maxima, but it must CUT, not just pass-through)
    spark.sharedState.cacheManager.clearCache()
    val survivors = RetrievalOps.blockmaxSurvivorsFrom(spark, rootA).count()
    val full = RetrievalOps.bm25ScoredCore(docs).count()
    assert(survivors >= RetrievalOps.TopK && survivors < full,
      s"stored-metadata prune did not bite: $survivors of $full")
    spark.sharedState.cacheManager.clearCache()
  }

  test("ir16: a retried append is a no-op on every artifact (exactly-once without a transaction log)") {
    import org.apache.spark.sql.functions.col
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.sources.Tables.documents(spark, Sf)
    val root = "target/graft-index/spec-ir16-retry"
    val standing = docs.filter(
      col("doc_id") % graft.operators.DedupOps.IncomingMod =!= 0)
    val batch = docs.filter(
      col("doc_id") % graft.operators.DedupOps.IncomingMod === 0)
    RetrievalOps.writePostingsIndex(spark, root, standing)
    RetrievalOps.appendPostingsIndex(spark, root, batch)
    def canon(art: String) = spark.read.parquet(s"$root/$art")
      .collect().map(_.toString).sorted.toSeq
    val once = Seq("postings", "blockmeta", "dict", "consts", "doclen")
      .map(a => a -> canon(a)).toMap
    // the retry: an operator rerun after ANY crash replays the same
    // batch — the anti-join guards must land nothing new
    RetrievalOps.appendPostingsIndex(spark, root, batch)
    once.foreach { case (art, rows) =>
      assert(canon(art) === rows, s"retry changed $art — append not idempotent")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("ir19: compaction bin-packs ONLY accreted buckets; untouched buckets byte-identical; serve unchanged") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val root = "target/graft-index/spec-ir19"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val docs = graft.sources.Tables.documents(spark, Sf)
    RetrievalOps.writePostingsIndex(spark, root, docs)
    // first compaction: bring every bucket to exactly one file (the
    // build's shuffle writes one file per contributing task per bucket)
    RetrievalOps.compactPostingsIndex(spark, root)
    val before = RetrievalOps.postingsBucketFiles(spark, root)
    assert(before.nonEmpty && before.values.forall(_.size == 1),
      "first compaction left a bucket with more than one file")
    // a second compaction pass finds nothing to do
    assert(RetrievalOps.compactPostingsIndex(spark, root).isEmpty,
      "compaction of a compacted index was not a no-op")
    // the day's ingest: a tiny batch whose tokens hit ONE bucket —
    // only that bucket accretes a second file
    val tok = "compactprobe"
    val hot = RetrievalOps.termBucketOf(tok)
    val batchDocs = Seq((900001L, s"$tok $tok"), (900002L, tok))
      .toDF("doc_id", "text")
    RetrievalOps.appendPostingsIndex(spark, root, batchDocs)
    spark.sharedState.cacheManager.clearCache()
    val servedBefore = RetrievalOps.serveFromIndex(spark, root).collect().toSeq
    val accreted = RetrievalOps.postingsBucketFiles(spark, root)
      .filter(_._2.size > 1).keys.toSet
    assert(accreted == Set(hot),
      s"append accreted buckets $accreted, expected only $hot")
    val rowsBefore = spark.read.parquet(s"$root/postings")
      .collect().map(_.toString).sorted.toSeq
    // the nightly bin-pack: compacts the hot bucket alone; every other
    // bucket's FILES survive byte-identical (path + size + mtime)
    def fileSig(m: Map[Int, Seq[org.apache.hadoop.fs.FileStatus]]) =
      m.map { case (b, fs) => b -> fs.map(f =>
        (f.getPath.toString, f.getLen, f.getModificationTime)).sortBy(_._1) }
    val preCompact = fileSig(RetrievalOps.postingsBucketFiles(spark, root))
    val compacted = RetrievalOps.compactPostingsIndex(spark, root)
    assert(compacted == Seq(hot), s"compacted $compacted, expected Seq($hot)")
    val postCompact = fileSig(RetrievalOps.postingsBucketFiles(spark, root))
    (preCompact.keySet - hot).foreach { b =>
      assert(postCompact(b) == preCompact(b),
        s"compaction rewrote untouched bucket $b")
    }
    assert(postCompact(hot).size == 1, "hot bucket not packed to one file")
    // pure layout: row content identical, the probe serve bit-identical
    val rowsAfter = spark.read.parquet(s"$root/postings")
      .collect().map(_.toString).sorted.toSeq
    assert(rowsAfter == rowsBefore, "compaction changed postings rows")
    spark.sharedState.cacheManager.clearCache()
    val servedAfter = RetrievalOps.serveFromIndex(spark, root).collect().toSeq
    assert(servedAfter.nonEmpty && servedAfter == servedBefore,
      "the serve changed across append+compact of a non-probed bucket")
    spark.sharedState.cacheManager.clearCache()
  }

  test("ir20: the at-rest term-as-data serve is bit-identical to ir5's in-memory batch serve") {
    spark.sharedState.cacheManager.clearCache()
    val served = RetrievalOps.indexBatchServe(spark, Sf).collect().toSeq
    graft.operators.CacheScope.drain()
    val mem = RetrievalOps.batchServe(spark, Sf).collect().toSeq
    assert(mem.nonEmpty && served == mem,
      "at-rest term-as-data serve drifted from ir5")
  }

  test("ir21: positional append == rebuild row-exact; standing files untouched; retry is a no-op; serve == ir6") {
    import org.apache.spark.sql.functions.col
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.sources.Tables.documents(spark, Sf)
    val standing = docs.filter(
      col("doc_id") % graft.operators.DedupOps.IncomingMod =!= 0)
    val batch = docs.filter(
      col("doc_id") % graft.operators.DedupOps.IncomingMod === 0)
    val rootA = "target/graft-index/spec-ir21-append"
    val rootB = "target/graft-index/spec-ir21-rebuild"
    RetrievalOps.writePositionalIndex(spark, rootA, standing)
    def fileSig() = new java.io.File(s"$rootA/positional").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("term_bucket="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
      }.toMap
    val standingFiles = fileSig()
    RetrievalOps.appendPositionalIndex(spark, rootA, batch)
    // per-doc facts: every standing file survives byte-identical
    val after = fileSig()
    standingFiles.foreach { case (b, fs) =>
      assert(after(b).take(fs.size) == fs ||
        fs.forall(after(b).contains),
        s"append rewrote standing files in $b")
    }
    RetrievalOps.writePositionalIndex(spark, rootB, docs)
    val a = spark.read.parquet(s"$rootA/positional")
    val b = spark.read.parquet(s"$rootB/positional")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "append != rebuild on the positional lists")
    // retry: nothing lands twice
    val once = a.collect().map(_.toString).sorted.toSeq
    RetrievalOps.appendPositionalIndex(spark, rootA, batch)
    assert(spark.read.parquet(s"$rootA/positional")
      .collect().map(_.toString).sorted.toSeq === once,
      "retried positional append landed rows twice")
    // the maintained serve is ir6's scan form bit-exactly
    spark.sharedState.cacheManager.clearCache()
    val served = RetrievalOps.positionalServe(spark, rootA).collect().toSeq
    val scan = RetrievalOps.phraseSearch(spark, Sf).collect().toSeq
    assert(scan.nonEmpty && served == scan,
      "maintained positional serve drifted from ir6")
  }

  test("ir16: stale metadata after a torn append heals by recount to the exact rebuilt state") {
    import org.apache.spark.sql.functions.col
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.sources.Tables.documents(spark, Sf)
    val rootT = "target/graft-index/spec-ir16-torn"
    val rootS = "target/graft-index/spec-ir16-stale"
    val rootF = "target/graft-index/spec-ir16-fullref"
    val standing = docs.filter(
      col("doc_id") % graft.operators.DedupOps.IncomingMod =!= 0)
    val batch = docs.filter(
      col("doc_id") % graft.operators.DedupOps.IncomingMod === 0)
    RetrievalOps.writePostingsIndex(spark, rootT, standing)
    RetrievalOps.writePostingsIndex(spark, rootS, standing)
    RetrievalOps.writePostingsIndex(spark, rootF, docs)
    RetrievalOps.appendPostingsIndex(spark, rootT, batch)
    // simulate the crash: rows landed, metadata writes never ran —
    // clobber rootT's metadata back to its pre-append (standing) state
    for (art <- Seq("blockmeta", "dict")) {
      spark.read.parquet(s"$rootS/$art").localCheckpoint()
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$rootT/$art")
    }
    spark.read.parquet(s"$rootS/consts").localCheckpoint()
      .write.mode("overwrite").parquet(s"$rootT/consts")
    // recovery: the heal recounts every metadata table from the
    // at-rest rows — the result is the full rebuild, artifact-exact
    RetrievalOps.healPostingsMetadata(spark, rootT)
    for (art <- Seq("postings", "blockmeta", "dict", "consts", "doclen")) {
      val a = spark.read.parquet(s"$rootT/$art")
      val b = spark.read.parquet(s"$rootF/$art")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"healed $art != rebuilt")
    }
    // and the healed index serves ir2's exact answer
    val served = RetrievalOps.rankedTopK(
      RetrievalOps.blockmaxSurvivorsFrom(spark, rootT)).collect().toSeq
    val exhaustive = RetrievalOps.bm25TopK(spark, Sf).collect().toSeq
    assert(served.nonEmpty && served == exhaustive)
    spark.sharedState.cacheManager.clearCache()
  }

  test("ir17: the at-rest positional phrase serve is bit-identical to ir6's scan form") {
    spark.sharedState.cacheManager.clearCache()
    val scan = RetrievalOps.phraseSearch(spark, Sf).collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    val served = RetrievalOps.phraseAtRestServe(spark, Sf).collect().toSeq
    assert(scan.nonEmpty && served == scan,
      "the at-rest positional index may only change the PLAN (and the bytes read)")
  }

  test("ir18: the at-rest champion serve is bit-identical to ir13's in-query form") {
    spark.sharedState.cacheManager.clearCache()
    val inQuery = RetrievalOps.championTopK(spark, Sf).collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    val served = RetrievalOps.championAtRestServe(spark, Sf).collect().toSeq
    assert(inQuery.nonEmpty && served == inQuery,
      "the at-rest champion prefix must reproduce ir13's candidate set, " +
        "scores and audit column exactly")
  }

  test("ir1 dictionary identities: cf >= df > 0, idf strictly decreasing in df, avgdl consistent") {
    val rows = RetrievalOps.termStats(spark, Sf).collect()
    assert(rows.length == RetrievalOps.QueryTerms.length)
    val n = rows.head.getLong(3)
    val tot = rows.head.getLong(4)
    rows.foreach { r =>
      val (df, cf) = (r.getLong(1), r.getLong(2))
      assert(df > 0 && cf >= df, s"term ${r.getString(0)}: df=$df cf=$cf")
      assert(df <= n)
      // the odds-ratio idf recomputes exactly from (df, N)
      assert(r.getDouble(6) == ((n - df) * 2 + 1).toDouble / (df * 2 + 1))
      assert(r.getDouble(5) == tot.toDouble / n)
    }
    // idf order is the REVERSE of df order (strict: fixture dfs differ)
    val byDf = rows.sortBy(_.getLong(1)).map(_.getString(0)).toSeq
    val byIdf = rows.sortBy(-_.getDouble(6)).map(_.getString(0)).toSeq
    assert(byDf == byIdf)
    // 'dup' is the corpus's rare term — it must carry the max idf
    assert(byIdf.head == "dup")
  }

  test("ir2: ranks are 1..K, scores positive and non-increasing, every hit matches a term") {
    val rows = RetrievalOps.bm25TopK(spark, Sf).collect()
    assert(rows.length == RetrievalOps.TopK)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall { case Array(x, y) => x >= y; case _ => true })
    rows.foreach(r => assert((4 until 4 + RetrievalOps.QueryTerms.length)
      .map(r.getInt).sum > 0, "a ranked doc contains no query term"))
  }

  test("ir3: rrf recomputes exactly from the rank columns; order follows rrf") {
    val rows = RetrievalOps.hybridRrf(spark, Sf).collect()
    assert(rows.nonEmpty)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val rText = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val rVec = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(rText.isDefined || rVec.isDefined)
      // a doc ranked by text carries its bm25 score; by vector its cosine
      assert(rText.isDefined == !r.isNullAt(4))
      assert(rVec.isDefined == !r.isNullAt(5))
      val expect = rText.map(x => 1.0 / (x + RetrievalOps.RrfK)).getOrElse(0.0) +
        rVec.map(x => 1.0 / (x + RetrievalOps.RrfK)).getOrElse(0.0)
      assert(r.getDouble(6) == expect, s"rrf drift at doc ${r.getLong(1)}")
      assert(r.getDouble(6) <= prev); prev = r.getDouble(6)
    }
    // both sources contribute (the fused list is genuinely hybrid)
    assert(rows.exists(!_.isNullAt(2)) && rows.exists(!_.isNullAt(3)))
    // the query doc itself never appears
    assert(!rows.exists(_.getLong(1) == RetrievalOps.HybridQueryDoc))
  }

  test("ir5: the served workload's first query reproduces ir2's ranking") {
    // query 0 carries exactly the fixed QueryTerms triple, so its slice
    // of the served output must equal ir2 (rank, doc_id, score)
    val all = RetrievalOps.batchServe(spark, Sf).collect()
    val served = all.filter(_.getLong(0) == 0L)
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val ir2 = RetrievalOps.bm25TopK(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == ir2)
    // every workload query produced results — the absent term only
    // zeroes its own ordinal, it doesn't kill the query
    assert(all.map(_.getLong(0)).toSet == RetrievalOps.ServeQueries.map(_._1).toSet)
  }

  test("ir7: incremental append == full rebuild, bit-exact (dictionary merge associativity)") {
    val appended = RetrievalOps.postingsAppend(spark, Sf).collect().toSeq
    val full = RetrievalOps.bm25TopK(spark, Sf).collect().toSeq
    assert(appended.nonEmpty && appended == full,
      "the merged standing+batch dictionary/stats drifted from the full-corpus build")
  }

  test("ir7: an EMPTY split side cannot null the merge (the review's latent-fixture case)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, Sf)
    for (onlyBatch <- Seq(true, false)) {
      // a corpus where one residue class is unpopulated: the other
      // side's stats must carry through the coalesced merge unchanged
      val sub = docs.filter(
        if (onlyBatch) col("doc_id") % graft.operators.DedupOps.IncomingMod === 0
        else col("doc_id") % graft.operators.DedupOps.IncomingMod =!= 0)
      val appended = RetrievalOps.postingsAppendCore(sub).collect().toSeq
      val full = RetrievalOps.rankedTopK(
        RetrievalOps.bm25ScoredCore(sub)).collect().toSeq
      assert(appended.nonEmpty && appended == full,
        s"onlyBatch=$onlyBatch: empty-side merge drifted (null propagation?)")
    }
  }

  test("ir8: lift recomputes exactly from the counts; co-occurrence bounded by either df") {
    val rows = RetrievalOps.termCooccur(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (term, rs) =>
      assert(RetrievalOps.QueryTerms.contains(term))
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= RetrievalOps.ExpandK)
    }
    val n = graft.sources.Tables.documents(spark, Sf).count()
    rows.foreach { r =>
      val (cab, dfT, dfO) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cab > 0 && cab <= math.min(dfT, dfO))
      assert(r.getDouble(6) == (n.toDouble * cab) / (dfT.toDouble * dfO),
        "lift drift")
      assert(r.getString(2) != r.getString(0))
    }
  }

  test("ir9: best passage window == plain-Scala dense slide over every start") {
    val rows = RetrievalOps.phraseSearch(spark, Sf) // force texts map below to stay lazy-safe
    val docs = graft.sources.Tables.documents(spark, Sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    def best(toks: Array[String]): Option[(Long, Int)] = {
      val hits = toks.indices.filter(i => RetrievalOps.QueryTerms.contains(toks(i)))
      if (hits.isEmpty) None
      else Some(toks.indices.map { w =>
        (hits.count(p => p >= w && p < w + RetrievalOps.PassageLen).toLong, w)
      }.maxBy { case (h, w) => (h, -w) }) // max hits, earliest start
    }
    val expected = docs.toSeq
      .flatMap { case (id, t) => best(t).map { case (h, w) => (id, w, h) } }
      .sortBy { case (id, _, h) => (-h, id) }
      .take(RetrievalOps.TopK)
    val got = RetrievalOps.passageExtract(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == expected, "passage slide drifted from the dense reference")
    assert(rows.count() > 0)
  }

  test("ir6: phrase_tf counts true adjacencies (plain-Scala reference); ratio bounded") {
    val (w1, w2) = RetrievalOps.Phrase
    val rows = RetrievalOps.phraseSearch(spark, Sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, Sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = texts(r.getLong(1)).split(" ", -1)
      val expect = toks.sliding(2).count {
        case Array(a, b) => a == w1 && b == w2; case _ => false }
      assert(r.getInt(2) == expect, s"doc ${r.getLong(1)} adjacency drift")
      assert(r.getInt(2) > 0)
      val ratio = r.getDouble(6)
      assert(ratio > 0 && ratio <= 1.0)
      // the phrase can't occur more often than its rarer word
      assert(r.getInt(2) <= math.min(r.getInt(3), r.getInt(4)))
    }
  }

  // ---- plan contracts (the PlanContractSpec discipline, kept local) ----

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.{SparkPlan, FilterExec, TakeOrderedAndProjectExec, FileSourceScanExec}
  import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

  private def executed(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }

  private def all[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(f) ++ p.subqueries.flatMap(all(_)(f))

  test("ir2 plan: top-k is a per-partition heap; only the one-row stats agg and the presentation exchange shuffle") {
    val p = executed(RetrievalOps.bm25TopK(spark, Sf))
    assert(all(p) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-k must plan as TakeOrderedAndProject, not a global sort")
    assert(all(p) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "the stats row must broadcast")
    val sh = all(p) { case e: ShuffleExchangeExec => e }
    assert(sh.size <= 2, // stats SinglePartition + presentation repartition(1)
      s"ir2 grew a corpus-width shuffle: ${sh.size} exchanges")
    assert(all(p) { case s: FileSourceScanExec => s }.size == 2,
      "exactly two documents scans: candidates + stats")
  }

  test("ir10: katz numerators equal a plain-Scala 3-hop path count over the rebuilt graph") {
    import org.apache.spark.sql.functions.{col, explode, array_distinct}
    import graft.functions.TextFunctions.tokens
    val pres = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val df = pres.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nodes = df.toSeq.sortBy { case (t, d) => (-d, t) }
      .take(RetrievalOps.CentralTermK).map(_._1)
    val nodeSet = nodes.toSet
    val byDoc = pres.filter(p => nodeSet(p._2)).groupBy(_._1)
    val cooc = new scala.collection.mutable.HashMap[(String, String), Long]
    byDoc.values.foreach { ps =>
      val ts = ps.map(_._2).distinct
      for (a <- ts; b <- ts if a != b)
        cooc((a, b)) = cooc.getOrElse((a, b), 0L) + 1L
    }
    // .toSeq BEFORE collect: collecting pairs out of a Map would
    // rebuild a Map and silently keep one dst per src
    val edges = cooc.toSeq.collect {
      case ((a, b), c) if c >= RetrievalOps.CoocMin => (a, b) }
    val inEdges = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def hop(prev: Map[String, Long]): Map[String, Long] =
      nodes.map(v => v ->
        inEdges.getOrElse(v, Seq.empty).map(u => prev.getOrElse(u, 0L)).sum)
        .toMap
    val h1 = hop(nodes.map(_ -> 1L).toMap)
    val h2 = hop(h1)
    val h3 = hop(h2)
    val rows = RetrievalOps.termCentrality(spark, Sf).collect()
    assert(rows.length == nodes.length)
    rows.foreach { r =>
      val t = r.getString(1)
      assert(r.getLong(2) == df(t), s"$t df")
      assert(r.getLong(3) == h1(t), s"$t hop1")
      assert(r.getLong(4) == h2(t), s"$t hop2")
      assert(r.getLong(5) == h3(t), s"$t hop3")
      assert(r.getLong(6) == 16L * h1(t) + 4L * h2(t) + h3(t), s"$t katz")
    }
    // the ranking is the katz order with term tie-break
    val ranked = rows.sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    val want = nodes.sortBy(t => (-(16L * h1(t) + 4L * h2(t) + h3(t)), t))
    assert(ranked == want)
    // the graph is non-degenerate at fixture scale
    assert(edges.nonEmpty && h3.values.sum > 0L)
  }

  test("ir4 plan: the probed-terms filter sits below the postings shuffle") {
    val p = executed(RetrievalOps.invertedServe(spark, Sf))
    val f = all(p) { case f: FilterExec if f.condition.toString.contains("dup") => f }
    assert(f.nonEmpty, "term-probe filter not found")
    assert(f.forall(n => n.collect { case e: ShuffleExchangeExec => e }.isEmpty),
      "the term filter must prune postings BEFORE they shuffle — at rest " +
        "this is the partition-pruned read of the query's postings lists")
    assert(all(p) { case t: TakeOrderedAndProjectExec => t }.nonEmpty)
  }
}
