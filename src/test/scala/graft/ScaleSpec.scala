package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Executable evidence for the two write-side scale techniques SCALE.md
  * leans on — the claims a plan audit can't make from read-side queries
  * alone:
  *
  *   - bucketed tables co-locate join keys at WRITE time, so an
  *     equi-join on the bucket key plans with NO exchange on either
  *     side (at 100 TB: the fact-fact join strategy when neither side
  *     broadcasts);
  *   - partitioned layouts turn a filter on the partition column into
  *     directory pruning — the scan never lists, opens, or reads
  *     non-matching files.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed co-located join: zero exchanges on either side") {
    val ev = Tables.events(spark, Sf).select("event_id", "user_id", "value")
    spark.sql("DROP TABLE IF EXISTS ev_bkt_a")
    spark.sql("DROP TABLE IF EXISTS ev_bkt_b")
    ev.write.bucketBy(8, "user_id").sortBy("user_id").saveAsTable("ev_bkt_a")
    ev.write.bucketBy(8, "user_id").sortBy("user_id").saveAsTable("ev_bkt_b")
    try {
      // disable broadcast so the join must be sort-merge — the case
      // bucketing exists for (a broadcast join trivially has no
      // shuffle; fact-fact joins can't broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val j = spark.table("ev_bkt_a").as("a")
        .join(spark.table("ev_bkt_b").as("b"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(5).mkString("\n"))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      // and it still computes the right thing
      val n = j.count()
      val expected = ev.groupBy("user_id").count()
        .agg(sum(col("count") * col("count"))).head().getLong(0)
      assert(n === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ev_bkt_a")
      spark.sql("DROP TABLE IF EXISTS ev_bkt_b")
    }
  }

  test("d7 production shape: batch dedup against a PERSISTED bucketed corpus index, zero index-side shuffle") {
    // the corpus key index is written ONCE, bucketed on the dedup key;
    // every later snapshot batch joins against those files with no
    // corpus-side exchange — re-hashing / re-shuffling the 100 TB
    // corpus per snapshot is exactly what d7 exists to avoid
    import graft.operators.DedupOps
    val hashed = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), DedupOps.headKey.as("head_key"))
    spark.sql("DROP TABLE IF EXISTS corpus_idx_bkt")
    hashed.filter(col("doc_id") % DedupOps.IncomingMod =!= 0)
      .select(col("head_key")).distinct()
      .withColumn("in_corpus", lit(1))
      .write.bucketBy(8, "head_key").sortBy("head_key")
      .saveAsTable("corpus_idx_bkt")
    try {
      // forbid broadcast: tiny harness index would otherwise broadcast
      // and prove nothing about the fact-sized-index plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val incoming = hashed.filter(col("doc_id") % DedupOps.IncomingMod === 0)
      val out = DedupOps.incrementalDedupAgainst(
        incoming, spark.table("corpus_idx_bkt"))
      val plan = out.queryExecution.executedPlan.toString
      // exactly ONE exchange in the whole job — the incoming batch's —
      // and the window reuses it (same head_key partitioning)
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange"))
      assert(exchanges === 1, s"want 1 exchange (incoming side only), got $exchanges:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(5).mkString("\n"))
      assert(plan.contains("Bucketed: true"), "index scan must read as bucketed")
      // verdict parity with the self-contained batch restatement
      val fromIndex = out.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      val restated = DedupOps.incrementalDedup(spark, Sf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      assert(fromIndex === restated)
      assert(fromIndex.nonEmpty &&
        fromIndex.map(_._3).toSet === Set("dup_of_corpus", "dup_in_batch", "new"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS corpus_idx_bkt")
    }
  }

  test("d18 production shape: winnowing probe against a PERSISTED bucketed fingerprint index, zero index-side shuffle") {
    // d18's standing side at 100 TB: the corpus fingerprint index is
    // written ONCE, bucketed on h; every re-crawl batch probes those
    // files with no index-side exchange (the d7 discipline on d17's
    // winnowed fingerprints)
    import graft.operators.DedupOps
    import org.apache.spark.sql.DataFrame
    val docs = graft.sources.Tables.documents(spark, Sf)
    val isNew = col("doc_id") % DedupOps.IncomingMod === 0
    spark.sql("DROP TABLE IF EXISTS winnow_idx_bkt")
    DedupOps.winnowingIndex(docs.filter(!isNew))
      .write.bucketBy(8, "h").sortBy("h").saveAsTable("winnow_idx_bkt")
    try {
      // forbid broadcast: the tiny harness index would otherwise
      // broadcast and prove nothing about the fact-sized-index plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val incoming = docs.filter(isNew)
      def exchanges(df: DataFrame): Int =
        df.queryExecution.executedPlan.toString.linesIterator.count(l =>
          l.contains("Exchange") && !l.contains("BroadcastExchange"))
      val fromIndex = DedupOps.winnowingIncrementalAgainst(
        incoming, spark.table("winnow_idx_bkt"), cacheBatch = false)
      val plan = fromIndex.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), "index scan must read as bucketed")
      assert(plan.contains("SortMergeJoin"),
        plan.linesIterator.take(5).mkString("\n"))
      // the inline restatement recomputes + reshuffles the index per
      // run; the bucketed read must plan strictly fewer exchanges
      val restated = DedupOps.winnowingIncrementalAgainst(incoming,
        DedupOps.winnowingIndex(docs.filter(!isNew)), cacheBatch = false)
      assert(exchanges(fromIndex) < exchanges(restated),
        s"bucketed=${exchanges(fromIndex)} inline=${exchanges(restated)}")
      // verdict parity with the self-contained restatement
      val a = fromIndex.orderBy("doc_id").collect().toSeq
      val b = restated.orderBy("doc_id").collect().toSeq
      assert(a === b)
      assert(a.nonEmpty && a.map(_.getAs[String]("verdict")).toSet ===
        Set("overlaps_corpus", "new"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS winnow_idx_bkt")
    }
  }

  test("partitioned layout: a partition-column filter prunes at the directory level") {
    val dir = Files.createTempDirectory("ev_part").toString
    Tables.events(spark, Sf).write
      .partitionBy("event_type").mode("overwrite").parquet(dir)
    val all = spark.read.parquet(dir)
    val clicks = all.filter(col("event_type") === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (directory pruning), not
    // PushedFilters (row-group pruning inside files already read)
    assert(plan.contains("PartitionFilters"), plan.linesIterator.take(8).mkString("\n"))
    assert(plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("event_type"))
    val expected = Tables.events(spark, Sf)
      .filter(col("event_type") === "click").count()
    assert(clicks.count() === expected)
    // physical proof: the scan's chosen files all live under the
    // matching partition directory
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = clicks.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    val files = scan.inputRDDs().head.partitions // force planning
    assert(files.nonEmpty)
    val selected = scan.metadata.get("Location").toSeq ++
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files.map(_.getPath.toString))
    assert(selected.exists(_.contains("event_type=click")))
    assert(!scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
      .exists(p => p.contains("event_type=") && !p.contains("event_type=click")))
  }

  test("z-order layout at rest: a rectangle query prunes to its cells' directories") {
    // the write side of ly1: events land cell-partitioned; a reader's
    // rectangle on (user, day) plans as `cell IN (cellsForRange(...))`
    // — directory pruning driven by EITHER dimension — plus the exact
    // BETWEEN residual inside the touched cells
    import graft.operators.LayoutOps
    val dir = Files.createTempDirectory("ev_zorder").toString
    val coords = LayoutOps.zCoords(Tables.events(spark, Sf))
      // partition-column values read back as int (partition inference);
      // cell < 2^22 by construction so the narrowing is lossless
      .withColumn("cell", col("cell").cast("int"))
    coords.write.partitionBy("cell").mode("overwrite").parquet(dir)
    val all = spark.read.parquet(dir)
    // rectangle: the first half of the user range × a 10-day window
    val st = coords.agg(min(col("u")), max(col("u")), min(col("day"))).head()
    val (u0, u1, d0) = (st.getLong(0), (st.getLong(0) + st.getLong(1)) / 2,
      st.getLong(2))
    val d1 = d0 + 9
    val cells = LayoutOps.cellsForRange(u0, u1, d0, d1)
    val q = all.filter(col("cell").isin(cells: _*) &&
      col("u").between(u0, u1) && col("day").between(d0, d1))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.linesIterator.take(8).mkString("\n"))
    assert(plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("cell"), "the cell IN list must prune directories")
    // physical proof: only the enumerated cells' directories are read
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    val read = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
    val wanted = cells.map(c => s"cell=$c/").toSet
    assert(read.nonEmpty && read.forall(p => wanted.exists(p.contains)),
      s"scan read outside the rectangle's cells: ${read.filterNot(p => wanted.exists(p.contains)).take(3)}")
    val touched = read.flatMap(p =>
      "cell=(-?\\d+)/".r.findFirstMatchIn(p).map(_.group(1))).toSet
    assert(touched.size < new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("cell=")),
      "fixture regression: the rectangle should not cover every cell")
    // parity with the unpartitioned filter
    val expected = LayoutOps.zCoords(Tables.events(spark, Sf))
      .filter(col("u").between(u0, u1) && col("day").between(d0, d1)).count()
    assert(q.count() === expected)
  }

  test("postings index at rest: the probe's bucket directories hold a strict subset of the index bytes") {
    // ir15's physical claim at the FILE level (the plan contract pins
    // the listed files; this measures the byte bound the pruning
    // buys): the fixed probe's term buckets are a strict subset of
    // the term_bucket directories, and their bytes a strict subset of
    // the index's — at 100 TB the difference between a serve reading
    // |terms| directories and re-scanning the postings table
    import graft.operators.RetrievalOps
    val root = Files.createTempDirectory("ir_index").toString
    RetrievalOps.writePostingsIndex(spark, root, Tables.documents(spark, Sf))
    val buckets = RetrievalOps.QueryTerms.map(RetrievalOps.termBucketOf(_)).toSet
    val dirs = new java.io.File(s"$root/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("term_bucket="))
    def bytes(fs: Array[java.io.File]): Long = fs.flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))).map(_.length).sum
    val probed = dirs.filter(d =>
      buckets.exists(b => d.getName == s"term_bucket=$b"))
    // most buckets are populated (the fixture vocab can leave a
    // couple empty at sf0.001), and the probe skips a real majority
    assert(dirs.length > RetrievalOps.TermBuckets / 2,
      s"fixture regression: only ${dirs.length} of ${RetrievalOps.TermBuckets} buckets populated")
    assert(probed.nonEmpty && probed.length < dirs.length)
    val (probeBytes, allBytes) = (bytes(probed), bytes(dirs))
    assert(probeBytes > 0 && probeBytes < allBytes,
      s"probe bytes $probeBytes vs index bytes $allBytes")
    info(f"probe reads $probeBytes of $allBytes index bytes " +
      f"(${100.0 * probeBytes / allBytes}%.1f%% across ${probed.length} of ${dirs.length} buckets)")
  }

  test("positional index at rest: the phrase's two bucket directories hold a strict subset of the list bytes") {
    // ir17's byte bound, measured (the plan contract pins the listed
    // files; this measures what the pruning buys): a phrase serve
    // reads its two terms' bucket directories, never the full
    // positional table — at 100 TB the difference between df-bounded
    // list IO and re-reading every token of every document
    import graft.operators.{RetrievalOps, SimilarityOps}
    spark.sharedState.cacheManager.clearCache()
    RetrievalOps.phraseAtRestServe(spark, Sf).collect()
    val root = SimilarityOps.indexRoot(spark, Sf) + "/irindex17"
    val buckets = Seq(RetrievalOps.Phrase._1, RetrievalOps.Phrase._2)
      .map(RetrievalOps.termBucketOf(_)).toSet
    val dirs = new java.io.File(s"$root/positional").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("term_bucket="))
    def bytes(fs: Array[java.io.File]): Long = fs.flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))).map(_.length).sum
    val probed = dirs.filter(d =>
      buckets.exists(b => d.getName == s"term_bucket=$b"))
    assert(dirs.length > RetrievalOps.TermBuckets / 2,
      s"fixture regression: only ${dirs.length} buckets populated")
    assert(probed.nonEmpty && probed.length <= 2 && probed.length < dirs.length)
    val (probeBytes, allBytes) = (bytes(probed), bytes(dirs))
    assert(probeBytes > 0 && probeBytes < allBytes,
      s"phrase bytes $probeBytes vs positional bytes $allBytes")
    info(f"phrase serve reads $probeBytes of $allBytes positional bytes " +
      f"(${100.0 * probeBytes / allBytes}%.1f%% across ${probed.length} of ${dirs.length} buckets)")
  }

  test("champion serve at rest: champions, pivot AND audit arm all read only the probe's bucket bytes") {
    // ir18's byte bound: every arm of the champion serve (prefix
    // selection, candidate pivot, exhaustive audit ranks) descends
    // from the ONE probedPostings read, so the whole query's postings
    // IO is the probe buckets' bytes — measured here against the full
    // index
    import graft.operators.{RetrievalOps, SimilarityOps}
    spark.sharedState.cacheManager.clearCache()
    RetrievalOps.championAtRestServe(spark, Sf).collect()
    graft.operators.CacheScope.drain()
    val root = SimilarityOps.indexRoot(spark, Sf) + "/irindex18"
    val buckets = RetrievalOps.QueryTerms.map(RetrievalOps.termBucketOf(_)).toSet
    val dirs = new java.io.File(s"$root/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("term_bucket="))
    def bytes(fs: Array[java.io.File]): Long = fs.flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))).map(_.length).sum
    val probed = dirs.filter(d =>
      buckets.exists(b => d.getName == s"term_bucket=$b"))
    assert(probed.nonEmpty && probed.length < dirs.length)
    val (probeBytes, allBytes) = (bytes(probed), bytes(dirs))
    assert(probeBytes > 0 && probeBytes < allBytes,
      s"champion-serve bytes $probeBytes vs index bytes $allBytes")
    info(f"champion serve reads $probeBytes of $allBytes index bytes " +
      f"(${100.0 * probeBytes / allBytes}%.1f%% across ${probed.length} of ${dirs.length} buckets)")
  }

  test("x30 at rest: the query-float fetch reads only the static id buckets; DPP scans report pruned IO") {
    // x30's two-fetch byte story, measured. The QUERY floats carry a
    // STATIC bucket predicate (query ids are known at plan time) —
    // ids 0..NumQueries-1 touch NumQueries of FloatBuckets id-bucket
    // directories, a strict byte subset of the float table. The two
    // DPP fetches (cell codes, shortlist floats) are pinned as
    // dynamicpruning in PlanContractSpec; here the executed scans'
    // OWN metrics must show post-pruning file counts no larger than
    // the static totals.
    import graft.operators.{SimilarityOps => Sim}
    spark.sharedState.cacheManager.clearCache()
    val df = Sim.sq8IvfRerank(spark, Sf)
    df.collect()
    val root = Sim.indexRoot(spark, Sf) + "/sq8ivfrr"
    val qBuckets = (0 until Sim.NumQueries).map(_ % Sim.FloatBuckets).toSet
    val dirs = new java.io.File(s"$root/floats").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("id_bucket="))
    def bytes(fs: Array[java.io.File]): Long = fs.flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))).map(_.length).sum
    val staticProbed = dirs.filter(d =>
      qBuckets.exists(b => d.getName == s"id_bucket=$b"))
    assert(dirs.length == Sim.FloatBuckets,
      s"fixture regression: ${dirs.length} float buckets")
    assert(staticProbed.length == qBuckets.size && qBuckets.size < dirs.length)
    val (qBytes, allBytes) = (bytes(staticProbed), bytes(dirs))
    assert(qBytes > 0 && qBytes < allBytes,
      s"query-float bytes $qBytes vs float-table bytes $allBytes")
    info(f"query-float fetch bounded by $qBytes of $allBytes float bytes " +
      f"(${100.0 * qBytes / allBytes}%.1f%% across ${staticProbed.length} of ${dirs.length} buckets)")
    // runtime evidence from the executed plan: every at-rest scan in
    // the serve read at most the table's total file count (and the
    // DPP'd codes scan strictly fewer files than the codes table
    // holds when the probe skips a cell)
    def deepScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val through: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq(m.relation.cachedPlan)
        case _ => Nil
      }
      (p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Nil
      }) ++ (p.children ++ p.subqueries ++ through).flatMap(deepScans)
    }
    val scans = deepScans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("sq8ivfrr")))
    assert(scans.nonEmpty, "no at-rest scans found in the executed serve")
    scans.foreach { sc =>
      val read = sc.metrics.get("numFiles").map(_.value).getOrElse(-1L)
      val total = sc.relation.location.inputFiles.length.toLong
      assert(read >= 0 && read <= total,
        s"scan read $read files of $total in ${sc.relation.location.rootPaths}")
    }
  }

  test("d20 owner lookup: the bloom sketch stays KB-scale while pruning the grid to the dup neighborhood") {
    // the threshold contrast behind defaulting d20 to the bloom path:
    // the dup-OWNER table grows with duplication (no structural bound —
    // at Lee et al.-scale duplication it is several % of ALL chunks and
    // outgrows any broadcast budget), while the SKETCH that crosses the
    // plan is constant-size. Measured here so SCALE.md can cite numbers.
    import graft.operators.DedupOps
    import graft.functions.{BloomBuildAgg, BloomMightContain}
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Tables.documents(spark, Sf)
    val grid = docs.select(col("doc_id"),
        explode(sequence(lit(0), greatest(length(col("text")) - 1, lit(0)),
          lit(DedupOps.CleanChunk))).as("s"), col("text"))
      .select(md5(expr(
        s"substring(text, s + 1, ${DedupOps.CleanChunk})")).as("h"))
    if (grid.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      grid.persist()
    val nGrid = grid.count()
    val dup = grid.groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
    val nDupDigests = dup.count()
    assert(nDupDigests > 0, "fixture regression: corpus lost its duplication")
    val sketch = dup.agg(column(
      BloomBuildAgg(expression(xxhash64(col("h"))),
        DedupOps.DupOwnerBloomItems, DedupOps.DupOwnerBloomFpp)
        .toAggregateExpression())).head().getAs[Array[Byte]](0)
    // constant-size plan constant: tens of KB at the configured
    // capacity, independent of corpus size (the owner TABLE is not)
    assert(sketch.length < 256 * 1024, s"sketch ${sketch.length}B")
    val nHits = grid.filter(column(BloomMightContain(
      expression(lit(sketch)), expression(xxhash64(col("h")))))).count()
    // every true dup row survives the probe (no false negatives) ...
    val nDupRows = dup.agg(sum(col("nd"))).head().getLong(0)
    assert(nHits >= nDupRows)
    // ... and the probe prunes the unique mass in-scan: hits stay
    // within fpp slack of the true dup rows, far below the full grid
    assert(nHits <= nDupRows + (DedupOps.DupOwnerBloomFpp * 2 * nGrid).toLong,
      s"bloom stopped pruning: $nHits hits of $nGrid grid rows")
    assert(nHits < nGrid, "probe must not pass the whole grid")
  }

  test("SQ8 at rest: the packed codes table stores a fraction of the float column's parquet bytes") {
    // the compression claim the whole x21-x25 tier exists for, as a
    // measured artifact: write the raw float embeddings and the packed
    // 1-byte/dim codes side by side and compare actual parquet bytes
    // (near-random floats are ~incompressible at 4 B/dim; codes are
    // 1 B/dim — the on-disk ratio should sit well under a half even
    // with footer/page overhead on this small fixture)
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val root = "target/graft-index/spec-sq8-bytes"
    Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$root/floats")
    spark.sharedState.cacheManager.clearCache()
    graft.operators.SimilarityOps.sq8PackedServe(spark, Sf) // builds .../sq8
      .collect()
    spark.sharedState.cacheManager.clearCache()
    val packedRoot = graft.operators.SimilarityOps.indexRoot(spark, Sf) + "/sq8"
    val (fb, pb) = (dirBytes(s"$root/floats"), dirBytes(packedRoot))
    assert(fb > 0 && pb > 0)
    assert(pb.toDouble / fb < 0.5,
      f"packed SQ8 is not compressing at rest: $pb%d B packed vs $fb%d B float (${pb.toDouble / fb}%.2f)")
  }

  test("binary signatures at rest: the written table stores a small fraction of the float column's bytes") {
    // x31's compression claim as a measured artifact: 2 BIGINT words
    // per vector vs 64 near-incompressible floats — the at-rest ratio
    // should sit far below SQ8's 1-byte/dim tier even with per-file
    // overhead on this small fixture
    def dirBytes(d: java.io.File): Long =
      (if (d.isDirectory) d.listFiles().map(dirBytes).sum
       else if (d.getName.endsWith(".parquet")) d.length else 0L)
    val root = "target/graft-index/spec-sign-bytes"
    Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$root/floats")
    spark.sharedState.cacheManager.clearCache()
    graft.operators.SimilarityOps.signHammingAtRest(spark, Sf).collect()
    spark.sharedState.cacheManager.clearCache()
    val sigRoot = graft.operators.SimilarityOps.indexRoot(spark, Sf) +
      "/signidx/signatures"
    val (fb, sb) = (dirBytes(new java.io.File(s"$root/floats")),
      dirBytes(new java.io.File(sigRoot)))
    assert(fb > 0 && sb > 0)
    assert(sb.toDouble / fb < 0.25,
      f"binary signatures are not compressing at rest: $sb%d B vs $fb%d B float (${sb.toDouble / fb}%.2f)")
  }

  test("band index at rest: a single re-crawled document probes at most its 4 band buckets' bytes") {
    // d25's byte bound for the production batch-of-one shape (the
    // re-crawl monitor): one document carries exactly Bands=4 band
    // signatures, so its probe descends into at most 4 of the 16
    // band_bucket directories — measured here at the file level (the
    // plan contract pins the DPP filter; this measures what it buys).
    // The probe doc is a STANDING doc re-crawled: same text → the
    // same band signatures, so the probed bucket set is readable
    // from the written index itself rather than re-deriving the
    // MinHash pipeline in the test.
    import graft.operators.DedupOps
    val root = Files.createTempDirectory("band_idx").toString
    val docs = Tables.documents(spark, Sf)
    DedupOps.writeBandIndex(spark, root, docs)
    graft.operators.CacheScope.drain()
    val probeId = docs.agg(min(col("doc_id"))).head.getLong(0)
    val probedBuckets = spark.read.parquet(s"$root/bands")
      .filter(col("doc_id") === probeId)
      .select(col("band_bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(probedBuckets.nonEmpty && probedBuckets.size <= DedupOps.Bands)
    // the serve still answers correctly from those buckets alone: the
    // re-crawled doc is found as a near-dup of its own standing row
    val v = DedupOps.bandProbeAgainst(spark, root,
        docs.filter(col("doc_id") === probeId))
      .filter(col("verdict") === "near_dup_of_corpus")
      .select(col("doc_id"), col("dup_of")).collect()
    graft.operators.CacheScope.drain()
    assert(v.length == 1 && v(0).getLong(0) == probeId &&
      v(0).getLong(1) == probeId)
    val dirs = new java.io.File(s"$root/bands").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("band_bucket="))
    def bytes(fs: Array[java.io.File]): Long = fs.flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))).map(_.length).sum
    val probed = dirs.filter(d =>
      probedBuckets.exists(b => d.getName == s"band_bucket=$b"))
    assert(dirs.length > DedupOps.Bands,
      s"fixture regression: only ${dirs.length} band buckets populated")
    assert(probed.length == probedBuckets.size && probed.length < dirs.length)
    val (probeBytes, allBytes) = (bytes(probed), bytes(dirs))
    assert(probeBytes > 0 && probeBytes < allBytes,
      s"probe bytes $probeBytes vs band-index bytes $allBytes")
    info(f"one-doc probe reads $probeBytes of $allBytes band-index bytes " +
      f"(${100.0 * probeBytes / allBytes}%.1f%% across ${probed.length} of ${dirs.length} buckets)")
  }

  test("simhash index at rest: a one-doc probe reads at most its 4 chunk buckets' bytes") {
    // d28's byte bound (the d25 one-doc shape): one document carries
    // exactly 4 pigeonhole chunks, so its probe descends into ≤ 4 of
    // the 16 chunk_bucket directories — and the serve still answers
    // correctly from those buckets alone (the re-crawled doc is found
    // as a near-dup of its own standing row, Hamming 0).
    import graft.operators.DedupOps
    spark.sharedState.cacheManager.clearCache()
    val root = Files.createTempDirectory("simhash_idx").toString
    val docs = Tables.documents(spark, Sf)
    DedupOps.writeSimhashIndex(spark, root, docs)
    val probeId = docs.agg(min(col("doc_id"))).head.getLong(0)
    val probedBuckets = spark.read.parquet(s"$root/chunks")
      .filter(col("doc_id") === probeId)
      .select(col("chunk_bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(probedBuckets.nonEmpty && probedBuckets.size <= 4)
    val v = DedupOps.simhashProbeAgainst(spark, root,
        docs.filter(col("doc_id") === probeId))
      .filter(col("verdict") === "near_dup_of_corpus")
      .select(col("doc_id"), col("dup_of")).collect()
    graft.operators.CacheScope.drain()
    assert(v.length == 1 && v(0).getLong(0) == probeId &&
      v(0).getLong(1) == probeId)
    val dirs = new java.io.File(s"$root/chunks").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("chunk_bucket="))
    def bytes(fs: Array[java.io.File]): Long = fs.flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))).map(_.length).sum
    val probed = dirs.filter(d =>
      probedBuckets.exists(b => d.getName == s"chunk_bucket=$b"))
    assert(dirs.length > 4,
      s"fixture regression: only ${dirs.length} chunk buckets populated")
    assert(probed.length == probedBuckets.size && probed.length < dirs.length)
    val (probeBytes, allBytes) = (bytes(probed), bytes(dirs))
    assert(probeBytes > 0 && probeBytes < allBytes,
      s"probe bytes $probeBytes vs chunk-index bytes $allBytes")
    info(f"one-doc simhash probe reads $probeBytes of $allBytes index bytes " +
      f"(${100.0 * probeBytes / allBytes}%.1f%% across ${probed.length} of ${dirs.length} buckets)")
  }

  test("SAX index at rest: the probe reads ≤ NumSegs band buckets and only the candidates' count buckets") {
    // ts9's byte bound (the plan contract pins the two DPP filters;
    // this measures what they buy). Planted population: 64 users, one
    // active segment each (segment = user % NumSegs), so exactly the
    // users sharing the probe's segment are Hamming-1 candidates —
    // their user buckets {0,4,8,12} are the ONLY count directories
    // the verify fetch may read.
    import graft.operators.{TimeSeriesOps => TS}
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val root = Files.createTempDirectory("sax_idx").toString
    val pop = (0L until 64L)
      .map(u => (u, 1000L + TS.SegDays * (u % TS.NumSegs), 1L))
      .toDF("user_id", "day", "cnt")
    TS.writeSaxIndex(spark, root, pop)
    val served = TS.saxServeFrom(spark, root).collect()
    graft.operators.CacheScope.drain()
    // every candidate's one-day series equals the probe's → sse 0,
    // and the candidate set is exactly the same-segment users
    assert(served.length == TS.TopK &&
      served.forall(_.getAs[Long]("sse") == 0L) &&
      served.map(_.getAs[Long]("user_id")).toSeq ==
        (1 to TS.TopK).map(_ * 4L),
      s"planted serve wrong: ${served.mkString(", ")}")
    def bucketDirs(art: String, pcol: String) =
      new java.io.File(s"$root/$art").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(s"$pcol="))
    def bytes(fs: Array[java.io.File]): Long = fs.flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))).map(_.length).sum
    // the probe's band buckets, read from the written index itself
    val probeBandBuckets = spark.read.parquet(s"$root/bands")
      .filter(col("user_id") === TS.ProbeUser)
      .select(col("bb_bucket")).distinct().collect().map(_.getInt(0)).toSet
    val bandDirs = bucketDirs("bands", "bb_bucket")
    assert(bandDirs.length > TS.NumSegs,
      s"fixture regression: only ${bandDirs.length} band buckets populated")
    assert(probeBandBuckets.size <= TS.NumSegs)
    val probedBand = bandDirs.filter(d =>
      probeBandBuckets.exists(b => d.getName == s"bb_bucket=$b"))
    assert(bytes(probedBand) > 0 && bytes(probedBand) < bytes(bandDirs))
    // the verify fetch's user buckets: candidates ∪ probe = {0,4,8,12}
    val countDirs = bucketDirs("counts", "u_bucket")
    val fetchBuckets = Set(0, 4, 8, 12)
    val probedCounts = countDirs.filter(d =>
      fetchBuckets.exists(b => d.getName == s"u_bucket=$b"))
    assert(countDirs.length == TS.SaxUserBuckets,
      s"fixture regression: only ${countDirs.length} user buckets populated")
    assert(bytes(probedCounts) > 0 && bytes(probedCounts) < bytes(countDirs))
    info(f"SAX probe reads ${bytes(probedBand)} of ${bytes(bandDirs)} band bytes " +
      f"(${probedBand.length} of ${bandDirs.length} buckets) and " +
      f"${bytes(probedCounts)} of ${bytes(countDirs)} count bytes " +
      f"(${probedCounts.length} of ${countDirs.length} buckets)")
  }

  test("size-targeted compaction: range-clustered files with bounded rows and disjoint key ranges") {
    import org.apache.spark.sql.functions._
    // the small-files compaction pass every lakehouse table needs:
    // range-repartition on the scan key + a per-file row cap gives
    // bounded file sizes AND non-overlapping key ranges, so a reader's
    // key predicate prunes to few files via parquet min/max stats
    val out = java.nio.file.Files.createTempDirectory("compact").toString
    val rows = 10000L
    val cap = 1500
    graft.sources.Tables.events(spark, Sf)
      .limit(rows.toInt)
      .repartitionByRange(4, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", cap)
      .parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 4, "range partitions + cap should emit several files")
    // per-file row bound holds and key ranges are pairwise disjoint
    val ranges = files.map { f =>
      val d = spark.read.parquet(f)
        .agg(count(lit(1)), min(col("event_id")), max(col("event_id"))).head()
      assert(d.getLong(0) <= cap, s"$f exceeds maxRecordsPerFile")
      (d.getLong(1), d.getLong(2))
    }
    assert(ranges.map(_._1).sum >= 0) // force evaluation
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, "file key ranges overlap — min/max pruning would read extra files")
      case _ =>
    }
    // total preserved
    assert(spark.read.parquet(out).count() == rows.min(
      graft.sources.Tables.events(spark, Sf).count()))
  }

  test("c5 shard store: the manifest's required columns are a small fraction of the store's data bytes") {
    // c5's byte story, measured at the parquet-footer level:
    // PlanContractSpec pins that the manifest scan REQUESTS only
    // (n_tok, h); here the footers of the written store measure what
    // that pruning buys — the two stat columns' chunk bytes vs the
    // text payload's. (Runtime FS counters can't show it: harness
    // files are smaller than the FS read buffer, which swallows whole
    // files either way.) At 100 TB this is the difference between
    // KB-scale stats IO and re-reading the corpus to verify an
    // export.
    import graft.operators.{SimilarityOps, TextOps}
    import graft.sources.Tables
    spark.sharedState.cacheManager.clearCache()
    val root = SimilarityOps.indexRoot(spark, Sf) + "/shardscale5"
    TextOps.writeShardStore(spark, root, Tables.documents(spark, Sf))
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(s"$root/shards").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= TextOps.NumShards, "store under-partitioned")
    var manifestCols = 0L
    var textCol = 0L
    files.foreach { f =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try rdr.getFooter.getBlocks.forEach { b =>
        b.getColumns.forEach { c =>
          c.getPath.toDotString match {
            case "n_tok" | "h" => manifestCols += c.getTotalSize
            case "text" => textCol += c.getTotalSize
            case _ => ()
          }
        }
      } finally rdr.close()
    }
    assert(manifestCols > 0 && textCol > 0, "footer audit found no chunks")
    assert(manifestCols * 2 < textCol,
      s"manifest columns $manifestCols B should be well under the " +
        s"text payload's $textCol B")
    info(f"manifest recount touches $manifestCols B of column chunks; " +
      f"the unread text payload holds $textCol B " +
      f"(${100.0 * manifestCols / (manifestCols + textCol)}%.1f%% of data bytes)")
  }

  test("ap6 sketch store: the serve's whole input is a small fraction of the corpus it answers for") {
    // the aggregate-state family's byte story: ap5 answers "how big is
    // each lang's vocabulary" by tokenizing the corpus; ap6's serve
    // reads ONLY the written k-min partials — bounded by langs ×
    // SketchBuckets × KmvK longs regardless of corpus size. The bound
    // here is total store bytes vs the documents parquet it stands in
    // for; at 100 TB the ratio is ~10 orders of magnitude, at sf0.001
    // it must already be well under 10%.
    import graft.operators.{ApproxOps, SimilarityOps}
    import graft.sources.Tables
    spark.sharedState.cacheManager.clearCache()
    // measured at sf0.01: the store is BOUNDED (langs × buckets × k
    // rows) while the corpus grows — at sf0.001 the 16 files' parquet
    // footers alone outweigh the 64 KB corpus, hiding the asymptote
    val sf = "/root/testdata/sf0.01"
    val root = SimilarityOps.indexRoot(spark, sf) + "/kmvscale6"
    ApproxOps.writeSketchStore(spark, root, Tables.documents(spark, sf))
    // data bytes at the parquet-footer level (the c5 technique): the
    // store is 16 small files whose FOOTERS outweigh their data at
    // harness scale — the scale-relevant quantity is the column-chunk
    // bytes a serve actually decodes
    val conf = spark.sparkContext.hadoopConfiguration
    def chunkBytes(dir: java.io.File): Long = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.isDirectory) walk(f)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil)
      walk(dir).map { f =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
        try {
          var t = 0L
          rdr.getFooter.getBlocks.forEach(b =>
            b.getColumns.forEach(c => t += c.getTotalSize))
          t
        } finally rdr.close()
      }.sum
    }
    val storeBytes = chunkBytes(new java.io.File(s"$root/kmv"))
    val corpusBytes = new java.io.File(s"$sf/documents.parquet").length
    assert(storeBytes > 0, "sketch store missing")
    // row bound: the partials can never exceed langs × buckets × k —
    // the invariant that holds at ANY corpus size
    val rows = spark.read.parquet(s"$root/kmv").count()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows <= langs * ApproxOps.SketchBuckets * ApproxOps.KmvK,
      s"partials hold $rows rows — more than the k-min bound")
    assert(storeBytes * 10 < corpusBytes,
      s"sketch store $storeBytes B should be well under a tenth of the " +
        s"$corpusBytes B corpus it answers for")
    info(f"serve input $storeBytes B vs corpus $corpusBytes B " +
      f"(${100.0 * storeBytes / corpusBytes}%.2f%%), $rows partial rows")
  }
}
