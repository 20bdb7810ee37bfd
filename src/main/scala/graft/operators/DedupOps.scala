package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication family over `documents` / `embeddings` — the
  * training-data-pipeline block (builder brief). The reference's only
  * dedup is the response-path idempotence guard
  * (`/root/reference/src/main/java/com/thaihoc/process/response/InvoiceResponseBatchProcessor.java:110-121`,
  * covered by ResponseOps.dedup); this family adds the content-dedup
  * operators a 100 TB corpus pipeline needs.
  *
  * Scale design — the common thread is NEVER materializing the O(n²)
  * pair space:
  *   - exact dedup (D1): one hash-shuffle on md5(text), map-side partial
  *     aggregation, no arrays in the buffer.
  *   - MinHash+LSH (D2): per-row signatures (narrow, codegen'd HOFs),
  *     then a shuffle join keyed on (band, band-signature) — candidate
  *     pairs are only generated within colliding buckets, the textbook
  *     LSH trade. At 100 TB: band count and rows-per-band tune the
  *     recall/cost curve; bucket join is a plain shuffle join that AQE
  *     can skew-split when a degenerate signature (e.g. empty docs)
  *     forms a hot bucket. A `repartition(bands × sigMod)` pre-bucket
  *     would bound any single bucket's pair blowup.
  *   - SimHash (D3): pure per-row HOF math, no shuffle at all — the
  *     64→16-bit signature join/hamming stage would reuse the D2 bucket
  *     pattern.
  *   - n-gram Jaccard (D4): pairwise ONLY within a blocking key
  *     (lang, source) — block sizes are data-bounded, pairs per block
  *     are O(k²) with small k.
  *   - embedding near-dup (D5): pairwise only within a sign-LSH bucket,
  *     cosine via left-fold double math (VectorFunctions contract).
  */
object DedupOps {

  /** MinHash parameters: 8 hash functions `(a·h + b) % HashMod`, paired
    * into 4 bands × 2 rows (LSH collision prob = 1-(1-J²)⁴). */
  val MinHashAB: Seq[(Long, Long)] =
    Seq((3L, 17L), (5L, 29L), (7L, 41L), (11L, 53L), (13L, 67L), (19L, 97L), (23L, 113L), (29L, 131L))
  val Bands = 4

  /** Near-dup verify threshold: Jaccard ≥ 0.05 stated as integer math
    * (20·|∩| ≥ |∪|) so no float comparison can flip between engines. */
  val JaccardNum = 20L

  /** D1 — exact dedup: hash-groupBy of the full text; the keeper is the
    * lowest doc_id (deterministic winner). One shuffle, partial-agg. */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .transform(Common.presented(_, col("keep_id")))

  /** D2 — MinHash + LSH near-dedup with exact-Jaccard verification:
    * shingle → minhash → band signatures → bucket join → verify. Output
    * is every candidate pair with its exact hashed-shingle Jaccard
    * counts and an integer near-dup flag.
    *
    * Hot path is compiled ([[graft.functions.HashedShingleSet]] /
    * [[graft.functions.MinHashSig]] / [[graft.functions.SortedIntersectCount]]):
    * the equivalent HOF pipeline pays interpreted lambdas per element
    * AND recomputes the md5 of every shingle 8× after `CollapseProject`
    * inlines the shared hash array into each `array_min` leg — measured
    * ~3 s of d2's 3.9 s at sf0.1. One compiled pass per row brings the
    * signature side under 0.3 s with bit-identical hashes. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame =
    Common.presented(minhashLshCore(s, dir), col("a"), col("b"))

  /** [[minhashLsh]] without the presentation sort — for composition
    * (D6): the sort sits below `edges.persist()` there and EliminateSorts
    * cannot remove it through the cache boundary. */
  def minhashLshCore(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions._
    // Sorted distinct hashed-shingle sets: MinHash input AND the
    // exact-Jaccard verify side (sortedness is what lets the verify do
    // a merge scan instead of building a hash set per candidate pair).
    val hsets = Tables.documents(s, dir).select(col("doc_id"),
      hashedShingleSet(tokens(col("text")), 2).as("bg"))
    // The SLIM signature table (doc_id + 8 longs) is materialized once —
    // the band self-join reads it twice. At 100 TB this persist becomes
    // a written signature table — the standard LSH-pipeline checkpoint —
    // with identical plan shape.
    val withMh = CacheScope.persist(hsets.select(col("doc_id"),
      minhashSig(col("bg"), MinHashAB).as("mh")))
    val sigs = withMh.select(col("doc_id"),
      posexplode(array((0 until Bands).map(bnd =>
        element_at(col("mh"), 2 * bnd + 1) * HashMod +
          element_at(col("mh"), 2 * bnd + 2)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")
    val cand = sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val inter = sortedIntersectCount(col("ba.bg"), col("bb.bg")).cast("long")
    val uni = (size(col("ba.bg")) + size(col("bb.bg"))).cast("long") - inter
    cand.join(hsets.as("ba"), col("a") === col("ba.doc_id"))
      .join(hsets.as("bb"), col("b") === col("bb.doc_id"))
      .select(col("a"), col("b"),
        inter.as("inter_cnt"),
        uni.as("union_cnt"),
        when(inter * JaccardNum >= uni, 1)
          .otherwise(0).as("is_near_dup"))
  }

  /** Signature column via the compiled [[graft.functions.SimHashLong]]
    * (one expression call per row; the `bits` separate interpreted HOF
    * folds it replaces cost 17 s at sf0.1 for the 60-bit variant). */
  private def simhashSig(bits: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.SimHashLong(
      GraftSqlBridge.expression(tokens(col("text"))), bits))
  }

  /** D3 — 16-bit SimHash, computed entirely per-row (no shuffle): for
    * each bit i, fold token hashes summing +1/-1 on bit i of the 60-bit
    * md5 hash; bit i of the signature is the sign of the sum. */
  def simhash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), simhashSig(16).as("simhash"))
      .transform(Common.presented(_, col("doc_id")))

  /** Max hamming distance (of [[Simhash60Bits]]) for a D3b near-dup —
    * the classic 64-bit/k=3 configuration, scaled to the 60-bit
    * md5-derived hash. */
  val SimhashMaxHamming = 3
  val Simhash60Bits = 60
  val Simhash60BandBits = 15

  /** 60-bit per-doc SimHash (D3b's signature). D3's 16-bit signature is
    * too narrow to band: with 4-bit chunks over same-vocabulary docs,
    * ~60% of ALL pairs collide (measured) — banding must leave chunk
    * space ≫ corpus size. 4 bands × 15 bits gives 32k values per band
    * while keeping the pigeonhole guarantee (hamming ≤ 3 leaves ≥ 1 of
    * 4 bands untouched → exact recall at the threshold). */
  private def simhash60(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), simhashSig(Simhash60Bits).as("simhash"))

  /** D3b — SimHash near-dup pairs: the hamming-neighbor stage over
    * [[simhash60]] signatures, reusing the D2 band-bucket pattern — any
    * pair sharing one of the 4 15-bit bands is a candidate; its true
    * hamming distance verifies via bit_count(xor). Never all-pairs:
    * candidates exist only inside (band, chunk) buckets. */
  def simhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val sigs = CacheScope.persist(simhash60(s, dir))
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), Simhash60BandBits * i)
          .bitwiseAND((1 << Simhash60BandBits) - 1)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .select(col("a"), col("b"), col("hamming"),
        when(col("hamming") <= SimhashMaxHamming, 1).otherwise(0).as("is_near_dup"))
      .transform(Common.presented(_, col("a"), col("b")))
  }

  /** Iteration cap for [[dedupClusters]] — with pointer jumping the
    * propagation converges in O(log diameter) rounds (measured: 5 on
    * the sf0.1 graph, whose components are transitive near-dup CHAINS
    * of diameter ≈ 9). The cap turns a data bug into a loud failure
    * instead of a hang. */
  val MaxCcIterations = 20

  /** D6 — near-dup pairs → connected components → canonical keepers:
    * the stage that turns D2's pair list into the actual dedup decision
    * (cluster id = min doc_id of the component; the keeper is that
    * doc). Iterative min-label propagation — per round, every node
    * takes the min label among itself and its neighbors; terminates
    * when no label changes.
    *
    * Scale notes: each round is one equi-join + one groupBy (both
    * shuffle on doc_id — co-partitioned, AQE-coalesced); rounds =
    * component diameter, NOT corpus size. `localCheckpoint` truncates
    * the growing lineage so round N's plan doesn't replay rounds
    * 1..N-1 (at 100 TB: a reliable checkpoint dir instead). The
    * driver sees only the per-round changed-count — no row data. This
    * is the alternating-star algorithm's simpler cousin; for
    * pathological diameters (chains), switch to large-star/small-star
    * with the same per-round plan shape. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshCore(s, dir)
      .filter(col("is_near_dup") === 1).select(col("a"), col("b"))
    val edges = pairs.unionByName(
        pairs.select(col("b").as("a"), col("a").as("b")))
      .persist()
    // the loop's working set is the PAIR GRAPH's endpoints, not the
    // corpus: singleton docs (the vast majority at scale) never enter
    // an iteration and rejoin as their own cluster at the end.
    // Initial labels are min(self, neighbors) — exactly what round 1
    // would compute from identity labels (the jump step over identity
    // is identity), so the loop starts one propagation step ahead and
    // saves a full round of join+agg+checkpoint+sum
    var labels = edges
      .groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("label"))
      .select(col("a").as("doc_id"), col("label"))
      .localCheckpoint(true)
    // convergence via the label-sum invariant: labels only ever
    // DECREASE elementwise, so an unchanged (exact, decimal) sum is
    // exactly the fixpoint — one narrow agg per round instead of a
    // self-join diff
    // Option-wrapped: sum() over an EMPTY frame is SQL NULL — an empty
    // pair graph (no near-dups at all) is already converged, every doc
    // a singleton
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
    var prevSum = labelSum(labels)
    var converged = prevSum.isEmpty
    var rounds = 0
    while (!converged && rounds < MaxCcIterations) {
      // neighbor step: my neighbors' labels
      val prop = edges.join(labels, edges("b") === labels("doc_id"))
        .select(edges("a").as("doc_id"), col("label"))
      // pointer-jump step: my LABEL's label — shortcuts chains so
      // rounds go O(diameter) → O(log diameter); measured 10 → 5
      // rounds on the sf0.1 graph (diameters ≈ 9: transitive near-dup
      // chains, not cliques). Valid because labels are always doc_ids
      // of endpoints, so label[label] is defined.
      val jump = labels.as("x").join(labels.as("p"),
          col("x.label") === col("p.doc_id"))
        .select(col("x.doc_id"), col("p.label").as("label"))
      // LAZY checkpoint: the convergence sum right below is the action
      // that materializes it — one job per round instead of two
      labels = labels.unionByName(prop).unionByName(jump)
        .groupBy(col("doc_id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val curSum = labelSum(labels)
      converged = curSum == prevSum
      prevSum = curSum
      rounds += 1
    }
    require(converged, s"label propagation did not converge in $MaxCcIterations rounds")
    edges.unpersist()
    shapeClusters(s, dir, labels)
  }

  /** D6b — same contract and oracle as [[dedupClusters]], components
    * computed by the alternating large-star/small-star rewrite
    * ([[StarComponents]]) instead of label propagation: the guard for
    * the 100× case where near-dup components are long transitive
    * CHAINS (large diameter), where propagation's round count grows
    * with log(diameter) but star stays O(log n) with a shrinking edge
    * working set. Both variants stay registered so the driver
    * hash-gates them against the identical recursive-closure oracle. */
  def dedupClustersStar(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshCore(s, dir)
      .filter(col("is_near_dup") === 1).select(col("a"), col("b"))
    val (labels, _) = StarComponents.components(pairs)
    shapeClusters(s, dir, labels)
  }

  /** D13 — INCREMENTAL clustering: merge a new batch's near-dup pairs
    * into an existing cluster assignment without re-clustering the
    * corpus. The production shape of d6 at 100 TB: daily dedup never
    * reruns connected components over every historical edge — it
    * contracts yesterday's assignment to STAR edges (doc → its label,
    * one edge per non-root member) and runs components over
    * stars ∪ batch-touching pairs only, a graph whose size is
    * O(corpus members-in-clusters + batch edges), independent of the
    * historical EDGE count (the expensive part: LSH pairs are quadratic
    * in bucket occupancy, the assignment is linear in docs).
    *
    * Star contraction preserves connectivity exactly, so the merged
    * labels are IDENTICAL to a full re-cluster — the registered query
    * recomputes the "yesterday" phase from the same parquet (batch =
    * doc_id % 10 == 0) to stay deterministic, and the driver hash-gates
    * it against the very same recursive-closure oracle as d6/d6b;
    * StarComponentsSpec pins d13 == d6b row-for-row. */
  def incrementalClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshCore(s, dir)
      .filter(col("is_near_dup") === 1).select(col("a"), col("b"))
      .persist()
    val batchTouch = col("a") % 10 === 0 || col("b") % 10 === 0
    // "yesterday": components over pairs fully inside the corpus slice
    val (labels0, _) = StarComponents.components(pairs.filter(!batchTouch))
    // contract to star edges and merge with the batch's pairs
    val stars = labels0.filter(col("doc_id") =!= col("label"))
      .select(col("doc_id").as("a"), col("label").as("b"))
    val (merged, _) = StarComponents.components(
      stars.unionByName(pairs.filter(batchTouch)))
    pairs.unpersist() // both phases are checkpoint-backed past this point
    shapeClusters(s, dir, merged)
  }

  /** Shared tail of d6/d6b: singleton docs (never in the pair graph —
    * the vast majority at scale) rejoin as their own cluster; keeper =
    * the component's min doc. */
  private def shapeClusters(s: SparkSession, dir: String,
      labels: DataFrame): DataFrame =
    shapeClustersOver(Tables.documents(s, dir), labels)

  /** The d6 output shape over an explicit doc universe — singletons
    * (docs without a label row) rejoin implicitly; d30 passes the
    * SURVIVOR universe. */
  private def shapeClustersOver(universe: DataFrame,
      labels: DataFrame): DataFrame = {
    val singletons = universe.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("label"))
    labels.unionByName(singletons)
      .select(col("doc_id"), col("label").as("cluster_id"),
        when(col("label") === col("doc_id"), 1).otherwise(0).as("is_keeper"))
      .transform(Common.presented(_, col("doc_id")))
  }

  /** D4 — blocked n-gram Jaccard: exact pairwise similarity, but ONLY
    * within a (lang, source) block — the classic blocking-key guard that
    * keeps pairwise dedup out of O(n²) territory.
    *
    * Pairwise sets are HASHED bigram sets (same md5-60bit-mod contract
    * as d2, replicated in the oracle) compared with the compiled
    * [[graft.functions.SortedIntersectCount]] merge scan: the
    * string-array `array_intersect` restatement builds a boxed hash
    * set per PAIR (~160k pairs at sf0.1) and measured 10.9 s; the
    * sorted-long merge is ~40× cheaper per pair and hashes each doc
    * once, not once per pair. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions._
    val d = Common.spread(Tables.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"),
        hashedShingleSet(tokens(col("text")), 2).as("hs"))
    val inter = sortedIntersectCount(col("x.hs"), col("y.hs")).cast("long")
    val uni = (size(col("x.hs")) + size(col("y.hs"))).cast("long") - inter
    d.as("x").join(d.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.lang").as("lang"), col("x.source").as("source"),
        inter.as("inter_cnt"), uni.as("union_cnt"))
      .transform(Common.presented(_, col("a"), col("b")))
  }

  /** D14 — asymmetric CONTAINMENT (quote/subset detection): within the
    * same (lang, source) blocks as d4, `|A∩B| / |A|` and `|A∩B| / |B|`
    * over the hashed-bigram sets. Jaccard misses the case a curation
    * pipeline cares about most — a short doc wholly quoted inside a
    * long one scores low Jaccard but containment ≈ 1 from the short
    * side — so the keep/drop gate reads the DIRECTIONAL ratio
    * (`is_subset` fires when either direction clears 80%). Same
    * compiled sorted-merge intersection and the same blocked-pair
    * bound as d4: one extra division per pair, zero new shuffles; the
    * ratios are double divisions of exact integers, bit-identical on
    * both engines. */
  def containment(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions._
    val d = Common.spread(Tables.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"),
        hashedShingleSet(tokens(col("text")), 2).as("hs"))
    val inter = sortedIntersectCount(col("x.hs"), col("y.hs")).cast("long")
    val sizeA = size(col("x.hs")).cast("long")
    val sizeB = size(col("y.hs")).cast("long")
    val contA = inter.cast("double") / sizeA.cast("double")
    val contB = inter.cast("double") / sizeB.cast("double")
    d.as("x").join(d.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.doc_id") < col("y.doc_id"))
      // a bigram-less doc (< 2 tokens) has no containment direction
      .filter(sizeA > 0 && sizeB > 0)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        sizeA.as("size_a"), sizeB.as("size_b"), inter.as("inter_cnt"),
        contA.as("cont_a_in_b"), contB.as("cont_b_in_a"),
        when(contA >= 0.8 || contB >= 0.8, 1).otherwise(0).as("is_subset"))
      .transform(Common.presented(_, col("a"), col("b")))
  }

  /** D5 — embedding near-dup: nearest neighbor within a 16-bucket
    * sign-LSH partition, flagged when cosine exceeds 0.35 (far from any
    * observed pair boundary in the harness data; the flag is derived
    * from bit-identical doubles on both engines). */
  def embedNearDup(s: SparkSession, dir: String): DataFrame =
    Common.presented(embedNearDupCore(s, dir), col("vec_id"))

  /** [[embedNearDup]] without the presentation sort — D11 composes it. */
  def embedNearDupCore(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("v"),
        signBucket(col("embedding"), 4).as("bucket"))
      .withColumn("nrm", sqrt(dotD(col("v"), col("v"))))
    val cos = dotD(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("nn_cos").desc, col("nn_id"))
    e.as("x").join(e.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nn_id"),
        cos.as("nn_cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("nn_id"), col("nn_cos"),
        when(col("nn_cos") > 0.35, 1).otherwise(0).as("is_near_dup"))
  }

  /** D11 — SEMANTIC dedup clusters: D5's embedding near-dup pairs →
    * connected components → canonical keepers, through the SAME
    * [[StarComponents]] stage d6b uses for text pairs — the clustering
    * machinery is modality-agnostic; only the pair generator changes
    * (hashed shingles for text, sign-LSH cosine for embeddings). The
    * oracle restates the closure recursively over the D5 pair SQL, so
    * the whole composition is hash-gated end-to-end. */
  def embedClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = embedNearDupCore(s, dir)
      .filter(col("is_near_dup") === 1)
      .select(col("vec_id").as("a"), col("nn_id").as("b"))
    val (labels, _) = StarComponents.components(pairs)
    val singletons = Tables.embeddings(s, dir).select(col("vec_id"))
      .join(labels.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("vec_id").as("label"))
    labels.withColumnRenamed("doc_id", "vec_id")
      .unionByName(singletons)
      .select(col("vec_id"), col("label").as("cluster_id"),
        when(col("label") === col("vec_id"), 1).otherwise(0).as("is_keeper"))
      .transform(Common.presented(_, col("vec_id")))
  }

  /** D7 split modulus: `doc_id % 5 == 0` plays the incoming snapshot
    * batch, the rest the already-ingested corpus. */
  val IncomingMod = 5

  /** D7's content key width: the head fingerprint hashes the first
    * [[HeadKeyTokens]] tokens. Full-text md5 is the degenerate
    * whole-document case of the same key; the truncated head is the
    * re-crawl key (pages that differ only in tail boilerplate /
    * timestamps dedup together), and it is the variant the harness
    * corpus actually exercises — its near-dups share heads, never the
    * full text. */
  val HeadKeyTokens = 8

  /** D7 — incremental dedup, the corpus-UPDATE path: a new snapshot
    * batch arrives and each incoming doc is verdicted against BOTH the
    * existing corpus and the rest of its own batch — `dup_of_corpus`
    * beats `dup_in_batch` beats `new` (a doc can be both; corpus
    * membership is the stronger fact). D1-D6 dedup a corpus in place;
    * real pipelines re-crawl, and re-hashing 100 TB per snapshot is the
    * anti-pattern this operator exists to avoid.
    *
    * Shape: the existing side collapses to a DISTINCT key set (at
    * 100 TB that set is the persisted key INDEX of the corpus, written
    * bucketed by key so this join is exchange-free on the big side —
    * the incoming batch alone shuffles); the within-batch keeper is a
    * row_number over the same key, so the left join's partitioning
    * is reused and the window adds NO second exchange. */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val hashed = Tables.documents(s, dir)
      .select(col("doc_id"), headKey.as("head_key"))
    val incoming = hashed.filter(col("doc_id") % IncomingMod === 0)
    val existing = hashed.filter(col("doc_id") % IncomingMod =!= 0)
      .select(col("head_key")).distinct()
      .withColumn("in_corpus", lit(1))
    incrementalDedupAgainst(incoming, existing)
      .transform(Common.presented(_, col("doc_id")))
  }

  /** The dedup key of d7: md5 of the document's first
    * [[HeadKeyTokens]] tokens. */
  def headKey: Column =
    md5(concat_ws(" ", slice(tokens(col("text")), 1, HeadKeyTokens)))

  /** D7 production-shape core: verdict an incoming batch
    * (`doc_id`, `head_key`) against a corpus key INDEX
    * (`head_key`, `in_corpus=1`) that is typically a PERSISTED table
    * written once, bucketed on `head_key` — then this join is
    * exchange-free on the index side (only the batch shuffles) and
    * batch N+1 reuses the same files with zero corpus-side work.
    * ScaleSpec pins exactly that plan shape and verdict parity with
    * the self-contained [[incrementalDedup]] restatement. */
  def incrementalDedupAgainst(incoming: DataFrame,
      corpusIndex: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("head_key")).orderBy(col("doc_id"))
    incoming
      .join(corpusIndex, Seq("head_key"), "left")
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("head_key"),
        when(col("in_corpus") === 1, lit("dup_of_corpus"))
          .when(col("rn") > 1, lit("dup_in_batch"))
          .otherwise(lit("new")).as("verdict"))
  }

  /** D15 — MinHash-LSH INCREMENTAL dedup: the FUZZY counterpart of d7.
    * d7 verdicts a snapshot batch by exact head-key; real re-crawls
    * mostly deliver near-duplicates (boilerplate drift, timestamps), so
    * the production pipeline ALSO probes the corpus's persisted LSH
    * band index with the incoming batch's band signatures — corpus
    * side stays put (at 100 TB: a table bucketed on (band, sig), same
    * exchange-free pattern ScaleSpec pins for d7's key index; the
    * registered query restates both sides from parquet for
    * determinism). Candidates verify with the exact sorted-merge
    * Jaccard (d2's compiled trio), then collapse to one verdict per
    * incoming doc: its candidate count, near-dup count, and the
    * smallest matching corpus doc. Only the incoming batch's bands
    * shuffle; pair space is bounded by band-bucket occupancy exactly
    * as in d2. */
  def minhashIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions._
    // persisted like d2's signature table: incoming and bandIndex both
    // read this frame, and without the persist the whole corpus would
    // shingle + MinHash TWICE (the measured hot path of d2)
    val hsets = Tables.documents(s, dir).select(col("doc_id"),
      hashedShingleSet(tokens(col("text")), 2).as("bg"))
    val sigs = hsets
      .select(col("doc_id"), minhashSig(col("bg"), MinHashAB).as("mh"))
      .select(col("doc_id"),
        posexplode(array((0 until Bands).map(bnd =>
          element_at(col("mh"), 2 * bnd + 1) * HashMod +
            element_at(col("mh"), 2 * bnd + 2)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")
      .transform(CacheScope.persist)
    val incoming = sigs.filter(col("doc_id") % IncomingMod === 0)
    val bandIndex = sigs.filter(col("doc_id") % IncomingMod =!= 0)
    val cand = incoming.as("x").join(bandIndex.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val inter = sortedIntersectCount(col("ba.bg"), col("bb.bg")).cast("long")
    val uni = (size(col("ba.bg")) + size(col("bb.bg"))).cast("long") - inter
    val verified = cand
      .join(hsets.as("ba"), col("a") === col("ba.doc_id"))
      .join(hsets.as("bb"), col("b") === col("bb.doc_id"))
      .select(col("a"), col("b"),
        when(inter * JaccardNum >= uni, 1).otherwise(0).as("nd"))
    val agg = verified.groupBy(col("a").as("doc_id"))
      .agg(count(lit(1)).as("n_cand"),
        sum(col("nd")).cast("long").as("n_dup"),
        min(when(col("nd") === 1, col("b"))).as("dup_of"))
    Tables.documents(s, dir).filter(col("doc_id") % IncomingMod === 0)
      .select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        col("dup_of"),
        when(coalesce(col("n_dup"), lit(0L)) > 0, lit("near_dup_of_corpus"))
          .otherwise(lit("new")).as("verdict"))
      .transform(Common.presented(_, col("doc_id")))
  }

  /** D8 eval-set modulus (`doc_id % 97 == 0` plays the benchmark) and
    * shingle width (word 3-grams — the published decontamination
    * n-gram range is 8-13 tokens on real corpora; 3 keeps overlap
    * non-degenerate on the harness's short synthetic texts while the
    * plan is width-independent). */
  val EvalMod = 97
  val DecontamK = 3

  /** D8 — eval-set decontamination: flag every training doc sharing ANY
    * hashed [[DecontamK]]-gram with the benchmark set — the standard
    * pre-training leakage scan (an eval question inside the training
    * corpus inflates the benchmark). The eval side is tiny by
    * construction (that's what makes it an eval set), so its distinct
    * shingle set BROADCASTS and the corpus side never shuffles: explode
    * → broadcast-hash left join → per-doc count, with the groupBy the
    * only exchange. At 100 TB the corpus explode streams scan-bound;
    * the eval shingle set stays a few MB regardless of corpus size —
    * and d22/[[decontamAtRest]] inverts the cost entirely: the corpus
    * shingles once into a written index and every eval release probes
    * it partition-pruned. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions._
    val docs = Tables.documents(s, dir)
    val ex = docs.filter(col("doc_id") % EvalMod =!= 0)
      .select(col("doc_id"),
        explode(hashedShingleSet(tokens(col("text")), DecontamK)).as("h"))
    val evalShingles = docs.filter(col("doc_id") % EvalMod === 0)
      .select(explode(hashedShingleSet(tokens(col("text")), DecontamK)).as("h"))
      .distinct()
      .withColumn("is_eval", lit(1))
    ex.join(broadcast(evalShingles), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("is_eval"), lit(0))).as("n_overlap"))
      .withColumn("is_contaminated",
        when(col("n_overlap") > 0, 1).otherwise(0))
      .transform(Common.presented(_, col("doc_id")))
  }

  /** D9 — quality-aware keeper selection: within each content-key
    * cluster (d7's head fingerprint — re-crawl copies share it), keep
    * the doc with the HIGHEST quality instead of d1/d6's lowest-id
    * policy; score here is distinct-token count (tx2's diversity
    * numerator), ties break to the lower doc_id so the verdict is
    * total. This is the policy layer every real dedup pipeline puts on
    * top of cluster identification — "which copy survives" matters as
    * much as "what is a copy" when near-dups differ in truncation or
    * boilerplate. One exchange: the rank, the cluster size and the
    * keeper flag are a row_number + count over the SAME cluster-key
    * partitioning, and the scoring is a narrow per-row projection
    * ahead of it. At 100 TB this shape is skew-safe (cluster sizes are
    * re-crawl multiplicities, bounded), and swapping the score for a
    * model-based quality column changes nothing in the plan. */
  def qualityKeeper(s: SparkSession, dir: String): DataFrame = {
    val headKey =
      md5(concat_ws(" ", slice(tokens(col("text")), 1, HeadKeyTokens)))
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), headKey.as("cluster_key"),
        size(array_distinct(tokens(col("text")))).cast("long").as("score"))
    val byKey = Window.partitionBy(col("cluster_key"))
    scored
      .withColumn("rn",
        row_number().over(byKey.orderBy(col("score").desc, col("doc_id"))))
      .withColumn("cluster_sz", count(lit(1)).over(byKey))
      .select(col("doc_id"), col("cluster_key"), col("score"),
        col("cluster_sz"),
        when(col("rn") === 1, 1).otherwise(0).as("is_keeper"))
      .transform(Common.presented(_, col("doc_id")))
  }

  /** D10's split shares (percent): train 80 / val 10 / test 10. */
  val SplitTrainPct = 80
  val SplitValPct = 10

  /** D10 — leakage-safe train/val/test assignment: the split hash is
    * keyed on the CONTENT-CLUSTER key (d7/d9's head fingerprint), not
    * the doc id, so every near-dup copy of a document lands in the SAME
    * split — hashing doc_ids instead silently leaks near-dup train text
    * into the eval splits, the exact contamination d8 exists to detect.
    * Same seeded-md5 determinism contract as tx5 (stable under
    * repartition, re-runs and engine swaps). Zero shuffle: key, bucket
    * and split label are one narrow projection; the final sort is
    * presentation only. */
  def clusterSplit(s: SparkSession, dir: String): DataFrame =
    Common.presented(clusterSplitCore(Tables.documents(s, dir)), col("doc_id"))

  /** Split core over any (doc_id, text) frame — sort-free narrow
    * projection, so it binds unchanged to a streaming source
    * (StreamingCurationSpec). */
  def clusterSplitCore(docs: DataFrame): DataFrame = {
    val headKey =
      md5(concat_ws(" ", slice(tokens(col("text")), 1, HeadKeyTokens)))
    docs
      .select(col("doc_id"), headKey.as("cluster_key"))
      .withColumn("split_bucket",
        (md5Long(concat(lit("split:"), col("cluster_key"))) % 100).cast("int"))
      .withColumn("split",
        when(col("split_bucket") < SplitTrainPct, lit("train"))
          .when(col("split_bucket") < SplitTrainPct + SplitValPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** The d10 split rule as ONE column over `text` — for fusing into a
    * wider projection (c1) without a second scan + join. Identical
    * expression tree to [[clusterSplitCore]]'s. */
  def splitCol: Column = {
    val key = md5(concat_ws(" ", slice(tokens(col("text")), 1, HeadKeyTokens)))
    val bucket = md5Long(concat(lit("split:"), key)) % 100
    when(bucket < SplitTrainPct, lit("train"))
      .when(bucket < SplitTrainPct + SplitValPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** D12 — split-leakage audit: for every val/test document, how many
    * of its word [[DecontamK]]-grams also occur in ANY train document —
    * the acceptance check on d10's split (cluster-keyed assignment
    * stops whole-document near-dups from crossing splits; this measures
    * what remains: partial overlaps, shared boilerplate, quotes). d8's
    * shape with the roles reversed: there the eval side was tiny and
    * broadcast; here the reference side (train ≈ 80% of the corpus) is
    * the big one, so the probe is a plain shuffle equi-join on the
    * shingle hash — AQE-splittable, no broadcast assumption — and the
    * distinct train-shingle set collapses map-side before it. At
    * 100 TB the train shingle index is written once, bucketed by hash,
    * and every new split proposal joins against it exchange-free —
    * d23/[[leakageAtRest]] WRITES that index (with append
    * maintenance) and serves this audit from the files; this form
    * proves the algebra. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions.hashedShingleSet
    val docs = Tables.documents(s, dir)
    val split = clusterSplitCore(docs).select(col("doc_id"), col("split"))
    val sh = docs
      .select(col("doc_id"),
        explode(hashedShingleSet(tokens(col("text")), DecontamK)).as("h"))
      .join(split, Seq("doc_id"))
    val trainSh = sh.filter(col("split") === "train")
      .select(col("h")).distinct()
      .withColumn("in_train", lit(1))
    sh.filter(col("split") =!= "train")
      .join(trainSh, Seq("h"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("in_train"), lit(0))).as("n_train_overlap"))
      .withColumn("is_leaky",
        when(col("n_train_overlap") > 0, 1).otherwise(0))
      .transform(Common.presented(_, col("doc_id")))
  }

  /** D16 cosine threshold: well clear of every observed within-cell
    * pair at all harness SFs, and — like every compared double — both
    * engines reach the comparison from bit-identical operands, so the
    * flag cannot flip between them regardless of the value chosen. */
  val SemTau = 0.4

  /** D16 — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * dedup by k-means cell. Every vector is assigned to its nearest
    * coarse centroid (the ANN tier's shared quantizer —
    * [[SimilarityOps.coarseCentroids]], the same cells x3/x10 probe),
    * then duplicates are detected ONLY within a cell and the most
    * central member of each duplicate neighborhood is kept: a vector is
    * pruned iff some same-cell vector sits within cosine [[SemTau]] of
    * it AND is closer to the centroid (centroid-cosine desc, vec_id asc
    * tie-break). D5/D11 find near-dup PAIRS/CLUSTERS via sign-LSH
    * buckets; this is the complementary curation form — cells come from
    * a trained quantizer, the keeper rule is quality-aware (most
    * representative, not min-id), and the output is a per-vector
    * keep/prune verdict ready to filter a training corpus.
    *
    * Scale: the pair space is cell-bounded — at 100 TB the centroid
    * count K grows with the corpus (SemDeDup uses ~100k clusters for
    * 5B embeddings) so cells stay ~O(corpus/K) and the within-cell
    * self-join is quadratic only in a bounded cell population; a hot
    * cell is AQE skew-split like any shuffle join. Assignment is one
    * broadcast of K·d floats + an argmax window; no stage touches the
    * O(n²) global pair space. The centroid set here is the
    * deterministic seed slice (x3's convention); x18's trained coarse
    * quantizer drops in without changing the plan. */
  def semDedup(s: SparkSession, dir: String): DataFrame =
    Common.presented(semDedupCore(s, dir), col("vec_id"))

  /** [[semDedup]] without the presentation sort — C2 composes the
    * per-vector verdict into the curation manifest (embeddings are 1:1
    * with documents: vec_id == doc_id). */
  def semDedupCore(s: SparkSession, dir: String): DataFrame = {
    val c = SimilarityOps.corpus(s, dir).drop("bucket")
    val cents = SimilarityOps.coarseCentroids(c)
    // both sides of the within-cell join read the assignment — persist
    // so the argmax window runs once (x5's shared-corpus convention;
    // the harness clears caches between queries). At 100 TB this IS
    // the written cell-partitioned assignment table of x11's layout,
    // and the self-join below is partition-local on it. coarseProbe
    // carries the winning cent_cos, so no re-derive join is needed.
    val asg = SimilarityOps.coarseProbe(c, cents, 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell_id"), col("cent_cos"))
    CacheScope.persist(asg)
    // one LEFT join carries every vector through (isolated vectors keep
    // a null y-side), and the prune verdict is a max over the vector's
    // same-cell candidates — no distinct, no second join-back
    val cos = dotD(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))
    val isDup = cos > SemTau &&
      (col("y.cent_cos") > col("x.cent_cos") ||
        (col("y.cent_cos") === col("x.cent_cos") && col("y.vec_id") < col("x.vec_id")))
    asg.as("x").join(asg.as("y"),
        col("x.cell_id") === col("y.cell_id") && col("x.vec_id") =!= col("y.vec_id"),
        "left")
      .groupBy(col("x.vec_id").as("vec_id"), col("x.cell_id").as("cell_id"),
        col("x.cent_cos").as("cent_cos"))
      .agg(max(when(isDup, 1).otherwise(0)).as("is_pruned"))
  }

  /** d17 winnowing geometry: word 4-grams, window of 4 grams — the
    * guarantee is "any shared token run of ≥ k+w−1 = 7 tokens yields a
    * shared fingerprint"; expected index density 2/(w+1) = 40% of gram
    * hashes. */
  val WinnowK = 4
  val WinnowW = 4

  /** d17's over-common-fingerprint cap: a fingerprint appearing in more
    * than this many documents is boilerplate, not provenance, and is
    * dropped before pairing (the MOSS practice, and tx6's
    * document-frequency discipline — it also BOUNDS the per-hash pair
    * fan-out at Cap², making worst-case pair count linear in distinct
    * fingerprints). */
  val WinnowCap = 10L

  /** D17 — winnowing fingerprint match (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS local-fingerprinting algorithm): every
    * document is reduced to the winnowed selection of its word-4-gram
    * hashes (min hash per sliding window of [[WinnowW]] grams — ONE
    * compiled pass per row, [[graft.functions.WinnowedFingerprintSet]]),
    * over-common fingerprints are dropped ([[WinnowCap]]), and documents
    * are paired by shared surviving fingerprints. Where d4's blocked
    * Jaccard measures whole-document set similarity inside a blocking
    * key, winnowing detects LOCAL overlap — a paragraph lifted between
    * otherwise-unrelated documents — with a hard guarantee: any shared
    * run of ≥ [[WinnowK]]+[[WinnowW]]−1 tokens is detected, while only
    * ~2/(w+1) of gram hashes ever leave the scan.
    *
    * 100 TB plan: the selection runs inside the document scan (no text
    * leaves the task); the only wide exchanges are the fingerprint-key
    * shuffle (density-reduced by winnowing) and the pair aggregate,
    * and the cap bounds any hash bucket's join fan-out at Cap² pairs —
    * the same guard that keeps d4's blocks and d2's LSH buckets out of
    * O(n²). */
  def winnowing(s: SparkSession, dir: String): DataFrame =
    winnowingCore(Tables.documents(s, dir))
      .transform(Common.presented(_, col("a"), col("b")))

  /** d17's body over any (`doc_id`, `text`) frame — the unit the
    * planted-document specs and the incremental/streaming bindings
    * reuse. */
  def winnowingCore(docs: DataFrame): DataFrame = {
    val fp = winnowedFingerprints(docs)
    // fp feeds the DF pre-aggregate AND the anti-join's probe side —
    // without a persist the winnowed explode (the most expensive scan)
    // computes twice (the multi-consumer rule; winnowingIndexWithStats
    // persists the identical frame for the same reason)
    CacheScope.persist(fp)
    // fingerprints are distinct per doc (expression postcondition), so
    // the hash count IS document frequency — computed as a
    // pre-aggregation (map-side partials: only (h, count) pairs cross
    // its exchange) whose over-cap survivors are BOILERPLATE hashes, a
    // set at most |fp|/Cap and in practice tiny, so it broadcasts into
    // an anti-join and the full-width (doc_id, h) frame is never
    // shuffled just to learn its DF (at extreme scale the same set
    // rides an ap3-style bloom filter instead of an exact broadcast);
    // kept is read three times (per-doc totals + both pair sides) —
    // persist per the multi-consumer rule
    val overCap = fp.groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") > WinnowCap).select(col("h"))
    val kept = fp.join(broadcast(overCap), Seq("h"), "left_anti")
    CacheScope.persist(kept)
    val cnt = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    val pairs = kept.as("x").join(kept.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(cnt.select(col("doc_id").as("a"), col("nfp").as("fp_a")), Seq("a"))
      .join(cnt.select(col("doc_id").as("b"), col("nfp").as("fp_b")), Seq("b"))
      .select(col("a"), col("b"), col("n_shared"), col("fp_a"), col("fp_b"),
        (col("n_shared").cast("double") /
          least(col("fp_a"), col("fp_b")).cast("double")).as("overlap"))
  }

  /** The winnowed-fingerprint explode shared by d17 and d18: one row
    * per (doc, surviving fingerprint), selection entirely in-scan. */
  private[graft] def winnowedFingerprints(docs: DataFrame): DataFrame = {
    import graft.functions.ShingleExpressions._
    docs.select(col("doc_id"),
      explode(winnowedFingerprintSet(tokens(col("text")), WinnowK, WinnowW))
        .as("h"))
  }

  /** The corpus's standing winnowing index: winnowed fingerprints with
    * the boilerplate cap applied using CORPUS document frequency only —
    * the frozen artifact a re-crawl batch probes (d7's key-index
    * discipline; at 100 TB this is a persisted table bucketed on `h`,
    * so the probe join is exchange-free on the index side). */
  def winnowingIndex(corpus: DataFrame): DataFrame =
    winnowingIndexWithStats(corpus)._1

  /** D18 — INCREMENTAL winnowing match, the d7/d15 re-crawl discipline
    * applied to d17's local-overlap detector: an incoming snapshot
    * batch is winnowed and probed against the corpus's FROZEN
    * fingerprint index ([[winnowingIndex]]) — the corpus is never
    * re-fingerprinted per batch, and batch docs are NOT paired with
    * each other (that is d17's job on the merged corpus). Per incoming
    * doc: its surviving fingerprint count, how many corpus docs share
    * any fingerprint, the best match (most shared fingerprints, ties
    * to the smallest corpus doc), and a verdict — any surviving shared
    * fingerprint means a detected lifted run (winnowing's guarantee),
    * so `overlaps_corpus` vs `new`.
    *
    * 100 TB plan: only the batch's fingerprints shuffle (the index is
    * at rest, bucketed on `h` — d26/[[winnowProbeAtRest]] WRITES that
    * layout and serves this probe partition-pruned from the files;
    * this form proves the algebra); the cap inherited from the index bounds
    * any hash bucket's probe fan-out at [[WinnowCap]] corpus rows; the
    * per-doc windows share one `doc_id` exchange. Verdicts are per-row
    * independent given the frozen index, so the streaming binding
    * (micro-batched probe, StreamingWinnowSpec) equals this batch form
    * under any arrival order or batch cut. */
  def winnowingIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val incoming = docs.filter(col("doc_id") % IncomingMod === 0)
    val corpus = docs.filter(col("doc_id") % IncomingMod =!= 0)
    winnowingIncrementalAgainst(incoming, winnowingIndex(corpus))
      .transform(Common.presented(_, col("doc_id")))
  }

  /** The at-rest winnowing index PAIR: the capped fingerprint table
    * AND the full document-frequency stats — the stats retain the
    * over-cap hashes the fingerprint table dropped, because an append
    * must know the true running DF to re-evaluate the cap (without
    * them an evicted hash's count restarts at zero and boilerplate
    * sneaks back in). */
  def winnowingIndexWithStats(corpus: DataFrame): (DataFrame, DataFrame) = {
    val fp = winnowedFingerprints(corpus)
    CacheScope.persist(fp) // feeds both halves
    val dfAll = fp.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    val kept = fp.join(
      broadcast(dfAll.filter(col("nd") > WinnowCap).select(col("h"))),
      Seq("h"), "left_anti")
    (kept, dfAll)
  }

  /** D19 — winnowing index APPEND, the maintenance half d18's probe
    * assumes (ir7's postings-append discipline): fold a fresh document
    * batch into the standing index WITHOUT re-fingerprinting the
    * corpus. DF stats merge by summation; a hash whose TOTAL frequency
    * crosses [[WinnowCap]] evicts ALL its rows (old and fresh — DF
    * only grows, so eviction is monotone and nothing ever resurrects);
    * under-cap hashes keep their old rows and gain the batch's. The
    * result is BIT-EQUAL to rebuilding from scratch over
    * corpus ∪ batch — that is this query's oracle (the registered
    * output IS the appended fingerprint table, and the DuckDB twin
    * computes the full rebuild), and DedupGuaranteesSpec additionally
    * pins a planted cap-crossing eviction.
    *
    * 100 TB plan: only the batch's fingerprints shuffle (one
    * map-side-partial DF aggregate + the explode); the stats merge
    * exchanges (h, count) pairs only; the merged over-cap set (≤
    * |fp|/Cap keys, d17's broadcast bound) anti-joins both halves in
    * one pass. At rest only the hashes that CROSSED cap in this batch
    * — a tiny subset — require rewriting standing buckets (the table
    * is bucketed on h, so the rewrite touches affected buckets only,
    * x17's discipline); the rest of the standing table is untouched —
    * d27/[[appendWinnowIndex]] is exactly that maintenance made
    * physical, bucket-scoped eviction and all. */
  def winnowingAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val isNew = col("doc_id") % IncomingMod === 0
    val (kept, dfAll) = winnowingIndexWithStats(docs.filter(!isNew))
    winnowingAppendCore(kept, dfAll, docs.filter(isNew))._1
      .transform(Common.presented(_, col("doc_id"), col("h")))
  }

  /** d19's core: merge a fresh batch into (kept fingerprints, full DF
    * stats); returns the new pair. */
  def winnowingAppendCore(oldKept: DataFrame, oldDf: DataFrame,
      fresh: DataFrame, cacheBatch: Boolean = true): (DataFrame, DataFrame) = {
    val bfp = winnowedFingerprints(fresh)
    // feeds the batch DF aggregate and the new rows — but a
    // long-running streaming maintenance monitor calls this per
    // micro-batch and must not accumulate per-batch persists (the
    // appendManifest / winnowingIncrementalAgainst convention)
    if (cacheBatch) { CacheScope.persist(bfp); () }
    val bdf = bfp.groupBy(col("h")).agg(count(lit(1)).as("nd_new"))
    val mergedDf = oldDf
      .join(bdf, Seq("h"), "full_outer")
      .select(col("h"),
        (coalesce(col("nd"), lit(0L)) + coalesce(col("nd_new"), lit(0L)))
          .as("nd"))
    // over-cap AFTER the merge: evicts old rows that crossed and
    // filters the batch's own additions (a batch can push a hash over
    // by itself); DF is monotone, so previously-evicted hashes are
    // already absent from oldKept and stay out via the same filter
    val overCap = mergedDf.filter(col("nd") > WinnowCap).select(col("h"))
    val newKept = oldKept.unionByName(bfp)
      .join(broadcast(overCap), Seq("h"), "left_anti")
    (newKept, mergedDf)
  }

  /** D18 production-shape core: verdict an incoming (`doc_id`, `text`)
    * batch against a standing fingerprint index (`doc_id`, `h`). The
    * batch side carries NO cap of its own — boilerplate hashes are
    * already absent from the index, so they simply miss. */
  def winnowingIncrementalAgainst(incoming: DataFrame,
      index: DataFrame, cacheBatch: Boolean = true): DataFrame = {
    val bfp = winnowedFingerprints(incoming)
    // read twice: per-doc totals + the probe join — but a long-running
    // streaming monitor calls this per micro-batch and must not
    // accumulate per-batch persists (the appendManifest convention)
    if (cacheBatch) { CacheScope.persist(bfp); () }
    val hits = bfp
      .join(index.select(col("doc_id").as("match_doc"), col("h")), Seq("h"))
      .groupBy(col("doc_id"), col("match_doc"))
      .agg(count(lit(1)).as("n_shared"))
    winnowVerdictCore(incoming, bfp, hits)
  }

  /** d18's verdict tail over (incoming ids, the batch's fingerprints,
    * the per-(doc, match) shared counts) — ONE tree shared by the
    * in-memory probe and the at-rest DPP probe (d26), so the two
    * serving paths cannot drift. */
  private def winnowVerdictCore(incoming: DataFrame, bfp: DataFrame,
      hits: DataFrame): DataFrame = {
    val nfp = bfp.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    // both windows key on doc_id — one exchange serves the pair
    val best = hits
      .withColumn("n_cand", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("n_shared").desc, col("match_doc"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_cand"), col("match_doc"), col("n_shared"))
    incoming.select(col("doc_id"))
      .join(nfp, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nfp"), lit(0L)).as("nfp"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("match_doc"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_shared") > 0,
          col("n_shared").cast("double") / col("nfp").cast("double"))
          .as("overlap"),
        when(coalesce(col("n_shared"), lit(0L)) > 0, lit("overlaps_corpus"))
          .otherwise(lit("new")).as("verdict"))
  }

  /** d20's rewrite-chunk geometry: stride == size, so the grid
    * PARTITIONS the text (no overlap) and the kept chunks concatenate
    * back into a well-defined cleaned document. Distinct from tx14's
    * overlapping retrieval grid on purpose — an overlap would make
    * reconstruction ambiguous. */
  val CleanChunk = 120

  /** D20 — exact-substring dedup with corpus REWRITE (the Lee et al.
    * 2022 "Deduplicating Training Data Makes Language Models Better"
    * ExactSubstr family, grid-approximated): where d1 drops whole
    * duplicate documents and tx19 only SCORES cross-doc chunk
    * duplication, d20 produces the cleaned corpus itself — every
    * duplicated [[CleanChunk]]-char aligned span is kept exactly ONCE
    * globally (at its first occurrence in (doc_id, chunk_start) order)
    * and every later copy is cut out of its document's text. Output
    * per document: chunk counts, original/cleaned character masses,
    * and the md5 of the reconstructed cleaned text (the verifiable
    * digest of the rewrite — the compared surface stays narrow while
    * pinning every byte of the reconstruction).
    *
    * 100 TB plan: the grid is a scan-bound explode (×1 row volume —
    * the chunks partition the text); duplicate-digest first owners
    * come from ONE map-side-partial aggregate whose df≥2 survivors
    * are the boilerplate head. The owner lookup DEFAULTS to the bloom
    * path ([[substringDedupCore]]): a few-KB sketch of the dup digests
    * prunes the grid in-scan — provably-unique chunks never join — and
    * only probe-hits reach the exact owner join, whose strategy AQE
    * picks (broadcast small, shuffle large; no forced hint, because
    * the dup set has no structural size bound). The only text-bearing
    * exchange is the per-doc reconstruction rollup on doc_id; that is
    * the rewrite's irreducible cost (it writes the new corpus), and at
    * rest it is exactly the write of the cleaned table. */
  def substringDedup(s: SparkSession, dir: String): DataFrame =
    substringDedupCore(Tables.documents(s, dir))
      .transform(Common.presented(_, col("doc_id")))

  /** d20's bloom sizing: the sketch covers the duplicated-digest set at
    * ~1.2 MB per 10⁶ keys (ap3's arithmetic) — at 100 TB size it to the
    * measured dup-digest estimate; the RESULT is invariant to the
    * sizing (false positives only send extra rows to the exact join). */
  val DupOwnerBloomItems = 1L << 16
  val DupOwnerBloomFpp = 0.03

  /** d20's body over any (`doc_id`, `text`) frame — the unit the
    * planted-document spec drives.
    *
    * Owner-lookup strategy: the duplicated-digest first-owner set has
    * NO structural size bound (unlike d17's ≤|fp|/Cap over-cap set) —
    * Lee et al.-scale duplication makes it several % of all chunks, far
    * past any broadcast budget at 100 TB. So the DEFAULT path ships
    * only a few-KB Bloom sketch of the dup digests to every task
    * (ap3's dataflow: one map-side-merged aggregate row → driver → plan
    * constant), prunes the grid to probe-hits inside the scan, and
    * resolves the tiny survivor set against the exact owner table with
    * NO forced broadcast — AQE picks broadcast while the set is small
    * and degrades to a shuffled join when it is not, which is exactly
    * the fallback a forced hint forecloses. Bloom-miss rows are
    * DEFINITELY unique (no false negatives) and keep their chunk
    * without ever entering a join. `ownerBroadcast = true` keeps the
    * forced-broadcast form for the equality spec
    * (DedupGuaranteesSpec/ScaleSpec pin path-agreement and the pruning
    * contrast). */
  def substringDedupCore(docs: DataFrame,
      ownerBroadcast: Boolean = false): DataFrame = {
    val grid = docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), greatest(length(col("text")) - 1, lit(0)),
          lit(CleanChunk))).as("chunk_start"))
      .select(col("doc_id"), col("chunk_start"),
        expr(s"substring(text, chunk_start + 1, $CleanChunk)").as("content"))
      .withColumn("h", md5(col("content")))
    // read twice (owner aggregate + owner join) — multi-consumer rule
    CacheScope.persist(grid)
    // first owner per DUPLICATED digest only: unique chunks (the
    // overwhelming mass) never enter the join's build side
    val dupFirst = grid.groupBy(col("h"))
      .agg(count(lit(1)).as("nd"),
        min(struct(col("doc_id"), col("chunk_start"))).as("first"))
      .filter(col("nd") >= 2)
      .select(col("h"), col("first"))
    val kept = when(col("first").isNull ||
        (col("doc_id") === col("first.doc_id") &&
          col("chunk_start") === col("first.chunk_start")), 1L)
      .otherwise(0L)
    val outCols = Seq(col("doc_id"), col("chunk_start"), col("content"),
      length(col("content")).cast("long").as("cl"))
    val flagged =
      if (ownerBroadcast)
        grid.join(broadcast(dupFirst), Seq("h"), "left")
          .select(outCols :+ kept.as("kept"): _*)
      else
        dupOwnerLookup(grid, "h", dupFirst)
          .select(outCols :+ kept.as("kept"): _*)
    flagged
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("kept")).as("n_kept"),
        sum(col("cl")).as("orig_len"),
        sum(when(col("kept") === 1, col("cl")).otherwise(0L)).as("clean_len"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("kept") === 1,
            struct(col("chunk_start"), col("content"))))),
          x => x.getField("content")), "")).as("clean_md5"))
  }

  /** d20/d21's SHARED owner lookup — the bloom-or-AQE dup-owner
    * resolution both substring tiers route through (one definition, so
    * the probe shape cannot drift between the chunk grid and the
    * content-defined segments): a few-KB bloom sketch of the
    * duplicated keys ships to every task (ap3's dataflow: one
    * map-side-merged aggregate row → driver → plan constant) and
    * prunes `rows` in-scan — bloom-misses are PROVABLY unique (no
    * false negatives) and come back with a null `first` without ever
    * entering a join; probe-hits (true dups + fpp false positives)
    * resolve against the exact `dupFirst` table with NO forced
    * broadcast (AQE picks broadcast while the dup set is small and
    * degrades to a shuffled join when it is not). An EMPTY dup set
    * (null sketch) short-circuits to all-unique — every row keeps a
    * null owner instead of vanishing through a null probe. Returns
    * `rows` plus dupFirst's `first` struct column. */
  private[graft] def dupOwnerLookup(rows: DataFrame, keyName: String,
      dupFirst: DataFrame): DataFrame = {
    import graft.functions.{BloomBuildAgg, BloomMightContain}
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val firstType = dupFirst.schema("first").dataType
    val sketch = dupFirst.agg(column(
      BloomBuildAgg(expression(xxhash64(col(keyName))),
        DupOwnerBloomItems, DupOwnerBloomFpp)
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (sketch == null)
      return rows.withColumn("first", lit(null).cast(firstType))
    val probed = rows.withColumn("maybe_dup",
      column(BloomMightContain(expression(lit(sketch)),
        expression(xxhash64(col(keyName))))))
    probed.filter(col("maybe_dup"))
      .join(dupFirst, Seq(keyName), "left")
      .unionByName(probed.filter(!col("maybe_dup"))
        .withColumn("first", lit(null).cast(firstType)))
      .drop("maybe_dup")
  }

  /** d21's segmentation window: anchors from winnowing windows of
    * [[CutWinnowW]] grams over [[WinnowK]]-grams — expected segment
    * (w+1)/2 ≈ 4.5 grams, max gap w; any identical token run places
    * identical anchors once the run is longer than the window, so
    * segments inside a duplicated span match REGARDLESS of the span's
    * offset in each document (the property d20's fixed grid lacks). */
  val CutWinnowW = 8

  /** d21's cut threshold: a maximal run of consecutive duplicate
    * segments is excised only when it spans at least this many tokens —
    * short incidental repeats (a shared idiom that happens to be one
    * whole segment) survive; lifted passages do not. Lee et al. use a
    * 50-BPE-token span on web corpora; the harness corpus runs shorter
    * documents, same semantics. */
  val CutRunTokens = 15L

  /** D21 — ANY-ALIGNMENT substring dedup with corpus rewrite: the
    * alignment-free half of the Lee et al. ExactSubstr pair (d20 is
    * the grid-aligned approximation — a duplicated span shifted off
    * the 120-char grid is invisible to it). Documents are cut into
    * CONTENT-DEFINED segments at winnowing anchor positions
    * ([[graft.functions.WinnowAnchorPositions]] — rightmost-minimum
    * per window, the MOSS selector used as an rsync/LBFS-style
    * content-defined chunker): because anchors are chosen by content,
    * an identical token run ≥ the window span selects identical
    * interior anchors in every copy at ANY offset, so its interior
    * segments are bytewise identical across copies. Each segment's
    * digest is globally deduplicated exactly like d20's chunks (first
    * (doc_id, position) occurrence owns it); maximal runs of
    * consecutive duplicate segments ≥ [[CutRunTokens]] tokens are
    * excised (gaps-and-islands on the segment index) and the cleaned
    * document is reconstructed from the kept segments. Guarantee: a
    * duplicated span of L tokens loses at most ~2·([[CutWinnowW]] +
    * [[WinnowK]]) tokens of detection at its edges (anchor agreement
    * needs a full interior window), so every span with
    * L − 2(w+k) ≥ [[CutRunTokens]] is cut at every later copy —
    * DedupGuaranteesSpec plants an off-grid duplicate and checks the
    * excision live.
    *
    * 100 TB plan: segmentation is one compiled pass inside the scan
    * (anchors, then a bounded explode — segments ≈ 2/(w+1) of gram
    * count, ×1 total token volume); ownership is d20's shape verbatim
    * (map-side-partial digest aggregate, df≥2 survivors resolved
    * through the bloom-or-AQE owner join — the dup-segment set has no
    * structural bound, so no forced broadcast); the islands pass and
    * the reconstruction share ONE doc_id exchange, the rewrite's
    * irreducible cost. */
  def substringCut(s: SparkSession, dir: String): DataFrame =
    substringCutCore(Tables.documents(s, dir))
      .transform(Common.presented(_, col("doc_id")))

  /** d21's body over any (`doc_id`, `text`) frame. `ownerBloom = false`
    * keeps the exact-only owner join for DedupGuaranteesSpec's
    * path-agreement pin (d20's ownerBroadcast contrast, same contract:
    * the lookup strategy may only change the PLAN). */
  def substringCutCore(docs: DataFrame,
      ownerBloom: Boolean = true): DataFrame = {
    import graft.functions.ShingleExpressions.winnowAnchorPositions
    val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")))
      .withColumn("cs", array_sort(array_distinct(concat(
        array(lit(0)),
        winnowAnchorPositions(col("tk"), WinnowK, CutWinnowW),
        array(col("n"))))))
    // segment rows: the generator input is guarded (sequence(1, 0)
    // would COUNT DOWN); element_at stays in plain projections below
    // the Generate, never inside a lambda over a projected split
    val segs = base
      .select(col("doc_id"), col("tk"), col("cs"),
        explode(when(size(col("cs")) >= 2,
            sequence(lit(1), size(col("cs")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), col("i").as("seg_idx"),
        element_at(col("cs"), col("i")).as("s"),
        (element_at(col("cs"), col("i") + 1) - element_at(col("cs"), col("i")))
          .cast("long").as("slen"),
        array_join(slice(col("tk"), element_at(col("cs"), col("i")) + 1,
          element_at(col("cs"), col("i") + 1) - element_at(col("cs"), col("i"))),
          " ").as("seg_txt"))
      .withColumn("sh", md5(col("seg_txt")))
    // read twice (owner aggregate + owner join) — multi-consumer rule
    CacheScope.persist(segs)
    val dupFirst = segs.groupBy(col("sh"))
      .agg(count(lit(1)).as("nd"),
        min(struct(col("doc_id"), col("s"))).as("first"))
      .filter(col("nd") >= 2)
      .select(col("sh"), col("first"))
    // owner lookup: the DEFAULT is d20's shared bloom-or-AQE helper
    // (segment digests for chunk digests — the dup-segment set has no
    // structural bound, so the sketch prunes the grid in-scan and AQE
    // picks the survivor join's strategy)
    val flagged = (if (ownerBloom) dupOwnerLookup(segs, "sh", dupFirst)
      else segs.join(dupFirst, Seq("sh"), "left"))
      .withColumn("is_dup", when(col("first").isNotNull &&
          !(col("doc_id") === col("first.doc_id") &&
            col("s") === col("first.s")), 1L)
        .otherwise(0L))
    // gaps-and-islands on the segment index: one doc_id exchange
    // serves the run window, the run rollup and the reconstruction
    val grpW = Window.partitionBy(col("doc_id"), col("is_dup"))
      .orderBy(col("seg_idx"))
    val withGrp = flagged
      .withColumn("grp", col("seg_idx") - row_number().over(grpW))
    CacheScope.persist(withGrp) // run rollup + cut join both read it
    val runs = withGrp.filter(col("is_dup") === 1)
      .groupBy(col("doc_id"), col("grp"))
      .agg(sum(col("slen")).as("run_len"))
    val cutRows = withGrp.join(runs, Seq("doc_id", "grp"), "left")
      .withColumn("cut", when(col("is_dup") === 1 &&
          col("run_len") >= CutRunTokens, 1L).otherwise(0L))
    val perDoc = cutRows.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(col("is_dup")).as("n_dup"),
        sum(col("cut")).as("n_cut"),
        sum(col("slen")).as("orig_tokens"),
        sum(when(col("cut") === 0, col("slen")).otherwise(lit(0L)))
          .as("clean_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("cut") === 0,
            struct(col("seg_idx"), col("seg_txt"))))),
          x => x.getField("seg_txt")), " ")).as("clean_md5"))
    // zero-token documents produce no segments — carry them through
    // with the empty-reconstruction digest (both engines agree)
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_segs"), lit(0L)).as("n_segs"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        coalesce(col("orig_tokens"), lit(0L)).as("orig_tokens"),
        coalesce(col("clean_tokens"), lit(0L)).as("clean_tokens"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  // ---------------------------------------------------------------
  // The at-rest shingle index (d22/d23): the physical half of the
  // decontamination/leakage tier — the layout d12's docstring
  // promises ("the train shingle index is written once, bucketed by
  // hash"), made real with the ir15 discipline. d8/d12 prove the
  // probe ALGEBRA; d22 writes the hashed-shingle postings +
  // dictionary + per-doc stats to parquet bucketed by shingle hash
  // and serves the contamination probe partition-pruned from THE
  // FILES; d23 proves the index MAINTAINS under append (per-doc
  // postings append; the shingle-set dictionary grows by set union —
  // associative, so append == rebuild row-exactly) and serves the
  // split-leakage audit from the maintained dictionary.
  // ---------------------------------------------------------------

  /** Shingle-hash bucket count of the at-rest layout — 16, the
    * TermBuckets/FloatBuckets family constant: every bucket populated
    * at harness SFs; production sizes to target file size (pruning is
    * correct at any count). */
  val ShingleBuckets = 16

  /** The partition attribute: shingle hashes are already uniform
    * 60-bit md5-derived longs ([[graft.functions.TextFunctions]]
    * contract), so the bucket is a plain modulus — no second hash. */
  private[graft] def shingleBucketCol(h: Column): Column =
    pmod(h, lit(ShingleBuckets.toLong)).cast("int")

  /** Per-doc hashed-shingle postings (sh_bucket, h, doc_id) — rows are
    * distinct per doc by construction (hashedShingleSet returns the
    * SET), so postings counts ARE distinct-shingle counts. */
  private[graft] def shinglePostings(docs: DataFrame): DataFrame = {
    import graft.functions.ShingleExpressions.hashedShingleSet
    docs.select(col("doc_id"),
        explode(hashedShingleSet(tokens(col("text")), DecontamK)).as("h"))
      .withColumn("sh_bucket", shingleBucketCol(col("h")))
  }

  /** BUILD: write the index artifacts under `root` —
    *   - `postings/` — (h, doc_id) PARTITIONED BY sh_bucket: the
    *     per-doc facts a contamination probe partition-prunes into.
    *   - `shset/`  — the distinct shingle DICTIONARY, same layout:
    *     what a membership audit (d12's `tr`) joins against without
    *     re-distincting the postings.
    *   - `docstats/` — (doc_id, n_shingles): the per-doc totals, so a
    *     serve never touches text.
    * Dictionary and stats derive from the WRITTEN postings (one read
    * of the new files — ir15's no-second-corpus-pass rule). */
  /** The forgettable docstats layout's partition attribute (d31) —
    * ir22's bucketDoclen convention on this family: per-doc stats
    * partition by doc bucket so a forget request targets them
    * directly instead of rewriting a doc-count-bounded table. */
  private[graft] def docStatsBucketCol: Column =
    pmod(col("doc_id"), lit(16L)).cast("int")

  /** Build the shingle index. `bucketStats` picks the docstats
    * layout: `true` = the forgettable doc-bucketed layout (d31),
    * `false` = the legacy flat layout (d22/d23, append-only). No
    * default — a caller states the layout, and must pass the SAME
    * choice to [[forgetShingleIndex]]'s `bucketedStats` (the r17
    * ADVICE foot-gun: asymmetric defaults let a default-paired
    * build/forget target a partition column the layout lacks). */
  private[graft] def writeShingleIndex(s: SparkSession, root: String,
      docs: DataFrame, bucketStats: Boolean): Unit = {
    shinglePostings(docs)
      .write.mode("overwrite").partitionBy("sh_bucket")
      .parquet(s"$root/postings")
    val p = s.read.parquet(s"$root/postings")
    p.select(col("sh_bucket"), col("h")).distinct()
      .write.mode("overwrite").partitionBy("sh_bucket")
      .parquet(s"$root/shset")
    val stats = p.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    if (bucketStats)
      stats.withColumn("ds_bucket", docStatsBucketCol)
        .write.mode("overwrite").partitionBy("ds_bucket")
        .parquet(s"$root/docstats")
    else
      stats.write.mode("overwrite").parquet(s"$root/docstats")
  }

  /** APPEND: fold a fresh batch into the standing index — exactly-once
    * under retry (ir16's discipline: every new-row frame anti-joins
    * the standing artifact it appends to, pinned as an EAGER
    * localCheckpoint because its plan reads the very path the write
    * appends to — a cached/re-listed plan would anti-join itself out).
    * Postings and stats are per-doc facts (standing rows untouched);
    * the dictionary grows by SET UNION — only hashes new to the index
    * land, which is exactly why append == rebuild row-for-row on all
    * three artifacts (DedupAtRestSpec pins it). Per-doc stats recount
    * from the batch's own complete postings (computed from text), so
    * a crash that landed partial postings without the stats row heals
    * on rerun: the missing postings land via the anti-join, and the
    * stats row lands with the full count. */
  private[graft] def appendShingleIndex(s: SparkSession, root: String,
      batch: DataFrame): Unit = {
    val full = shinglePostings(batch)
    // three consumers: postings anti-join, dictionary delta, stats
    CacheScope.persist(full)
    full
      .join(s.read.parquet(s"$root/postings")
          .select(col("h"), col("doc_id")),
        Seq("h", "doc_id"), "left_anti")
      // the anti-join moved its keys to the front — restore the build
      // write's column order, or the directory holds files with TWO
      // field orders and the read-back schema (hence every positional
      // comparison) becomes which-file-infers-first nondeterministic
      .select(col("doc_id"), col("h"), col("sh_bucket"))
      .localCheckpoint()
      .write.mode("append").partitionBy("sh_bucket")
      .parquet(s"$root/postings")
    full.select(col("sh_bucket"), col("h")).distinct()
      .join(s.read.parquet(s"$root/shset").select(col("h")),
        Seq("h"), "left_anti")
      .localCheckpoint()
      .write.mode("append").partitionBy("sh_bucket")
      .parquet(s"$root/shset")
    full.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(s.read.parquet(s"$root/docstats").select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
      .write.mode("append").parquet(s"$root/docstats")
  }

  /** FORGET from the shingle index (d31) — ir22's request-content
    * shape on d22's layout: the deleted docs' shingles recompute
    * through the build's own tree ([[shinglePostings]] — targeting and
    * layout can never disagree), their postings rows sweep from
    * exactly those hash buckets, and the DICTIONARY is SUBTRACTIVE —
    * a hash whose last posting vanished must leave `shset`, so the
    * touched buckets' dictionary recounts from the swept postings
    * (the ir22 blockmeta discipline; an additive dictionary would
    * keep d12's membership audit flagging content that no longer
    * exists). `docstats` in the forgettable layout is DOC-BUCKETED
    * (ir22's bucketDoclen convention), so the request's ids target it
    * directly — request-sized IO, where the d22/d23 in-place layout
    * would rewrite a doc-count-bounded table; `bucketedStats = false`
    * keeps the anti-join rewrite for that legacy layout. Idempotent:
    * a rerun re-derives the same targets and re-stages the same
    * survivors. */
  private[graft] def forgetShingleIndex(s: SparkSession, root: String,
      deleted: DataFrame, bucketedStats: Boolean): Unit = {
    val delP = shinglePostings(deleted)
      .select(col("doc_id"), col("sh_bucket")).distinct()
      .localCheckpoint()
    val ids = delP.select(col("doc_id")).distinct().localCheckpoint()
    val tBuckets = delP.select(col("sh_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (tBuckets.nonEmpty) {
      AtRest.sweepBuckets(s, s"$root/postings", "sh_bucket", tBuckets,
        ids, Seq("doc_id"))
      AtRest.overwriteBuckets(s, s"$root/shset", "sh_bucket", tBuckets,
        s.read.parquet(s"$root/postings")
          .filter(col("sh_bucket").isin(tBuckets: _*))
          .select(col("sh_bucket"), col("h")).distinct())
    }
    if (bucketedStats) {
      val dBuckets = ids.select(docStatsBucketCol.as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      AtRest.sweepBuckets(s, s"$root/docstats", "ds_bucket", dBuckets,
        ids, Seq("doc_id"))
      ()
    } else {
      s.read.parquet(s"$root/docstats")
        .join(broadcast(ids), Seq("doc_id"), "left_anti")
        .localCheckpoint()
        .write.mode("overwrite").parquet(s"$root/docstats")
    }
  }

  /** D31 — FORGET EXECUTED AGAINST THE AT-REST SHINGLE INDEX: build
    * the train-corpus index (d22's layout), EXECUTE the c4/c6 delete
    * cohort ([[forgetShingleIndex]] — targets from the request's own
    * shingles, subtractive dictionary), and serve d22's contamination
    * probe from what remains. The oracle is d8's SQL with the cohort
    * subtracted from the TRAIN side only (the eval probe is not a
    * release, it is the question), so the files must hold exactly the
    * survivor postings, the survivor dictionary and the survivor
    * stats.
    *
    * 100 TB plan: a forget's IO is the deleted docs' shingle-hash
    * buckets plus their doc-stat buckets (the forgettable layout
    * doc-buckets the stats — ir22's bucketDoclen convention) —
    * request-content-bounded end to end; the probe's serve stays
    * DPP-pruned to probe buckets. */
  def decontamForget(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions.hashedShingleSet
    val root = SimilarityOps.indexRoot(s, dir) + "/shindex31"
    val docs = Tables.documents(s, dir)
    val train = docs.filter(col("doc_id") % EvalMod =!= 0)
    writeShingleIndex(s, root, train, bucketStats = true)
    forgetShingleIndex(s, root, train.filter(
      col("doc_id") % TextOps.ForgetMod === TextOps.ForgetRem),
      bucketedStats = true)
    val probe = docs.filter(col("doc_id") % EvalMod === 0)
      .select(explode(hashedShingleSet(tokens(col("text")), DecontamK))
        .as("p_h"))
      .distinct()
      .withColumn("p_bucket", shingleBucketCol(col("p_h")))
    serveDecontamFrom(s, root, probe)
      .transform(Common.presented(_, col("doc_id")))
  }

  /** The partition-pruned contamination serve: the (tiny, broadcast)
    * probe set joins the at-rest postings ON THE BARE sh_bucket
    * partition attribute + the hash, so dynamic partition pruning
    * reads only the buckets holding probe hashes (x17's
    * compactionStage shape — PlanContractSpec pins the dynamicpruning
    * filter); per-doc totals come from `docstats`, so NO text and no
    * non-probed bucket is ever touched. */
  private[graft] def serveDecontamFrom(s: SparkSession, root: String,
      probe: DataFrame): DataFrame = {
    val hits = s.read.parquet(s"$root/postings")
      .join(broadcast(probe),
        col("sh_bucket") === col("p_bucket") && col("h") === col("p_h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hit_cnt"))
    s.read.parquet(s"$root/docstats")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("hit_cnt"), lit(0L)).as("n_overlap"))
      .withColumn("is_contaminated",
        when(col("n_overlap") > 0, 1).otherwise(0))
  }

  /** D22 — EVAL DECONTAMINATION FROM THE AT-REST INDEX: d8's probe
    * served from the written shingle index. BUILD writes the non-eval
    * corpus's postings/dictionary/stats ([[writeShingleIndex]]); the
    * eval set's distinct hashed shingles form the probe (tiny by
    * construction — d8's broadcast bound), and the serve reads ONLY
    * the probe's bucket partitions plus the slim stats table — output
    * BIT-IDENTICAL to d8's text-side scan (the oracle is d8's SQL
    * verbatim, the ir15 path-substitution convention).
    *
    * 100 TB plan: the corpus's shingle explode is paid ONCE at build
    * (amortized across every eval release), a probe reads ≤
    * |probe-hash buckets| of [[ShingleBuckets]] directories via DPP,
    * and the per-doc verdict join moves (doc_id, count) pairs only. */
  def decontamAtRest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions.hashedShingleSet
    val root = SimilarityOps.indexRoot(s, dir) + "/shindex22"
    val docs = Tables.documents(s, dir)
    writeShingleIndex(s, root, docs.filter(col("doc_id") % EvalMod =!= 0),
      bucketStats = false)
    val probe = docs.filter(col("doc_id") % EvalMod === 0)
      .select(explode(hashedShingleSet(tokens(col("text")), DecontamK))
        .as("p_h"))
      .distinct()
      .withColumn("p_bucket", shingleBucketCol(col("p_h")))
    serveDecontamFrom(s, root, probe)
      .transform(Common.presented(_, col("doc_id")))
  }

  /** D23 — SPLIT-LEAKAGE AUDIT FROM THE MAINTAINED INDEX: the train
    * side of d10's split builds the standing index (doc_id % 5 ≠ 0),
    * the rest of train FOLDS IN through [[appendShingleIndex]]
    * (set-union dictionary growth — associative, so append == rebuild
    * row-exactly on all three artifacts, DedupAtRestSpec pins it),
    * and d12's audit runs with its train-shingle reference side
    * replaced by the AT-REST dictionary — the val/test proposal's
    * shingles join `shset/` instead of re-distincting 80% of the
    * corpus. Output BIT-IDENTICAL to d12 (oracle verbatim).
    *
    * 100 TB plan: the standing train corpus is NEVER re-shingled per
    * audit — each new split proposal explodes only its own docs and
    * joins the written dictionary (AQE-splittable equi-join on h; the
    * full-audit probe touches every bucket, a batch-sized proposal
    * prunes to its hashes' buckets — d22's serve shape). */
  def leakageAtRest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions.hashedShingleSet
    val root = SimilarityOps.indexRoot(s, dir) + "/shindex23"
    val docs = Tables.documents(s, dir)
    val tagged = docs.withColumn("split", splitCol)
    CacheScope.persist(tagged) // three consumers: build, append, probe
    val train = tagged.filter(col("split") === "train")
    writeShingleIndex(s, root,
      train.filter(col("doc_id") % IncomingMod =!= 0), bucketStats = false)
    appendShingleIndex(s, root,
      train.filter(col("doc_id") % IncomingMod === 0))
    tagged.filter(col("split") =!= "train")
      .select(col("doc_id"), col("split"),
        explode(hashedShingleSet(tokens(col("text")), DecontamK)).as("h"))
      .join(s.read.parquet(s"$root/shset")
          .select(col("h"), lit(1).as("in_train")),
        Seq("h"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("in_train"), lit(0))).as("n_train_overlap"))
      .withColumn("is_leaky",
        when(col("n_train_overlap") > 0, 1).otherwise(0))
      .transform(Common.presented(_, col("doc_id")))
  }

  // ---------------------------------------------------------------
  // The at-rest winnowing index (d26/d27): the physical half of the
  // local-overlap tier — the persisted-table layout d18's docstring
  // names ("at 100 TB this is a persisted table bucketed on h") and
  // d19's maintenance notes assume, made real. Three artifacts, all
  // PARTITIONED BY the fingerprint-hash bucket:
  //   - wfp/  — the FULL (uncapped) winnowed fingerprints: per-doc
  //     facts, the base of record every heal recounts from.
  //   - wdf/  — (h, nd) document frequency INCLUDING over-cap hashes
  //     (d19's rule: without the true running DF an evicted hash's
  //     count restarts at zero and boilerplate sneaks back in).
  //   - kept/ — the capped SERVING table d18's probe reads.
  // The append is the d19 algebra at the file level: per-doc facts
  // append (exactly-once anti-join), DF merges by addition, and a
  // hash CROSSING the cap evicts by rewriting ONLY the buckets
  // holding crossing hashes (pruned read + dynamic partition
  // overwrite — x17's discipline; every other bucket's files survive
  // byte-identical, DedupAtRestSpec pins paths+sizes+mtimes).
  // ---------------------------------------------------------------

  /** Fingerprint-bucket count of the at-rest winnowing layout — 16,
    * the family constant. */
  val WinnowBuckets = 16

  private[graft] def winnowBucketCol(h: Column): Column =
    pmod(h, lit(WinnowBuckets.toLong)).cast("int")

  private def bucketedWfp(docs: DataFrame): DataFrame =
    winnowedFingerprints(docs)
      .withColumn("h_bucket", winnowBucketCol(col("h")))

  /** BUILD: write all three artifacts; stats and the capped serving
    * table derive from the WRITTEN base (one read of the new files —
    * ir15's no-second-corpus-pass rule). */
  private[graft] def writeWinnowIndex(s: SparkSession, root: String,
      docs: DataFrame): Unit = {
    bucketedWfp(docs)
      .write.mode("overwrite").partitionBy("h_bucket")
      .parquet(s"$root/wfp")
    val w = s.read.parquet(s"$root/wfp")
    w.groupBy(col("h_bucket"), col("h")).agg(count(lit(1)).as("nd"))
      .write.mode("overwrite").partitionBy("h_bucket")
      .parquet(s"$root/wdf")
    val over = s.read.parquet(s"$root/wdf")
      .filter(col("nd") > WinnowCap).select(col("h"))
    w.join(broadcast(over), Seq("h"), "left_anti")
      .select(col("doc_id"), col("h"), col("h_bucket"))
      .write.mode("overwrite").partitionBy("h_bucket")
      .parquet(s"$root/kept")
  }

  /** APPEND: d19's merge made physical —
    *   1. the batch's fingerprints land in `wfp` behind the (h,
    *      doc_id) anti-join exactly-once guard (eager localCheckpoint
    *      — the refreshByPath trap — and canonical column order, the
    *      d23 mixed-schema lesson);
    *   2. `wdf` merges by integer addition from the LANDED delta,
    *      BUCKET-SCOPED — only the delta's hash buckets are read and
    *      replaced, because wdf grows with the corpus while the delta
    *      is batch-sized (ir16's convention otherwise: a torn append
    *      leaves stats stale, never wrong — [[healWinnowIndex]]
    *      recounts from the base);
    *   3. hashes whose merged DF CROSSED [[WinnowCap]] in THIS batch
    *      (over-cap in the merged stats, anti-joined against the
    *      pre-merge over-cap set — hashes an earlier append already
    *      evicted drive no rewrite, so byte churn tracks the batch's
    *      boilerplate, not the accumulated total) EVICT: only the
    *      crossing hashes' buckets are read (static bucket list — the
    *      crossing set is ≤ |fp|/Cap, its bucket list is O(16) driver
    *      metadata), anti-joined against the FULL over-cap set (so a
    *      rewritten bucket also sheds any stragglers a torn earlier
    *      eviction left behind), pinned eagerly and written back with
    *      dynamic partition overwrite — buckets without a crossing
    *      hash are never rewritten, and a bucket whose every kept row
    *      crossed (dynamic overwrite writes NOTHING for an empty
    *      partition) has its stale directory dropped explicitly;
    *   4. the batch's under-cap rows append to `kept`.
    * Append == rebuild row-exactly on all three artifacts (the d19
    * bit-equality at the file level; a retried append is a no-op on
    * every artifact — DedupAtRestSpec pins both). */
  private[graft] def appendWinnowIndex(s: SparkSession, root: String,
      batch: DataFrame): Unit = {
    val bfp = bucketedWfp(batch)
    CacheScope.persist(bfp) // anti-join + stats delta consumers
    val newRows = bfp
      .join(s.read.parquet(s"$root/wfp").select(col("h"), col("doc_id")),
        Seq("h", "doc_id"), "left_anti")
      .select(col("doc_id"), col("h"), col("h_bucket"))
      .localCheckpoint()
    newRows.write.mode("append").partitionBy("h_bucket")
      .parquet(s"$root/wfp")
    // the PRE-merge over-cap set, pinned before the stats overwrite:
    // hashes an earlier append already evicted — this batch's
    // eviction rewrite must be driven by the CROSSING delta, not by
    // every bucket that ever held boilerplate
    val preOver = s.read.parquet(s"$root/wdf")
      .filter(col("nd") > WinnowCap).select(col("h"))
      .localCheckpoint()
    // the DF merge is BUCKET-SCOPED (round 16): wdf holds one row per
    // distinct fingerprint hash — corpus-sized — while the delta only
    // touches the batch's hash buckets, so only THOSE buckets are
    // read, merged by addition and replaced via dynamic partition
    // overwrite (a merged bucket is never empty: the delta
    // contributed to it — no directory-drop guard needed)
    val deltaDf = newRows.groupBy(col("h_bucket"), col("h"))
      .agg(count(lit(1)).as("nd")).localCheckpoint()
    val dfBuckets = deltaDf.select(col("h_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (dfBuckets.nonEmpty) {
      AtRest.overwriteBuckets(s, s"$root/wdf", "h_bucket", dfBuckets,
        s.read.parquet(s"$root/wdf")
          .filter(col("h_bucket").isin(dfBuckets: _*))
          .unionByName(deltaDf)
          .groupBy(col("h_bucket"), col("h"))
          .agg(sum(col("nd")).as("nd")))
    }
    // the merged over-cap set: tiny by the |fp|/Cap bound — its rows
    // broadcast into the eviction anti-join and the append filter
    val over = s.read.parquet(s"$root/wdf")
      .filter(col("nd") > WinnowCap).select(col("h"), col("h_bucket"))
      .localCheckpoint()
    val evictBuckets = over.join(preOver, Seq("h"), "left_anti")
      .select(col("h_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    // x17's partition-drop edge, made REAL by boilerplate eviction: a
    // bucket whose every kept row was a crossing hash stages ZERO
    // survivors — the shared verb drops exactly those directories
    AtRest.sweepBuckets(s, s"$root/kept", "h_bucket", evictBuckets,
      over.select(col("h")), Seq("h"))
    newRows
      .join(broadcast(over.select(col("h"))), Seq("h"), "left_anti")
      .select(col("doc_id"), col("h"), col("h_bucket"))
      .write.mode("append").partitionBy("h_bucket")
      .parquet(s"$root/kept")
  }

  /** Crash recovery: stats and the serving table RECOUNT from the
    * at-rest base (wfp → wdf → kept) — the ir16/x19 heal-by-recount
    * discipline. A crash between the base append and the downstream
    * writes leaves them stale, never wrong; rerunning the append (a
    * row-level no-op) then this heal restores the exact rebuilt
    * state. */
  private[graft] def healWinnowIndex(s: SparkSession, root: String): Unit = {
    val w = s.read.parquet(s"$root/wfp")
    AtRest.healDerived(s, s"$root/wdf",
      w.groupBy(col("h_bucket"), col("h")).agg(count(lit(1)).as("nd")),
      Seq("h_bucket"))
    val over = s.read.parquet(s"$root/wdf")
      .filter(col("nd") > WinnowCap).select(col("h"))
    AtRest.healDerived(s, s"$root/kept",
      w.join(broadcast(over), Seq("h"), "left_anti")
        .select(col("doc_id"), col("h"), col("h_bucket")),
      Seq("h_bucket"))
  }

  /** d26's probe core: d18's verdict with the index side replaced by
    * the DPP-pruned at-rest serving table — the batch's fingerprint
    * hashes broadcast onto the BARE h_bucket partition attribute, so
    * only the probe's buckets are read (PlanContractSpec pins the
    * dynamicpruning filter); the verdict tail is
    * [[winnowVerdictCore]], the same tree as the in-memory probe. */
  private[graft] def winnowProbeAgainst(s: SparkSession, root: String,
      incoming: DataFrame, cacheBatch: Boolean = true): DataFrame = {
    val bfp = winnowedFingerprints(incoming)
    if (cacheBatch) { CacheScope.persist(bfp); () }
    val probe = bfp
      .select(col("doc_id").as("p_doc"), col("h").as("p_h"))
      .withColumn("p_bucket", winnowBucketCol(col("p_h")))
      // load-bearing selective predicate (x17's lesson): the probe
      // descends from a persisted frame, so without a visible filter
      // the PartitionPruning rule never inserts the pruning subquery
      .filter(col("p_bucket") >= 0)
    val hits = s.read.parquet(s"$root/kept")
      .join(broadcast(probe),
        col("h_bucket") === col("p_bucket") && col("h") === col("p_h"))
      .select(col("p_doc").as("doc_id"), col("doc_id").as("match_doc"))
      .groupBy(col("doc_id"), col("match_doc"))
      .agg(count(lit(1)).as("n_shared"))
    winnowVerdictCore(incoming, bfp, hits)
  }

  /** D26 — WINNOWING PROBE FROM THE AT-REST INDEX: d18's re-crawl
    * verdict served from the written serving table. BUILD writes the
    * corpus's three artifacts ([[writeWinnowIndex]] — fingerprinting
    * paid once at ingest); the incoming batch winnows in-scan and
    * probes the capped table partition-pruned to its own hashes'
    * buckets. Output BIT-IDENTICAL to d18 (oracle verbatim, the ir15
    * path-substitution convention).
    *
    * 100 TB plan: a batch probe reads ≤ |batch-hash buckets| of
    * [[WinnowBuckets]] directories of the slim (doc_id, h) table —
    * corpus-size-independent serve IO; the corpus is never
    * re-fingerprinted per probe. */
  def winnowProbeAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/winidx26"
    val docs = Tables.documents(s, dir)
    writeWinnowIndex(s, root,
      docs.filter(col("doc_id") % IncomingMod =!= 0))
    winnowProbeAgainst(s, root, docs.filter(col("doc_id") % IncomingMod === 0))
      .transform(Common.presented(_, col("doc_id")))
  }

  /** FORGET from the winnowing index (d32) — the request-content
    * shape on the d26/d27 layout, with the family's own wrinkle: the
    * CAP RE-CHECK. Deleting documents can drop an over-cap
    * (boilerplate-evicted) hash back under [[WinnowCap]] — eviction
    * in REVERSE — so the touched buckets' `kept` rows don't just
    * sweep, they REBUILD from the swept base against the recounted
    * DF: rows an earlier eviction removed re-admit when their hash's
    * survivor count clears the cap. Targeting is complete by
    * construction: a hash's nd only changes if a deleted doc carried
    * it, and that hash's bucket is then one of the request's own
    * fingerprint buckets. Stages:
    *  1. `wfp` (base of record) sweeps the deleted docs' rows;
    *  2. `wdf` recounts bucket-scoped from the swept base (the ir22
    *     subtractive-metadata discipline — a += decrement would
    *     double-subtract on retry);
    *  3. `kept` rebuilds bucket-scoped: survivors of the bucket minus
    *     the still-over-cap hashes.
    * Idempotent: a rerun re-derives the same targets, sweeps nothing
    * and recounts to the same state; a crash between stages leaves
    * wdf/kept stale-not-wrong ([[healWinnowIndex]]'s recount is the
    * documented recovery, d27's own contract). */
  private[graft] def forgetWinnowIndex(s: SparkSession, root: String,
      deleted: DataFrame): Unit = {
    val dfp = bucketedWfp(deleted)
      .select(col("doc_id"), col("h_bucket")).distinct()
      .localCheckpoint()
    val ids = dfp.select(col("doc_id")).distinct().localCheckpoint()
    val tBuckets = dfp.select(col("h_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (tBuckets.isEmpty) return
    AtRest.sweepBuckets(s, s"$root/wfp", "h_bucket", tBuckets,
      ids, Seq("doc_id"))
    AtRest.overwriteBuckets(s, s"$root/wdf", "h_bucket", tBuckets,
      s.read.parquet(s"$root/wfp")
        .filter(col("h_bucket").isin(tBuckets: _*))
        .groupBy(col("h_bucket"), col("h"))
        .agg(count(lit(1)).as("nd")))
    AtRest.overwriteBuckets(s, s"$root/kept", "h_bucket", tBuckets,
      s.read.parquet(s"$root/wfp")
        .filter(col("h_bucket").isin(tBuckets: _*))
        .join(broadcast(s.read.parquet(s"$root/wdf")
            .filter(col("h_bucket").isin(tBuckets: _*))
            .filter(col("nd") > WinnowCap).select(col("h"))),
          Seq("h"), "left_anti")
        .select(col("doc_id"), col("h"), col("h_bucket")))
  }

  /** D32 — FORGET EXECUTED AGAINST THE AT-REST WINNOWING INDEX: build
    * all three artifacts over the full corpus, EXECUTE the c4/c6
    * delete cohort ([[forgetWinnowIndex]] — base sweep, subtractive
    * DF recount, and the cap RE-CHECK that re-admits hashes the
    * cohort's deletion dropped back under [[WinnowCap]]), and emit
    * the maintained serving table. The oracle recomputes d19's kept
    * dump over the SURVIVORS — over-cap derived from survivor counts
    * — so the files must hold exactly the rebuild's rows, re-admitted
    * boilerplate and all.
    *
    * 100 TB plan: a forget touches the request's fingerprint buckets
    * of all three artifacts — request-content-bounded IO; no other
    * bucket is listed, and the re-admission needs no side state (the
    * uncapped base is the record). */
  def winnowForget(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/winidx32"
    val docs = Tables.documents(s, dir)
    writeWinnowIndex(s, root, docs)
    forgetWinnowIndex(s, root, docs.filter(
      col("doc_id") % TextOps.ForgetMod === TextOps.ForgetRem))
    s.read.parquet(s"$root/kept")
      .select(col("doc_id"), col("h"))
      .transform(Common.presented(_, col("doc_id"), col("h")))
  }

  /** D27 — WINNOWING INDEX APPEND AT REST: d19's maintenance made
    * physical. The standing corpus builds the three artifacts, the
    * incoming batch folds in through [[appendWinnowIndex]] — base
    * rows append exactly-once, DF merges by addition, cap-crossing
    * hashes evict by rewriting ONLY their buckets — and the
    * registered output is the maintained serving table itself, which
    * must equal the full-rebuild kept set bit-exactly (d19's
    * append == rebuild invariant; the oracle is d19's SQL verbatim).
    *
    * 100 TB plan: nightly maintenance touches the batch's buckets
    * plus the (tiny, |fp|/Cap-bounded) crossing hashes' buckets;
    * standing cold buckets are never listed, read, or rewritten —
    * the eviction cost tracks boilerplate churn, not index size. */
  def winnowAppendAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/winidx27"
    val docs = Tables.documents(s, dir)
    writeWinnowIndex(s, root,
      docs.filter(col("doc_id") % IncomingMod =!= 0))
    appendWinnowIndex(s, root,
      docs.filter(col("doc_id") % IncomingMod === 0))
    s.read.parquet(s"$root/kept")
      .select(col("doc_id"), col("h"))
      .transform(Common.presented(_, col("doc_id"), col("h")))
  }

  // ---------------------------------------------------------------
  // The at-rest MinHash band index (d24/d25): the physical half of
  // the near-dup serving tier. d2 proves the band/verify ALGEBRA and
  // d15 the incremental probe; d24 writes the band-bucketed signature
  // index AND the id-bucketed shingle-set table to parquet and serves
  // d2's full pair audit from THE FILES (signatures computed once at
  // ingest, never re-derived per audit); d25 maintains the index
  // under append (per-doc facts — append == rebuild row-exact) and
  // probes an incoming batch against the FROZEN bands with both reads
  // dynamic-partition-pruned (the x30 fetch discipline applied to
  // near-dup): candidates from the probe's band buckets, verify sets
  // from the candidates' id buckets.
  // ---------------------------------------------------------------

  /** Band-bucket / id-bucket counts of the at-rest near-dup layout —
    * 16, the family constant. */
  val BandBuckets = 16
  val IdBuckets = 16

  /** The band partition attribute: band signatures are uniform
    * products of minhashes, so a plain modulus spreads them; the band
    * ordinal folds in so the 4 band sub-indexes interleave. */
  private[graft] def bandBucketCol(band: Column, sig: Column): Column =
    pmod(band + sig, lit(BandBuckets.toLong)).cast("int")

  private def idBucketCol(id: Column): Column =
    pmod(id, lit(IdBuckets.toLong)).cast("int")

  /** Sorted distinct hashed-shingle sets — d2's verify-side frame. */
  private def docShingleSets(docs: DataFrame): DataFrame = {
    import graft.functions.ShingleExpressions.hashedShingleSet
    docs.select(col("doc_id"), hashedShingleSet(tokens(col("text")), 2).as("bg"))
  }

  /** (doc_id, band, sig, band_bucket) — d2's band signature rows over
    * any (doc_id, bg) frame. */
  private def bandRows(hsets: DataFrame): DataFrame = {
    import graft.functions.ShingleExpressions.minhashSig
    hsets.select(col("doc_id"), minhashSig(col("bg"), MinHashAB).as("mh"))
      .select(col("doc_id"), posexplode(array((0 until Bands).map(bnd =>
        element_at(col("mh"), 2 * bnd + 1) * HashMod +
          element_at(col("mh"), 2 * bnd + 2)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")
      .withColumn("band_bucket", bandBucketCol(col("band"), col("sig")))
  }

  /** BUILD: write the near-dup index under `root` —
    *   - `bands/` — (doc_id, band, sig) PARTITIONED BY band_bucket:
    *     the LSH candidate index a probe partition-prunes into.
    *   - `docsets/` — (doc_id, bg) PARTITIONED BY id_bucket: the
    *     sorted shingle sets the exact-Jaccard verify fetches by id
    *     (x30's id-bucketed float-table layout, applied to sets) —
    *     candidates verify WITHOUT re-shingling any text. */
  private[graft] def writeBandIndex(s: SparkSession, root: String,
      docs: DataFrame): Unit = {
    val hsets = docShingleSets(docs)
    CacheScope.persist(hsets) // feeds both artifacts
    // the two artifacts derive from the same persisted sets and land in
    // disjoint tables — overlap the writes (guide §2.6; concurrent
    // first-materialization of a cached frame is block-locked by the
    // BlockManager, so the shingle pass still runs once)
    AtRest.inParallel(
      () => hsets.select(col("doc_id"), col("bg"),
          idBucketCol(col("doc_id")).as("id_bucket"))
        .write.mode("overwrite").partitionBy("id_bucket")
        .parquet(s"$root/docsets"),
      () => bandRows(hsets)
        .write.mode("overwrite").partitionBy("band_bucket")
        .parquet(s"$root/bands"))
  }

  /** APPEND: per-doc facts only — no merge step at all (the band rows
    * and shingle sets of standing docs never change), so append ==
    * rebuild row-for-row by construction. Exactly-once via the ir16
    * anti-join + eager-checkpoint discipline, with the column order
    * restored after each anti-join (the d23 mixed-file-schema
    * lesson). */
  private[graft] def appendBandIndex(s: SparkSession, root: String,
      batch: DataFrame): Unit = {
    val hsets = docShingleSets(batch)
    CacheScope.persist(hsets) // feeds both appends
    hsets.select(col("doc_id"), col("bg"),
        idBucketCol(col("doc_id")).as("id_bucket"))
      .join(s.read.parquet(s"$root/docsets").select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("bg"), col("id_bucket"))
      .localCheckpoint()
      .write.mode("append").partitionBy("id_bucket")
      .parquet(s"$root/docsets")
    bandRows(hsets)
      .join(s.read.parquet(s"$root/bands")
          .select(col("doc_id"), col("band")),
        Seq("doc_id", "band"), "left_anti")
      .select(col("doc_id"), col("band"), col("sig"), col("band_bucket"))
      .localCheckpoint()
      .write.mode("append").partitionBy("band_bucket")
      .parquet(s"$root/bands")
  }

  /** The docsets read with the layout contract RE-ASSERTED: parquet
    * read-back defaults every array to nullable elements, but the
    * written sets come from [[graft.functions.HashedShingleSet]]
    * (containsNull = false) and the compiled sorted-merge verify
    * rightly REJECTS nullable elements rather than miscounting them —
    * so the reader declares the type the writer guaranteed. */
  private def readDocsets(s: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.types._
    s.read.schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("bg", ArrayType(LongType, containsNull = false)),
        StructField("id_bucket", IntegerType))))
      .parquet(s"$root/docsets")
  }

  /** The d2 verify + flag tree over candidate pairs and two
    * (id → bg) sides — ONE definition for the scan path and both
    * at-rest serves. */
  private def verifyPairs(cand: DataFrame, left: DataFrame,
      right: DataFrame): DataFrame = {
    import graft.functions.ShingleExpressions.sortedIntersectCount
    val inter = sortedIntersectCount(col("ba.bg"), col("bb.bg")).cast("long")
    val uni = (size(col("ba.bg")) + size(col("bb.bg"))).cast("long") - inter
    cand.join(left.as("ba"), col("a") === col("ba.doc_id"))
      .join(right.as("bb"), col("b") === col("bb.doc_id"))
      .select(col("a"), col("b"),
        inter.as("inter_cnt"), uni.as("union_cnt"),
        when(inter * JaccardNum >= uni, 1).otherwise(0).as("is_near_dup"))
  }

  /** D24 — NEAR-DUP PAIR AUDIT FROM THE AT-REST INDEX: d2's full
    * candidate-pair output served from the written band index. BUILD
    * writes signatures + shingle sets ONCE ([[writeBandIndex]] — the
    * ingest-time cost every audit amortizes); the SERVE self-joins the
    * at-rest band rows on (band, sig), dedups candidate pairs, and
    * verifies with the exact sorted-merge Jaccard over sets FETCHED
    * from the id-bucketed docsets table — no text is shingled at
    * audit time. Output BIT-IDENTICAL to d2 (oracle verbatim, the
    * ir15 path-substitution convention).
    *
    * 100 TB plan: the recurring audit cost drops from
    * corpus-shingle+minhash (d2's measured hot path) to a slim
    * (doc_id, band, sig) self-join bounded by band-bucket occupancy
    * plus a per-candidate set fetch; the band self-join co-partitions
    * on the written bucket layout. */
  def bandPairsAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/bandidx24"
    writeBandIndex(s, root, Tables.documents(s, dir))
    bandPairsFrom(s, root)
      .transform(Common.presented(_, col("a"), col("b")))
  }

  /** d24's serve core over any written band-index root — the full
    * verified pair audit from the files, shared by d24 and d29's
    * cluster build (ONE pair rule, so the maintained clusters cannot
    * drift from the audit's edges). */
  private[graft] def bandPairsFrom(s: SparkSession, root: String): DataFrame = {
    val bands = s.read.parquet(s"$root/bands")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val ds = readDocsets(s, root).select(col("doc_id"), col("bg"))
    verifyPairs(cand, ds, ds)
  }

  /** D25 — INCREMENTAL NEAR-DUP PROBE AGAINST THE FROZEN AT-REST
    * BANDS: d15's re-crawl verdict with the corpus side replaced by
    * the MAINTAINED index. The standing corpus's index builds in two
    * steps (build + [[appendBandIndex]] — append == rebuild row-exact,
    * DedupAtRestSpec pins it); the incoming batch computes its own
    * signatures (live input) and probes the at-rest bands with the
    * broadcast probe joined ON THE BARE band_bucket partition
    * attribute → dynamic partition pruning reads only the probe's
    * band buckets; the exact-Jaccard verify then fetches ONLY the
    * candidates' shingle sets from docsets, DPP-pruned by id bucket
    * (x30's two-stage fetch shape — PlanContractSpec pins both
    * dynamicpruning filters). Output BIT-IDENTICAL to d15 (oracle
    * verbatim).
    *
    * 100 TB plan: a batch probe reads ≤ |batch × bands| buckets of
    * the signature index and ≤ |candidates| id buckets of the set
    * table — corpus-size-independent serve IO, the whole point of
    * writing the index. */
  def bandProbeAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/bandidx25"
    val docs = Tables.documents(s, dir)
    val standing = docs.filter(col("doc_id") % IncomingMod =!= 0)
    writeBandIndex(s, root, standing.filter(col("doc_id") % 2 =!= 0))
    appendBandIndex(s, root, standing.filter(col("doc_id") % 2 === 0))
    bandProbeAgainst(s, root, docs.filter(col("doc_id") % IncomingMod === 0))
      .transform(Common.presented(_, col("doc_id")))
  }

  /** d25's probe core over any incoming (doc_id, text) batch and any
    * written index root — the unit the streamed twin binds per
    * micro-batch (StreamingBandSpec): every verdict row depends only
    * on its own document and the FROZEN files, so streamed ==
    * batched under any arrival order. */
  private[graft] def bandProbeAgainst(s: SparkSession, root: String,
      incoming: DataFrame, cacheBatch: Boolean = true): DataFrame = {
    val ihsets = docShingleSets(incoming)
    // probe rows + verify side + verdict ids — but a long-running
    // streaming monitor calls this per micro-batch and must not
    // accumulate per-batch persists (the winnowing convention)
    if (cacheBatch) { CacheScope.persist(ihsets); () }
    val probe = bandRows(ihsets)
      .select(col("doc_id").as("a"), col("band").as("p_band"),
        col("sig").as("p_sig"), col("band_bucket").as("p_bucket"))
      // the p_bucket >= 0 domain constraint is load-bearing (x17's
      // lesson): the probe descends from a PERSISTED frame, so its
      // upstream filters sit inside the InMemoryRelation where the
      // PartitionPruning rule cannot see them — without a visible
      // selective predicate the bands scan silently reads every bucket
      .filter(col("p_bucket") >= 0)
    val cand = s.read.parquet(s"$root/bands")
      .join(broadcast(probe),
        col("band_bucket") === col("p_bucket") &&
          col("band") === col("p_band") && col("sig") === col("p_sig"))
      .select(col("a"), col("doc_id").as("b"))
      .distinct()
    val slb = cand.withColumn("b_bucket", idBucketCol(col("b")))
      .filter(col("b_bucket") >= 0) // same load-bearing domain constraint
    val fetched = readDocsets(s, root)
      .join(broadcast(slb),
        col("id_bucket") === col("b_bucket") && col("doc_id") === col("b"))
      .select(col("a"), col("b"), col("bg").as("bgb"))
    // the fetch already pairs (a, b, corpus set) — only the incoming
    // side's set attaches here, so no per-candidate fan-out
    val inter = graft.functions.ShingleExpressions
      .sortedIntersectCount(col("bga"), col("bgb")).cast("long")
    val uni = (size(col("bga")) + size(col("bgb"))).cast("long") - inter
    val verified = fetched
      .join(ihsets.select(col("doc_id").as("a"), col("bg").as("bga")),
        Seq("a"))
      .select(col("a"), col("b"),
        when(inter * JaccardNum >= uni, 1).otherwise(0).as("is_near_dup"))
    val agg = verified.groupBy(col("a").as("doc_id"))
      .agg(count(lit(1)).as("n_cand"),
        sum(col("is_near_dup")).cast("long").as("n_dup"),
        min(when(col("is_near_dup") === 1, col("b"))).as("dup_of"))
    ihsets.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        col("dup_of"),
        when(coalesce(col("n_dup"), lit(0L)) > 0, lit("near_dup_of_corpus"))
          .otherwise(lit("new")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // The at-rest SimHash index (d28): the signature half of the text
  // near-dup tier made physical — d3/d3b compute 60-bit simhashes per
  // audit; x31 proved the pattern for embedding sign codes. ONE
  // denormalized artifact (the m7 shape):
  //   - chunks/ — (doc_id, simhash, band, chunk) PARTITIONED BY the
  //     chunk bucket: each doc's 4 pigeonhole band chunks, with the
  //     full signature carried on every row so the Hamming verify is
  //     per-row bit arithmetic on the joined pair — no second fetch,
  //     no text re-hashed at audit time.
  // ---------------------------------------------------------------

  /** Chunk-bucket count of the at-rest simhash layout — 16, the
    * family constant. */
  val SimChunkBuckets = 16

  /** The chunk partition attribute: chunks are md5-derived bit slices
    * (uniform), so d24's plain band+value modulus spreads here too. */
  private[graft] def simChunkBucketCol(band: Column, chunk: Column): Column =
    pmod(band + chunk, lit(SimChunkBuckets.toLong)).cast("int")

  /** (doc_id, simhash, band, chunk, chunk_bucket) — d3b's pigeonhole
    * band rows over any (doc_id, simhash) frame, ONE tree for the
    * build, the append and the probe side. */
  private def simChunkRows(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("simhash"), Simhash60BandBits * i)
            .bitwiseAND((1 << Simhash60BandBits) - 1)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
      .withColumn("chunk_bucket",
        simChunkBucketCol(col("band"), col("chunk")))
      .select(col("doc_id"), col("simhash"), col("band"), col("chunk"),
        col("chunk_bucket"))

  private def simhash60Of(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhashSig(Simhash60Bits).as("simhash"))

  /** BUILD: signatures computed ONCE at ingest, chunk rows written
    * bucket-partitioned. */
  private[graft] def writeSimhashIndex(s: SparkSession, root: String,
      docs: DataFrame): Unit =
    simChunkRows(simhash60Of(docs))
      .write.mode("overwrite").partitionBy("chunk_bucket")
      .parquet(s"$root/chunks")

  /** APPEND: per-doc facts only (standing signatures never change) —
    * append == rebuild row-exact by construction, exactly-once via
    * the ir16 anti-join + eager-checkpoint discipline with the
    * canonical column order restored (the d23 lesson). */
  private[graft] def appendSimhashIndex(s: SparkSession, root: String,
      batch: DataFrame): Unit =
    simChunkRows(simhash60Of(batch))
      .join(s.read.parquet(s"$root/chunks")
          .select(col("doc_id"), col("band")),
        Seq("doc_id", "band"), "left_anti")
      .select(col("doc_id"), col("simhash"), col("band"), col("chunk"),
        col("chunk_bucket"))
      .localCheckpoint()
      .write.mode("append").partitionBy("chunk_bucket")
      .parquet(s"$root/chunks")

  /** D28 — SIMHASH NEAR-DUP AUDIT FROM THE AT-REST INDEX: d3b's full
    * pair audit served from the written chunk rows. BUILD + APPEND
    * pay the signature derivation once at ingest; the SERVE
    * self-joins the slim chunk rows on (band, chunk) — co-partitioned
    * on the written bucket layout — and the exact Hamming verify is
    * `bit_count(xor)` on the signatures the rows already carry.
    * Output BIT-IDENTICAL to d3b (oracle verbatim, the ir15
    * convention).
    *
    * 100 TB plan: the recurring audit cost drops from
    * corpus-tokenize+hash (d3b's hot path) to a ~30-byte-per-row
    * self-join bounded by chunk-bucket occupancy; the text column is
    * never re-read. */
  def simhashAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/simidx28"
    val docs = Tables.documents(s, dir)
    writeSimhashIndex(s, root,
      docs.filter(col("doc_id") % IncomingMod =!= 0))
    appendSimhashIndex(s, root,
      docs.filter(col("doc_id") % IncomingMod === 0))
    simhashAuditFrom(s, root)
  }

  /** d28's audit serve over any written chunk root — ONE tree for the
    * build-append form (d28) and the post-forget form (d33), so the
    * two serves cannot drift. */
  private def simhashAuditFrom(s: SparkSession, root: String): DataFrame = {
    val chunks = s.read.parquet(s"$root/chunks")
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .select(col("a"), col("b"), col("hamming"),
        when(col("hamming") <= SimhashMaxHamming, 1).otherwise(0)
          .as("is_near_dup"))
      .transform(Common.presented(_, col("a"), col("b")))
  }

  /** FORGET from the simhash index (d33) — m8's sweep shape on d28's
    * layout: the deleted docs' chunk keys derive from their OWN
    * signatures, recomputed through the build's tree
    * ([[simChunkRows]] ∘ [[simhash60Of]] — request content, no index
    * read needed for targeting), and exactly those chunk buckets
    * sweep by doc_id. The signature rows are pure per-doc facts — no
    * metadata to subtract, the one-artifact forget (ir23's class).
    * Idempotent: a rerun re-derives the same targets and re-stages
    * the same survivors. */
  private[graft] def forgetSimhashIndex(s: SparkSession, root: String,
      deleted: DataFrame): Unit = {
    val delChunks = simChunkRows(simhash60Of(deleted))
      .select(col("doc_id"), col("chunk_bucket")).distinct()
      .localCheckpoint()
    val tBuckets = delChunks.select(col("chunk_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    AtRest.sweepBuckets(s, s"$root/chunks", "chunk_bucket", tBuckets,
      delChunks.select(col("doc_id")).distinct(), Seq("doc_id"))
    ()
  }

  /** D33 — FORGET EXECUTED AGAINST THE AT-REST SIMHASH INDEX: build
    * the full chunk index (d28's layout), EXECUTE the c4/c6 delete
    * cohort ([[forgetSimhashIndex]] — chunk keys from the request's
    * own signatures), and serve d3b's full near-dup audit from what
    * remains. The oracle is d3b's SQL over the SURVIVORS, so the
    * files must hold exactly the survivor chunk rows.
    *
    * 100 TB plan: a forget touches ≤ 4·|request| chunk rows' buckets
    * — request-content-bounded IO; no text is re-read (signatures
    * recompute from the request's own docs, the m8 convention), and
    * untouched buckets are never listed. */
  def simhashForget(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/simidx33"
    val docs = Tables.documents(s, dir)
    writeSimhashIndex(s, root, docs)
    forgetSimhashIndex(s, root, docs.filter(
      col("doc_id") % TextOps.ForgetMod === TextOps.ForgetRem))
    simhashAuditFrom(s, root)
  }

  /** d28's incremental probe core (the d25 shape on signatures): an
    * incoming batch signs itself, broadcasts its chunk rows onto the
    * BARE chunk_bucket partition attribute (DPP — PlanContractSpec
    * pins it) and verdicts per incoming doc against the FROZEN
    * index; every verdict depends only on its own document and the
    * written files, so streamed == batched under any arrival order
    * (StreamingBandSpec binds it per micro-batch). */
  private[graft] def simhashProbeAgainst(s: SparkSession, root: String,
      incoming: DataFrame, cacheBatch: Boolean = true): DataFrame = {
    val isigs = simhash60Of(incoming)
    if (cacheBatch) { CacheScope.persist(isigs); () }
    val probe = simChunkRows(isigs)
      .select(col("doc_id").as("a"), col("simhash").as("sa"),
        col("band").as("p_band"), col("chunk").as("p_chunk"),
        col("chunk_bucket").as("p_bucket"))
      // load-bearing selective predicate (x17's lesson): the probe
      // descends from a persisted frame, so without a visible filter
      // the PartitionPruning rule never inserts the pruning subquery
      .filter(col("p_bucket") >= 0)
    val verdicts = s.read.parquet(s"$root/chunks")
      .join(broadcast(probe),
        col("chunk_bucket") === col("p_bucket") &&
          col("band") === col("p_band") && col("chunk") === col("p_chunk"))
      .select(col("a"), col("doc_id").as("b"), col("sa"),
        col("simhash").as("sb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .withColumn("is_near_dup",
        when(col("hamming") <= SimhashMaxHamming, 1).otherwise(0))
    val agg = verdicts.groupBy(col("a").as("doc_id"))
      .agg(count(lit(1)).as("n_cand"),
        sum(col("is_near_dup")).cast("long").as("n_dup"),
        min(when(col("is_near_dup") === 1, col("b"))).as("dup_of"))
    isigs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        col("dup_of"),
        when(coalesce(col("n_dup"), lit(0L)) > 0, lit("near_dup_of_corpus"))
          .otherwise(lit("new")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // The at-rest cluster assignment (d29): d13 proves the incremental
  // merge ALGEBRA (star contraction preserves connectivity, so a
  // daily merge equals a full re-cluster); d29 makes the assignment
  // PHYSICAL — the first maintained GRAPH family. Two projections of
  // the same (doc_id, cluster_id) facts, the postings+dict shape:
  //   - clusters/ — PARTITIONED BY the CLUSTER bucket: relabeling a
  //     merged cluster rewrites only its buckets (dynamic overwrite).
  //   - members/  — PARTITIONED BY the DOC bucket: "which cluster is
  //     doc X in" reads only the probe's doc buckets (DPP).
  // Only docs that appear in the near-dup pair graph have rows —
  // singletons (the vast majority at 100 TB) are implicit, so the
  // tables are bounded by clustered members, not corpus size.
  // ---------------------------------------------------------------

  /** Cluster-bucket count of the at-rest assignment — 16, the family
    * constant (doc buckets reuse [[IdBuckets]]). */
  val ClusterBuckets = 16

  private[graft] def clusterBucketCol(c: Column): Column =
    pmod(c, lit(ClusterBuckets.toLong)).cast("int")

  /** Write both projections of a (doc_id, cluster_id) assignment. */
  private def writeAssignment(s: SparkSession, root: String,
      labels: DataFrame): Unit = {
    val l = labels.select(col("doc_id"), col("cluster_id"))
      .localCheckpoint()
    // both projections land from the same pinned assignment into
    // disjoint tables — overlap the writes (guide §2.6)
    AtRest.inParallel(
      () => l.withColumn("c_bucket", clusterBucketCol(col("cluster_id")))
        .write.mode("overwrite").partitionBy("c_bucket")
        .parquet(s"$root/clusters"),
      () => l.withColumn("d_bucket", idBucketCol(col("doc_id")))
        .write.mode("overwrite").partitionBy("d_bucket")
        .parquet(s"$root/members"))
  }

  /** BUILD (and the wholesale HEAL): components over the written
    * index's verified pairs — the band index is the base of record,
    * so a torn update recovers by this recount (the pair edges
    * themselves are never stored; they re-derive from the slim
    * signature files, ir16's heal-by-recount discipline one level
    * up). */
  private[graft] def buildClusterTables(s: SparkSession,
      root: String): Unit = {
    val pairs = bandPairsFrom(s, root)
      .filter(col("is_near_dup") === 1).select(col("a"), col("b"))
    val (labels, _) = StarComponents.components(pairs)
    writeAssignment(s, root,
      labels.select(col("doc_id"), col("label").as("cluster_id")))
  }

  /** Verified near-dup pairs TOUCHING a batch, from the maintained
    * index: the batch's band rows (computed in-scan) broadcast onto
    * the BARE band_bucket attribute (DPP), and BOTH endpoints' sets
    * fetch from docsets id-bucket-pruned (the batch's own sets landed
    * with the append). Canonical (a < b) distinct pairs. */
  private[graft] def batchPairsAgainst(s: SparkSession, root: String,
      batch: DataFrame): DataFrame = {
    // one consumer: the verify fetches BOTH sides from the written
    // docsets (the batch landed with the append), so unlike d25 the
    // in-scan sets need no persist
    val probe = bandRows(docShingleSets(batch))
      .select(col("doc_id").as("p_doc"), col("band").as("p_band"),
        col("sig").as("p_sig"), col("band_bucket").as("p_bucket"))
      // load-bearing selective predicate (x17's lesson)
      .filter(col("p_bucket") >= 0)
    val cand = s.read.parquet(s"$root/bands")
      .join(broadcast(probe),
        col("band_bucket") === col("p_bucket") &&
          col("band") === col("p_band") && col("sig") === col("p_sig"))
      .filter(col("doc_id") =!= col("p_doc"))
      .select(least(col("p_doc"), col("doc_id")).as("a"),
        greatest(col("p_doc"), col("doc_id")).as("b"))
      .distinct()
      .withColumn("a_bucket", idBucketCol(col("a")))
      .filter(col("a_bucket") >= 0)
    val fa = readDocsets(s, root)
      .join(broadcast(cand),
        col("id_bucket") === col("a_bucket") && col("doc_id") === col("a"))
      .select(col("a"), col("b"), col("bg").as("bga"))
      .withColumn("b_bucket", idBucketCol(col("b")))
      .filter(col("b_bucket") >= 0)
    val inter = graft.functions.ShingleExpressions
      .sortedIntersectCount(col("bga"), col("bgb")).cast("long")
    val uni = (size(col("bga")) + size(col("bgb"))).cast("long") - inter
    readDocsets(s, root)
      .join(broadcast(fa),
        col("id_bucket") === col("b_bucket") && col("doc_id") === col("b"))
      .select(col("a"), col("b"), col("bga"), col("bg").as("bgb"))
      .filter(inter * JaccardNum >= uni)
      .select(col("a"), col("b"))
  }

  /** "Which cluster is doc X in" — the point lookup the merge (and
    * any consumer) runs against the doc-bucketed projection, DPP-
    * pruned to the probed ids' buckets (PlanContractSpec pins it).
    * Ids absent from the table are singletons: no row. */
  private[graft] def memberLookup(s: SparkSession, root: String,
      ids: DataFrame): DataFrame = {
    val e = ids.select(col(ids.columns.head).as("d")).distinct()
      .withColumn("e_bucket", idBucketCol(col("d")))
      // load-bearing selective predicate (x17's lesson)
      .filter(col("e_bucket") >= 0)
    s.read.parquet(s"$root/members")
      .join(broadcast(e),
        col("d_bucket") === col("e_bucket") && col("doc_id") === col("d"))
      .select(col("doc_id"), col("cluster_id"))
  }

  /** UPDATE: d13's star-contraction merge made physical —
    *   1. the batch's verified pairs come off the maintained index
    *      ([[batchPairsAgainst]] — batch-bounded IO);
    *   2. the endpoints' standing assignments look up in `members`
    *      DPP-pruned by doc bucket; the TOUCHED clusters' member rows
    *      read from `clusters` with a static bucket list (both O(16)
    *      driver metadata, pinned eagerly before the overwrites
    *      below);
    *   3. components run over the SMALL graph — the touched clusters'
    *      star edges ∪ the new pairs — never the historical edge set
    *      (d13's invariant: star contraction preserves connectivity
    *      exactly, so update == rebuild bit-exactly);
    *   4. both projections rewrite ONLY the affected buckets via
    *      dynamic partition overwrite, with the x17 directory-drop
    *      guard on the clusters side (a bucket can lose every row to
    *      a merge that relabels away from it).
    * A retried update recomputes the same pairs against the already-
    * merged state and re-emits identical rows — a row-level no-op. A
    * crash between the two projection writes leaves them inconsistent,
    * never wrong-as-a-pair-rule: [[buildClusterTables]] IS the heal
    * (wholesale recount from the index — ClustersAtRestSpec pins
    * it). */
  private[graft] def updateClusters(s: SparkSession, root: String,
      batch: DataFrame): Unit = {
    val newPairs = batchPairsAgainst(s, root, batch).localCheckpoint()
    if (newPairs.isEmpty) return
    val touched = memberLookup(s, root,
        newPairs.select(col("a").as("d"))
          .unionByName(newPairs.select(col("b").as("d"))))
      .select(col("cluster_id")).distinct()
      .localCheckpoint()
    val tBuckets = touched
      .select(clusterBucketCol(col("cluster_id")).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val stars =
      if (tBuckets.isEmpty) newPairs.limit(0)
      else s.read.parquet(s"$root/clusters")
        .filter(col("c_bucket").isin(tBuckets: _*))
        .join(broadcast(touched), Seq("cluster_id"))
        .filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as("a"), col("cluster_id").as("b"))
        .localCheckpoint()
    val (merged0, _) = StarComponents.components(
      stars.unionByName(newPairs))
    val merged = merged0
      .select(col("doc_id"), col("label").as("cluster_id"))
      .localCheckpoint()
    // clusters/: affected = old touched clusters' buckets ∪ the merged
    // labels' buckets (a merge can relabel into a new bucket)
    val affectedC = touched
      .select(clusterBucketCol(col("cluster_id")).as("b"))
      .unionByName(merged.select(clusterBucketCol(col("cluster_id")).as("b")))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    // members/: affected = the relabeled nodes' doc buckets; every
    // affected bucket receives ≥1 merged row by construction, so the
    // shared verb's drop set is empty there. Both projections stage
    // from pinned frames and rewrite disjoint tables — overlap the two
    // overwrites (guide §2.6)
    val affectedD = merged.select(idBucketCol(col("doc_id")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    AtRest.inParallel(
      () => {
        AtRest.overwriteBuckets(s, s"$root/clusters", "c_bucket", affectedC,
          s.read.parquet(s"$root/clusters")
            .filter(col("c_bucket").isin(affectedC: _*))
            .join(broadcast(touched), Seq("cluster_id"), "left_anti")
            .select(col("doc_id"), col("cluster_id"))
            .unionByName(merged)
            .withColumn("c_bucket", clusterBucketCol(col("cluster_id"))))
        ()
      },
      () => if (affectedD.nonEmpty) {
        AtRest.overwriteBuckets(s, s"$root/members", "d_bucket", affectedD,
          s.read.parquet(s"$root/members")
            .filter(col("d_bucket").isin(affectedD: _*))
            .join(broadcast(merged.select(col("doc_id"))), Seq("doc_id"),
              "left_anti")
            .select(col("doc_id"), col("cluster_id"))
            .unionByName(merged)
            .withColumn("d_bucket", idBucketCol(col("doc_id"))))
        ()
      })
  }

  /** D29 — MAINTAINED CLUSTER ASSIGNMENT AT REST: the dedup decision
    * itself as a written, maintained table. BUILD runs components
    * over the standing index's verified pairs and writes both
    * projections; the incoming batch folds in through the index
    * append + [[updateClusters]] (the small-graph merge); the
    * registered output is d6's cluster dump served from the
    * MAINTAINED table (singletons rejoin implicitly), which must
    * equal the full re-cluster bit-exactly — the oracle is d6's
    * recursive-closure SQL VERBATIM.
    *
    * 100 TB plan: daily dedup never reruns components over the
    * historical edge set — update cost is bounded by the batch's
    * pairs plus the touched clusters' members, and the rewrites touch
    * only their buckets. The assignment tables are bounded by
    * clustered members (singletons are implicit rows-that-aren't). */
  def clustersAtRest(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/clusidx29"
    val docs = Tables.documents(s, dir)
    val standing = docs.filter(col("doc_id") % IncomingMod =!= 0)
    val batch = docs.filter(col("doc_id") % IncomingMod === 0)
    writeBandIndex(s, root, standing)
    buildClusterTables(s, root)
    appendBandIndex(s, root, batch)
    updateClusters(s, root, batch)
    shapeClusters(s, dir,
      s.read.parquet(s"$root/clusters")
        .select(col("doc_id"), col("cluster_id").as("label")))
  }

  // ---------------------------------------------------------------
  // d30 — FORGET executed against the maintained cluster assignment:
  // the first forget that can SPLIT a component. d29's update only
  // ever MERGES (new pairs add edges); deleting a document REMOVES
  // its edges, and if it was the bridge, its cluster falls apart —
  // the one maintenance direction star contraction cannot express
  // incrementally, so the touched clusters' survivor subgraphs
  // recompute from the index (bounded by cluster size, never the
  // corpus). The index forget itself is ir22's shape inverted: the
  // deleted docs' band rows live in buckets derived from their OWN
  // signatures — which the id-bucketed docsets table still holds, so
  // the targets come from a DPP point-fetch of the index, no text
  // re-shingled.
  // ---------------------------------------------------------------

  /** The deleted ids' shingle sets, fetched from the id-bucketed
    * docsets — the index answers its own forget targeting. */
  private def docsetFetch(s: SparkSession, root: String,
      ids: DataFrame): DataFrame = {
    val e = ids.select(col("doc_id").as("d")).distinct()
      .withColumn("e_bucket", idBucketCol(col("d")))
      // load-bearing selective predicate (x17's lesson)
      .filter(col("e_bucket") >= 0)
    readDocsets(s, root)
      .join(broadcast(e),
        col("id_bucket") === col("e_bucket") && col("doc_id") === col("d"))
      .select(col("doc_id"), col("bg"))
  }

  /** FORGET from the band index: the deleted docs' sets fetch from
    * docsets (DPP by id bucket), their band rows RECOMPUTE from the
    * stored sets through the build's own tree (bit-identical to what
    * the build wrote — no text touched), and exactly those band
    * buckets sweep; then the ids' docset buckets sweep. All-deleted
    * bucket directories drop. Idempotent: a rerun fetches no sets
    * (already gone) and the docset sweep re-stages survivors to the
    * same rows. */
  private[graft] def forgetBandIndex(s: SparkSession, root: String,
      delIds: DataFrame): Unit = {
    val ids = delIds.select(col("doc_id")).distinct().localCheckpoint()
    val sets = docsetFetch(s, root, ids).localCheckpoint()
    val bBuckets = bandRows(sets).select(col("band_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val dBuckets = ids.select(idBucketCol(col("doc_id")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    // the two sweeps target disjoint tables from the pinned request
    // (the docset fetch above already materialized everything the
    // bands sweep derives from) — overlap them (guide §2.6)
    AtRest.inParallel(
      () => {
        AtRest.sweepBuckets(s, s"$root/bands", "band_bucket", bBuckets,
          ids, Seq("doc_id"))
        ()
      },
      // staged through readDocsets' explicit schema (the bg array's
      // containsNull contract), so the shared verb only owns the tail
      () => if (dBuckets.nonEmpty) {
        AtRest.overwriteBuckets(s, s"$root/docsets", "id_bucket", dBuckets,
          readDocsets(s, root)
            .filter(col("id_bucket").isin(dBuckets: _*))
            .join(broadcast(ids), Seq("doc_id"), "left_anti"))
        ()
      })
  }

  /** FORGET from the maintained assignment. Stages:
    *  1. the deleted ids' clusters look up in `members` (DPP) — the
    *     TOUCHED clusters, O(batch) driver metadata;
    *  2. the band index sweeps ([[forgetBandIndex]]) — the base of
    *     record holds only survivors from here on;
    *  3. the touched clusters' SURVIVOR SUBGRAPHS recompute from the
    *     swept index: survivors' sets fetch by id (DPP), band rows
    *     recompute in-memory, candidates self-join on (band, sig),
    *     the exact Jaccard verifies — all bounded by the touched
    *     clusters' member counts. Components over the survivor pairs
    *     relabel; splits fall out naturally (a severed half gets its
    *     own min-id label; a stranded single gets NO row — singletons
    *     stay implicit);
    *  4. both projections rewrite only their affected buckets. The
    *     members sweep's removal key includes the DELETED ids
    *     unconditionally, so a rerun after a crash between the two
    *     projection writes still scrubs the deleted rows (the
    *     compliance half); full projection consistency after such a
    *     crash restores via [[buildClusterTables]] — the wholesale
    *     recount from the index is the heal, d29's own contract
    *     (ClusterForgetSpec pins both). */
  private[graft] def forgetClusters(s: SparkSession, root: String,
      delIds0: DataFrame): Unit = {
    val delIds = delIds0.select(col("doc_id")).distinct().localCheckpoint()
    val touched = memberLookup(s, root, delIds.select(col("doc_id").as("d")))
      .select(col("cluster_id")).distinct().localCheckpoint()
    forgetBandIndex(s, root, delIds)
    val tBuckets = touched
      .select(clusterBucketCol(col("cluster_id")).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val oldRows =
      if (tBuckets.isEmpty) delIds.limit(0)
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
      else s.read.parquet(s"$root/clusters")
        .filter(col("c_bucket").isin(tBuckets: _*))
        .join(broadcast(touched), Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"))
        .localCheckpoint()
    // survivor subgraph off the swept index
    val sets = docsetFetch(s, root,
      oldRows.join(broadcast(delIds), Seq("doc_id"), "left_anti")
        .select(col("doc_id")))
    CacheScope.persist(sets) // feeds the band recompute + both verify sides
    val sb = bandRows(sets)
    val cand = sb.as("x").join(sb.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val pairs = verifyPairs(cand, sets, sets)
      .filter(col("is_near_dup") === 1).select(col("a"), col("b"))
    val (lab, _) = StarComponents.components(pairs)
    val newRows = lab.select(col("doc_id"), col("label").as("cluster_id"))
      .localCheckpoint()
    // clusters/: drop the touched clusters' rows, land the relabeled
    // components (split halves, shrunk clusters); vanished clusters
    // simply have no new rows
    val affectedC = touched
      .select(clusterBucketCol(col("cluster_id")).as("b"))
      .unionByName(newRows.select(clusterBucketCol(col("cluster_id")).as("b")))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    // members/: removal key = deleted ids ∪ the touched clusters' old
    // members (the delIds arm is load-bearing — it is what lets a
    // rerun after a mid-crash still scrub the deleted rows when the
    // clusters projection no longer names their old cluster)
    val removal = delIds
      .unionByName(oldRows.select(col("doc_id"))).distinct()
      .localCheckpoint()
    val affectedD = removal.select(idBucketCol(col("doc_id")).as("b"))
      .unionByName(newRows.select(idBucketCol(col("doc_id")).as("b")))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    // both projections stage from pinned frames (touched/newRows/
    // removal) and rewrite disjoint tables — overlap (guide §2.6); the
    // rerun-scrub property is per-table and unchanged by the order
    AtRest.inParallel(
      () => if (affectedC.nonEmpty) {
        AtRest.overwriteBuckets(s, s"$root/clusters", "c_bucket",
          affectedC,
          s.read.parquet(s"$root/clusters")
            .filter(col("c_bucket").isin(affectedC: _*))
            .join(broadcast(touched), Seq("cluster_id"), "left_anti")
            .select(col("doc_id"), col("cluster_id"))
            .unionByName(newRows)
            .withColumn("c_bucket", clusterBucketCol(col("cluster_id"))))
        ()
      },
      () => if (affectedD.nonEmpty) {
        AtRest.overwriteBuckets(s, s"$root/members", "d_bucket",
          affectedD,
          s.read.parquet(s"$root/members")
            .filter(col("d_bucket").isin(affectedD: _*))
            .join(broadcast(removal), Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("cluster_id"))
            .unionByName(newRows)
            .withColumn("d_bucket", idBucketCol(col("doc_id"))))
        ()
      })
  }

  /** D30 — FORGET AGAINST THE MAINTAINED CLUSTERS: build the index +
    * assignment over the full corpus, EXECUTE the c4/c6 delete cohort
    * ([[forgetClusters]] — index sweep + touched-subgraph relabel),
    * and serve d6's cluster dump over the SURVIVORS from the
    * maintained table. The oracle is d6's recursive-closure SQL with
    * the cohort subtracted at the source — re-deriving every
    * component over the survivor graph — so the maintained table must
    * hold exactly the split/shrunk/relabeled clusters a full
    * re-cluster of the survivors produces.
    *
    * 100 TB plan: a takedown's cost is its docs' band/docset buckets
    * plus the TOUCHED clusters' members (cluster-sized subgraphs,
    * never the corpus edge set) — the historical pair graph is never
    * re-run, and untouched clusters' buckets are never listed. */
  def clustersForget(s: SparkSession, dir: String): DataFrame = {
    val root = SimilarityOps.indexRoot(s, dir) + "/clusidx30"
    val docs = Tables.documents(s, dir)
    writeBandIndex(s, root, docs)
    buildClusterTables(s, root)
    val isDel = col("doc_id") % TextOps.ForgetMod === TextOps.ForgetRem
    forgetClusters(s, root, docs.filter(isDel).select(col("doc_id")))
    shapeClustersOver(docs.filter(!isDel),
      s.read.parquet(s"$root/clusters")
        .select(col("doc_id"), col("cluster_id").as("label")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d30_clusters_forget" -> (clustersForget _),
    "d29_clusters_atrest" -> (clustersAtRest _),
    "d28_simhash_atrest" -> (simhashAtRest _),
    "d22_decontam_atrest" -> (decontamAtRest _),
    "d31_decontam_forget" -> (decontamForget _),
    "d32_winnow_forget" -> (winnowForget _),
    "d33_simhash_forget" -> (simhashForget _),
    "d23_leakage_atrest" -> (leakageAtRest _),
    "d24_bandpairs_atrest" -> (bandPairsAtRest _),
    "d25_bandprobe_atrest" -> (bandProbeAtRest _),
    "d1_exact_dedup" -> (exact _),
    "d2_minhash_lsh" -> (minhashLsh _),
    "d3_simhash" -> (simhash _),
    "d3b_simhash_neardup" -> (simhashNearDup _),
    "d4_ngram_jaccard" -> (ngramJaccard _),
    "d5_embed_neardup" -> (embedNearDup _),
    "d6_dedup_clusters" -> (dedupClusters _),
    "d6b_star_clusters" -> (dedupClustersStar _),
    "d7_incremental_dedup" -> (incrementalDedup _),
    "d15_minhash_incremental" -> (minhashIncremental _),
    "d8_decontaminate" -> (decontaminate _),
    "d9_quality_keeper" -> (qualityKeeper _),
    "d10_cluster_split" -> (clusterSplit _),
    "d11_embed_clusters" -> (embedClusters _),
    "d12_split_leakage" -> (splitLeakage _),
    "d13_incremental_clusters" -> (incrementalClusters _),
    "d14_containment" -> (containment _),
    "d16_semdedup" -> (semDedup _),
    "d17_winnowing" -> (winnowing _),
    "d18_winnowing_incremental" -> (winnowingIncremental _),
    "d19_winnowing_append" -> (winnowingAppend _),
    "d26_winnow_probe_atrest" -> (winnowProbeAtRest _),
    "d27_winnow_append_atrest" -> (winnowAppendAtRest _),
    "d20_substring_dedup" -> (substringDedup _),
    "d21_substring_cut" -> (substringCut _))

  /** The d5 oracle body minus its presentation ORDER BY — d11 embeds it
    * as a recursive-closure CTE. */
  private val d5CoreSql: String =
    s"""WITH e AS (SELECT vec_id, embedding AS v,
       |                  ${signBucketSql("embedding", 4)} AS bucket,
       |                  sqrt(${dotDSql("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |p AS (SELECT x.vec_id AS vec_id, y.vec_id AS nn_id,
       |             ${dotDSql("x.v", "y.v")} / (x.nrm * y.nrm) AS nn_cos
       |      FROM e x JOIN e y
       |        ON x.bucket = y.bucket AND x.vec_id <> y.vec_id)
       |SELECT vec_id, nn_id, nn_cos,
       |       CASE WHEN nn_cos > 0.35 THEN 1 ELSE 0 END AS is_near_dup
       |FROM p
       |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY nn_cos DESC, nn_id) = 1""".stripMargin

  private[operators] val bgSql =
    s"list_distinct(${shinglesSql(tokensSql("text"), 2)})"

  /** d8's word-trigram twin of [[bgSql]]. */
  private[operators] val tgSql =
    s"list_distinct(${shinglesSql(tokensSql("text"), DecontamK)})"


  private[operators] val mhSqls = MinHashAB.zipWithIndex.map { case ((a, b), j) =>
    s"list_min(list_transform(hs, h -> (h * $a + $b) % $HashMod)) AS mh$j"
  }.mkString(",\n       ")

  private val bandSelects = (0 until Bands).map { bnd =>
    s"SELECT doc_id, $bnd AS band, mh${2 * bnd} * $HashMod + mh${2 * bnd + 1} AS sig FROM m"
  }.mkString("\n  UNION ALL\n  ")

  /** DuckDB simhash builder: the bit-vote fold for `bits` signature
    * bits (shared shape for the 16-bit d3 and 60-bit d3b oracles). */
  /** Generalized over (relation, id, token-source column) so the m6
    * media oracle can restate the same bit-vote fold over a CTE. */
  private[operators] def simhashSqlOver(bits: Int, idCol: String,
      tokenCol: String, rel: String): String = {
    val terms = (0 until bits).map { i =>
      s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
         |  list_transform(hs, h -> CASE WHEN (h >> $i) & 1 = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
         |  (acc, v) -> acc + v) > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END""".stripMargin
    }.mkString(" +\n       ")
    s"""SELECT $idCol, $terms AS simhash
       |FROM (SELECT $idCol,
       |        list_transform(${tokensSql(tokenCol)}, t -> ${md5LongSql("t")}) AS hs
       |      FROM $rel) h""".stripMargin
  }

  private def simhashSql(bits: Int): String =
    simhashSqlOver(bits, "doc_id", "text", "documents")

  private[operators] val simhashCoreSql: String = simhashSql(16)
  private val simhash60Sql: String = simhashSql(Simhash60Bits)

  /** d3b's oracle — and verbatim d28's (the at-rest serve is
    * bit-identical by the ir15 path-substitution convention). */
  private def d3bOracleOver(docsRel: String): String =
    s"""WITH sigs AS (${simhashSqlOver(Simhash60Bits, "doc_id", "text", docsRel)}),
       |chunks AS (SELECT doc_id, simhash, u.band,
       |                  (simhash >> ($Simhash60BandBits * u.band)) & ${(1 << Simhash60BandBits) - 1} AS chunk
       |           FROM sigs, unnest([0, 1, 2, 3]) AS u(band)),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |                x.simhash AS sa, y.simhash AS sb
       |         FROM chunks x JOIN chunks y
       |           ON x.band = y.band AND x.chunk = y.chunk
       |              AND x.doc_id < y.doc_id)
       |SELECT a, b,
       |       CAST(bit_count(xor(sa, sb)) AS INT) AS hamming,
       |       CASE WHEN bit_count(xor(sa, sb)) <= $SimhashMaxHamming
       |            THEN 1 ELSE 0 END AS is_near_dup
       |FROM cand ORDER BY a, b""".stripMargin

  private lazy val D3bOracle: String = d3bOracleOver("documents")

  private val oraclesD2Body: String =
    s"""WITH t AS (SELECT doc_id, $bgSql AS bg FROM documents),
       |h AS (SELECT doc_id, bg, list_transform(bg, s -> ${tokHashSql("s")}) AS hs FROM t),
       |m AS (SELECT doc_id,
       |       $mhSqls
       |       FROM h),
       |sigs AS (
       |  $bandSelects
       |),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM sigs x JOIN sigs y
       |           ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       |th AS (SELECT doc_id, list_distinct(hs) AS bg FROM h)
       |SELECT a, b,
       |       CAST(len(list_intersect(ta.bg, tb.bg)) AS BIGINT) AS inter_cnt,
       |       CAST(len(ta.bg) + len(tb.bg) - len(list_intersect(ta.bg, tb.bg)) AS BIGINT) AS union_cnt,
       |       CASE WHEN len(list_intersect(ta.bg, tb.bg)) * $JaccardNum >=
       |                 len(ta.bg) + len(tb.bg) - len(list_intersect(ta.bg, tb.bg))
       |            THEN 1 ELSE 0 END AS is_near_dup
       |FROM cand JOIN th ta ON a = ta.doc_id JOIN th tb ON b = tb.doc_id""".stripMargin

  /** d8's oracle — shared VERBATIM by the at-rest serve d22 (sums
    * cast to BIGINT: DuckDB sum(int) widens to HUGEINT), and with the
    * train side further restricted by d31's post-forget serve. */
  private def d8SqlWhere(trainExtra: String): String =
    s"""WITH ex AS (SELECT doc_id,
       |              unnest(list_distinct(list_transform($tgSql,
       |                s -> ${tokHashSql("s")}))) AS h
       |            FROM documents WHERE doc_id % $EvalMod <> 0$trainExtra),
       |ev AS (SELECT DISTINCT unnest(list_distinct(list_transform($tgSql,
       |         s -> ${tokHashSql("s")}))) AS h
       |       FROM documents WHERE doc_id % $EvalMod = 0)
       |SELECT e.doc_id,
       |       count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN v.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       |       CASE WHEN sum(CASE WHEN v.h IS NOT NULL THEN 1 ELSE 0 END) > 0
       |            THEN 1 ELSE 0 END AS is_contaminated
       |FROM ex e LEFT JOIN ev v ON e.h = v.h
       |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin

  private lazy val d8Sql: String = d8SqlWhere("")

  /** d12's oracle — d10's split rule + d8's hashed-trigram contract,
    * roles reversed (train is the reference side); shared VERBATIM by
    * the maintained-index serve d23. */
  private val d12Sql: String =
    s"""WITH sp AS (SELECT doc_id,
       |              CASE WHEN ${md5LongSql(s"'split:' || md5(array_to_string(${tokensSql("text")}[1:$HeadKeyTokens], ' '))")} % 100 < $SplitTrainPct THEN 'train'
       |                   WHEN ${md5LongSql(s"'split:' || md5(array_to_string(${tokensSql("text")}[1:$HeadKeyTokens], ' '))")} % 100 < ${SplitTrainPct + SplitValPct} THEN 'val'
       |                   ELSE 'test' END AS split,
       |              list_distinct(list_transform($tgSql,
       |                s -> ${tokHashSql("s")})) AS hs
       |            FROM documents),
       |ex AS (SELECT doc_id, split, unnest(hs) AS h FROM sp),
       |tr AS (SELECT DISTINCT h FROM ex WHERE split = 'train')
       |SELECT e.doc_id, e.split,
       |       count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_train_overlap,
       |       CASE WHEN sum(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) > 0
       |            THEN 1 ELSE 0 END AS is_leaky
       |FROM ex e LEFT JOIN tr t ON e.h = t.h
       |WHERE e.split <> 'train'
       |GROUP BY e.doc_id, e.split ORDER BY e.doc_id""".stripMargin

  /** d15's oracle — shared VERBATIM by the at-rest probe d25. */
  private val d15Sql: String =
    s"""WITH t AS (SELECT doc_id, $bgSql AS bg FROM documents),
         |h AS (SELECT doc_id, bg, list_transform(bg, s -> ${tokHashSql("s")}) AS hs FROM t),
         |m AS (SELECT doc_id,
         |       $mhSqls
         |       FROM h),
         |sigs AS (
         |  $bandSelects
         |),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |         FROM sigs x JOIN sigs y
         |           ON x.band = y.band AND x.sig = y.sig
         |         WHERE x.doc_id % $IncomingMod = 0 AND y.doc_id % $IncomingMod <> 0),
         |th AS (SELECT doc_id, list_distinct(hs) AS bg FROM h),
         |ver AS (SELECT a, b,
         |          CASE WHEN len(list_intersect(ta.bg, tb.bg)) * $JaccardNum >=
         |                    len(ta.bg) + len(tb.bg) - len(list_intersect(ta.bg, tb.bg))
         |               THEN 1 ELSE 0 END AS nd
         |        FROM cand JOIN th ta ON cand.a = ta.doc_id
         |                 JOIN th tb ON cand.b = tb.doc_id),
         |agg AS (SELECT a AS doc_id, count(*) AS n_cand,
         |               CAST(sum(nd) AS BIGINT) AS n_dup,
         |               min(CASE WHEN nd = 1 THEN b END) AS dup_of
         |        FROM ver GROUP BY a)
         |SELECT d.doc_id,
         |       coalesce(n_cand, 0) AS n_cand,
         |       coalesce(n_dup, 0) AS n_dup,
         |       dup_of,
         |       CASE WHEN coalesce(n_dup, 0) > 0 THEN 'near_dup_of_corpus'
         |            ELSE 'new' END AS verdict
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $IncomingMod = 0) d
         |LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin

  /** d2's oracle — shared VERBATIM by the at-rest pair audit d24. */
  private val d2Sql: String =
    s"""$oraclesD2Body
       |ORDER BY a, b""".stripMargin

  /** d18's oracle — shared VERBATIM by the at-rest probe d26. */
  private val d18Sql: String =
    s"""WITH $d17FpCtesSql,
         |corpus AS (SELECT doc_id, h FROM fp WHERE doc_id % $IncomingMod <> 0),
         |overcap AS (SELECT h FROM corpus GROUP BY h
         |            HAVING count(*) > $WinnowCap),
         |idx AS (SELECT c.doc_id, c.h FROM corpus c
         |        LEFT JOIN overcap o ON c.h = o.h WHERE o.h IS NULL),
         |batch AS (SELECT doc_id, h FROM fp WHERE doc_id % $IncomingMod = 0),
         |nf AS (SELECT doc_id, count(*) AS nfp FROM batch GROUP BY doc_id),
         |hits AS (SELECT b.doc_id, i.doc_id AS match_doc,
         |                count(*) AS n_shared
         |         FROM batch b JOIN idx i ON b.h = i.h GROUP BY 1, 2),
         |best AS (SELECT doc_id, match_doc, n_shared,
         |                count(*) OVER (PARTITION BY doc_id) AS n_cand
         |         FROM hits
         |         QUALIFY row_number() OVER (PARTITION BY doc_id
         |                   ORDER BY n_shared DESC, match_doc) = 1)
         |SELECT d.doc_id,
         |       coalesce(n.nfp, 0) AS nfp,
         |       coalesce(b.n_cand, 0) AS n_cand,
         |       b.match_doc,
         |       coalesce(b.n_shared, 0) AS n_shared,
         |       CASE WHEN coalesce(b.n_shared, 0) > 0
         |            THEN CAST(b.n_shared AS DOUBLE) / n.nfp END AS overlap,
         |       CASE WHEN coalesce(b.n_shared, 0) > 0
         |            THEN 'overlaps_corpus' ELSE 'new' END AS verdict
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $IncomingMod = 0) d
         |LEFT JOIN nf n ON n.doc_id = d.doc_id
         |LEFT JOIN best b ON b.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin

  /** d19's oracle (the append==rebuild invariant IS the oracle: the
    * appended index must equal the capped fingerprint table of the
    * FULL corpus) — shared VERBATIM by the at-rest append d27. */
  private val d19Sql: String =
    s"""WITH $d17FpCtesSql,
         |overcap AS (SELECT h FROM fp GROUP BY h
         |            HAVING count(*) > $WinnowCap)
         |SELECT f.doc_id, f.h
         |FROM fp f LEFT JOIN overcap o ON f.h = o.h
         |WHERE o.h IS NULL
         |ORDER BY f.doc_id, f.h""".stripMargin

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "d2_minhash_lsh" -> d2Sql,
    "d3_simhash" ->
      s"""$simhashCoreSql
         |ORDER BY doc_id""".stripMargin,
    "d3b_simhash_neardup" -> D3bOracle,
    "d28_simhash_atrest" -> D3bOracle,
    // d33: build∘forget∘serve == d3b over the SURVIVORS — the ir22
    // convergence invariant on the simhash chunk layout
    "d33_simhash_forget" -> d3bOracleOver(
      s"(SELECT * FROM documents WHERE doc_id % ${TextOps.ForgetMod} <> ${TextOps.ForgetRem})"),
    // d31: the train side loses the forget cohort at the source; the
    // eval probe side is the question, not a release — unrestricted
    "d31_decontam_forget" -> d8SqlWhere(
      s" AND doc_id % ${TextOps.ForgetMod} <> ${TextOps.ForgetRem}"),
    // d32: d19's kept dump recomputed over the survivors — over-cap
    // derived from SURVIVOR counts, so hashes the cohort's deletion
    // dropped back under the cap re-enter on both engines (the cap
    // re-check the forget must implement, not just a row sweep)
    "d32_winnow_forget" ->
      s"""WITH ${d17FpCtesOver(
             s"(SELECT * FROM documents WHERE doc_id % ${TextOps.ForgetMod} <> ${TextOps.ForgetRem})")},
         |overcap AS (SELECT h FROM fp GROUP BY h
         |            HAVING count(*) > $WinnowCap)
         |SELECT f.doc_id, f.h
         |FROM fp f LEFT JOIN overcap o ON f.h = o.h
         |WHERE o.h IS NULL
         |ORDER BY f.doc_id, f.h""".stripMargin,
    "d4_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
         |             list_distinct(list_transform($bgSql, s -> ${tokHashSql("s")})) AS hs
         |           FROM documents)
         |SELECT x.doc_id AS a, y.doc_id AS b, x.lang AS lang, x.source AS source,
         |       CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS inter_cnt,
         |       CAST(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)) AS BIGINT) AS union_cnt
         |FROM t x JOIN t y
         |  ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |ORDER BY a, b""".stripMargin,
    "d14_containment" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
         |             list_distinct(list_transform($bgSql, s -> ${tokHashSql("s")})) AS hs
         |           FROM documents)
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |       CAST(len(x.hs) AS BIGINT) AS size_a,
         |       CAST(len(y.hs) AS BIGINT) AS size_b,
         |       CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS inter_cnt,
         |       CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) / CAST(len(x.hs) AS DOUBLE) AS cont_a_in_b,
         |       CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) / CAST(len(y.hs) AS DOUBLE) AS cont_b_in_a,
         |       CAST(CASE WHEN CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) / CAST(len(x.hs) AS DOUBLE) >= 0.8
         |                   OR CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) / CAST(len(y.hs) AS DOUBLE) >= 0.8
         |                 THEN 1 ELSE 0 END AS INT) AS is_subset
         |FROM t x JOIN t y
         |  ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |WHERE len(x.hs) > 0 AND len(y.hs) > 0
         |ORDER BY a, b""".stripMargin,
    "d5_embed_neardup" ->
      s"""$d5CoreSql
         |ORDER BY vec_id""".stripMargin,
    "d6_dedup_clusters" -> d6OracleSql,
    // d6's oracle verbatim: the maintained at-rest assignment must equal
    // the full re-cluster bit-exactly (d13's star-contraction argument)
    "d29_clusters_atrest" -> d6OracleSql,
    // d30: build∘forget∘serve == d6's recursive closure over the
    // SURVIVORS — both FROM documents sites (the pair graph's docs
    // and the reach seed's singleton universe) subtract the cohort,
    // so the maintained table must hold exactly the split/shrunk/
    // relabeled components a survivor re-cluster produces
    "d30_clusters_forget" -> d6OracleSqlOver(
      s" WHERE doc_id % ${TextOps.ForgetMod} <> ${TextOps.ForgetRem}"),
    // d11 reuses the full d5 oracle verbatim as a CTE (drift-proof,
    // like d6 reuses d2) and states the components as the same
    // recursive transitive closure, seeded from embeddings vec_ids
    "d11_embed_clusters" ->
      s"""WITH RECURSIVE d5 AS (
         |$d5CoreSql
         |),
         |near AS (SELECT vec_id AS a, nn_id AS b FROM d5 WHERE is_near_dup = 1),
         |edges AS (SELECT a AS x, b AS y FROM near
         |          UNION SELECT b AS x, a AS y FROM near),
         |reach(src, node) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT r.src, e.y FROM reach r JOIN edges e ON r.node = e.x
         |)
         |SELECT src AS vec_id,
         |       min(node) AS cluster_id,
         |       CASE WHEN min(node) = src THEN 1 ELSE 0 END AS is_keeper
         |FROM reach GROUP BY src ORDER BY vec_id""".stripMargin,
    // d6b computes the SAME result by a different algorithm — identical
    // oracle, so the driver hash-gates both against one ground truth
    "d6b_star_clusters" -> d6OracleSql,
    // d13's star-contraction merge provably equals a full re-cluster,
    // so it shares that ground truth too
    "d13_incremental_clusters" -> d6OracleSql,
    "d7_incremental_dedup" ->
      s"""WITH h AS (SELECT doc_id,
         |             md5(array_to_string(${tokensSql("text")}[1:$HeadKeyTokens], ' ')) AS head_key
         |           FROM documents),
         |inc AS (SELECT doc_id, head_key,
         |               row_number() OVER (PARTITION BY head_key ORDER BY doc_id) AS rn
         |        FROM h WHERE doc_id % $IncomingMod = 0),
         |ex AS (SELECT DISTINCT head_key FROM h WHERE doc_id % $IncomingMod <> 0)
         |SELECT i.doc_id, i.head_key,
         |       CASE WHEN e.head_key IS NOT NULL THEN 'dup_of_corpus'
         |            WHEN i.rn > 1 THEN 'dup_in_batch'
         |            ELSE 'new' END AS verdict
         |FROM inc i LEFT JOIN ex e ON i.head_key = e.head_key
         |ORDER BY i.doc_id""".stripMargin,
    // d2's signature/band/verify machinery, restricted to incoming->
    // corpus candidate pairs and collapsed to one verdict per incoming
    // doc; counts cast to BIGINT (DuckDB sum(int) widens to HUGEINT)
    "d15_minhash_incremental" -> d15Sql,
    // same hashed-distinct-shingle contract as tx6/d2, at k=3; sums
    // cast to BIGINT (DuckDB sum(int) widens to HUGEINT)
    // the at-rest serves must be bit-identical to the text-side scans
    // they replace — oracle VERBATIM (the ir15 convention)
    "d22_decontam_atrest" -> d8Sql,
    "d23_leakage_atrest" -> d12Sql,
    "d24_bandpairs_atrest" -> d2Sql,
    "d25_bandprobe_atrest" -> d15Sql,
    "d8_decontaminate" -> d8Sql,
    "d12_split_leakage" -> d12Sql,
    // d7's head key + tx5's seeded-md5 bucket contract
    "d10_cluster_split" ->
      s"""WITH h AS (SELECT doc_id,
         |             md5(array_to_string(${tokensSql("text")}[1:$HeadKeyTokens], ' ')) AS cluster_key
         |           FROM documents)
         |SELECT doc_id, cluster_key,
         |       CAST(${md5LongSql("'split:' || cluster_key")} % 100 AS INT) AS split_bucket,
         |       CASE WHEN ${md5LongSql("'split:' || cluster_key")} % 100 < $SplitTrainPct THEN 'train'
         |            WHEN ${md5LongSql("'split:' || cluster_key")} % 100 < ${SplitTrainPct + SplitValPct} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin,
    // d7's head key + tx2's diversity numerator; count(*) OVER is
    // BIGINT on both engines, row_number ties broken by doc_id
    "d9_quality_keeper" ->
      s"""WITH h AS (SELECT doc_id,
         |             md5(array_to_string(${tokensSql("text")}[1:$HeadKeyTokens], ' ')) AS cluster_key,
         |             CAST(len(list_distinct(${tokensSql("text")})) AS BIGINT) AS score
         |           FROM documents)
         |SELECT doc_id, cluster_key, score,
         |       count(*) OVER (PARTITION BY cluster_key) AS cluster_sz,
         |       CASE WHEN row_number() OVER (PARTITION BY cluster_key
         |              ORDER BY score DESC, doc_id) = 1
         |            THEN 1 ELSE 0 END AS is_keeper
         |FROM h ORDER BY doc_id""".stripMargin,
    // x3's cell-assignment CTE with cent_cos kept; the prune predicate
    // restates the Spark filter verbatim (same fold, same tie-break)
    "d16_semdedup" -> s"$d16CoreSql\nORDER BY a.vec_id",
    "d17_winnowing" ->
      s"""WITH $d17FpCtesSql,
         |kept AS (SELECT doc_id, h FROM
         |           (SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS nd
         |            FROM fp)
         |         WHERE nd <= $WinnowCap),
         |cnt AS (SELECT doc_id, count(*) AS nfp FROM kept GROUP BY doc_id),
         |pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
         |          FROM kept x JOIN kept y
         |            ON x.h = y.h AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT a, b, n_shared, ca.nfp AS fp_a, cb.nfp AS fp_b,
         |       CAST(n_shared AS DOUBLE) / least(ca.nfp, cb.nfp) AS overlap
         |FROM pairs
         |JOIN cnt ca ON ca.doc_id = pairs.a
         |JOIN cnt cb ON cb.doc_id = pairs.b
         |ORDER BY a, b""".stripMargin,
    // d17's shared fp CTEs split on the d7/d15 snapshot modulus; the
    // cap is computed from CORPUS document frequency only (the frozen
    // index), and the batch carries no cap of its own
    "d18_winnowing_incremental" -> d18Sql,
    "d26_winnow_probe_atrest" -> d18Sql,
    "d19_winnowing_append" -> d19Sql,
    "d27_winnow_append_atrest" -> d19Sql,
    // the non-overlapping grid (stride == size, unlike tx14's);
    // first-occurrence = row_number over (doc_id, chunk_start), the
    // window twin of the Spark side's min(struct) owner; string_agg
    // skips the CASE's NULLs and coalesces to '' so the all-dropped
    // document hashes like Spark's empty array_join; sums cast to
    // BIGINT (DuckDB widens sum(int) to HUGEINT)
    "d20_substring_dedup" ->
      s"""WITH g AS (SELECT doc_id, CAST(start AS INT) AS chunk_start,
         |                  substring(text, start + 1, $CleanChunk) AS content
         |           FROM (SELECT doc_id, text,
         |                        unnest(generate_series(0, greatest(length(text) - 1, 0), $CleanChunk)) AS start
         |                 FROM documents)),
         |k AS (SELECT doc_id, chunk_start, content,
         |             CAST(length(content) AS BIGINT) AS cl,
         |             CASE WHEN row_number() OVER (PARTITION BY md5(content)
         |                    ORDER BY doc_id, chunk_start) = 1
         |                  THEN 1 ELSE 0 END AS kept
         |      FROM g)
         |SELECT doc_id,
         |       count(*) AS n_chunks,
         |       CAST(sum(kept) AS BIGINT) AS n_kept,
         |       CAST(sum(cl) AS BIGINT) AS orig_len,
         |       CAST(sum(CASE WHEN kept = 1 THEN cl ELSE 0 END) AS BIGINT) AS clean_len,
         |       md5(coalesce(string_agg(CASE WHEN kept = 1 THEN content END,
         |                               '' ORDER BY chunk_start), '')) AS clean_md5
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // d21: the full content-defined segmentation restated relationally —
    // d17's gram/window CTE style with the POSITION-bearing rightmost-min
    // rule (ORDER BY h, p DESC), list-built cut arrays, the d20 owner
    // rule at segment level, and gaps-and-islands for the run excision
    "d21_substring_cut" ->
      s"""WITH tk0 AS (SELECT doc_id, ${tokensSql("text")} AS gs_tk FROM documents),
         |tk AS (SELECT doc_id, gs_tk,
         |              ${shinglesSql("gs_tk", WinnowK)} AS gs
         |       FROM tk0),
         |g AS (SELECT doc_id, u.p AS p, ${tokHashSql("gs[u.p]")} AS h, len(gs) AS ng
         |      FROM tk, unnest(generate_series(1, len(gs))) AS u(p)),
         |sel AS (SELECT doc_id, p - o.o AS q, p, h
         |        FROM g, unnest(generate_series(0, ${CutWinnowW - 1})) AS o(o)
         |        WHERE p - o.o >= 1 AND p - o.o <= greatest(ng - ${CutWinnowW - 1}, 1)),
         |anch AS (SELECT DISTINCT doc_id, p FROM (
         |           SELECT doc_id, q, p,
         |                  row_number() OVER (PARTITION BY doc_id, q
         |                    ORDER BY h, p DESC) AS rn
         |           FROM sel)
         |         WHERE rn = 1),
         |cutl AS (SELECT t.doc_id, t.gs_tk AS tkk,
         |                list_sort(list_distinct(
         |                  coalesce(list(a.p - 1), []) || [0, len(t.gs_tk)])) AS cs
         |         FROM tk t LEFT JOIN anch a ON t.doc_id = a.doc_id
         |         GROUP BY t.doc_id, t.gs_tk),
         |segs AS (SELECT doc_id, i.i AS seg_idx, cs[i.i] AS s,
         |                CAST(cs[i.i + 1] - cs[i.i] AS BIGINT) AS slen,
         |                array_to_string(tkk[cs[i.i] + 1 : cs[i.i + 1]], ' ') AS seg_txt
         |         FROM cutl, unnest(generate_series(1, len(cs) - 1)) AS i(i)),
         |sd AS (SELECT doc_id, seg_idx, s, slen, seg_txt,
         |              CASE WHEN count(*) OVER (PARTITION BY md5(seg_txt)) >= 2
         |                    AND row_number() OVER (PARTITION BY md5(seg_txt)
         |                          ORDER BY doc_id, s) > 1
         |                   THEN 1 ELSE 0 END AS is_dup
         |       FROM segs),
         |isl AS (SELECT *, seg_idx - row_number() OVER (PARTITION BY doc_id, is_dup
         |                    ORDER BY seg_idx) AS grp
         |        FROM sd),
         |runs AS (SELECT doc_id, grp, sum(slen) AS run_len
         |         FROM isl WHERE is_dup = 1 GROUP BY doc_id, grp),
         |cutseg AS (SELECT i.doc_id, i.seg_idx, i.slen, i.seg_txt, i.is_dup,
         |                  CASE WHEN i.is_dup = 1 AND r.run_len >= $CutRunTokens
         |                       THEN 1 ELSE 0 END AS cut
         |           FROM isl i LEFT JOIN runs r
         |             ON i.doc_id = r.doc_id AND i.grp = r.grp AND i.is_dup = 1)
         |SELECT d.doc_id,
         |       CAST(count(c.seg_idx) AS BIGINT) AS n_segs,
         |       CAST(coalesce(sum(c.is_dup), 0) AS BIGINT) AS n_dup,
         |       CAST(coalesce(sum(c.cut), 0) AS BIGINT) AS n_cut,
         |       CAST(coalesce(sum(c.slen), 0) AS BIGINT) AS orig_tokens,
         |       CAST(coalesce(sum(CASE WHEN c.cut = 0 THEN c.slen ELSE 0 END), 0) AS BIGINT) AS clean_tokens,
         |       md5(coalesce(string_agg(CASE WHEN c.cut = 0 THEN c.seg_txt END,
         |                               ' ' ORDER BY c.seg_idx), '')) AS clean_md5
         |FROM documents d LEFT JOIN cutseg c ON d.doc_id = c.doc_id
         |GROUP BY d.doc_id
         |ORDER BY d.doc_id""".stripMargin)

  /** d17/d18's shared DuckDB fingerprint derivation: `fp(doc_id, h)` =
    * each document's DISTINCT winnowed word-[[WinnowK]]-gram hashes
    * (window of [[WinnowW]], rightmost-minimum tie rule via the
    * per-window-position min over the gram-position group). ONE
    * definition feeds both oracles so the selection can't drift. */
  /** d17's fingerprint CTEs over any document relation — `documents`
    * for d17/d18/d19/d26/d27, the survivor relation for d32's
    * post-forget kept dump. */
  private def d17FpCtesOver(rel: String): String =
    s"""g AS (
       |  SELECT doc_id, u.p AS p, ${tokHashSql("gs[u.p]")} AS h, len(gs) AS ng
       |  FROM (SELECT doc_id, ${shinglesSql(tokensSql("text"), WinnowK)} AS gs
       |        FROM $rel) dd,
       |       unnest(generate_series(1, len(gs))) AS u(p)),
       |sel AS (
       |  SELECT doc_id, p - o.o AS q, min(h) AS h
       |  FROM g, unnest(generate_series(0, ${WinnowW - 1})) AS o(o)
       |  WHERE p - o.o >= 1 AND p - o.o <= greatest(ng - ${WinnowW - 1}, 1)
       |  GROUP BY doc_id, p - o.o),
       |fp AS (SELECT DISTINCT doc_id, h FROM sel)""".stripMargin

  private lazy val d17FpCtesSql: String = d17FpCtesOver("documents")

  /** The d16 oracle body minus its presentation ORDER BY — c2 embeds
    * it as the semantic-dedup stage CTE (the d5→d11 convention: any
    * drift between d16's Spark program and its oracle surfaces in
    * d16's own row, and c2 stays consistent by construction). */
  private[operators] lazy val d16CoreSql: String =
    s"""WITH e AS (SELECT vec_id, embedding AS v,
       |                  sqrt(${dotDSql("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM e
       |          WHERE vec_id >= ${SimilarityOps.NumQueries}
       |            AND vec_id < ${SimilarityOps.NumQueries + SimilarityOps.NumCentroids}),
       |a AS (
       |  SELECT vec_id, v, nrm, cell_id, cent_cos
       |  FROM (SELECT e.vec_id, e.v, e.nrm, cents.cell_id,
       |               ${dotDSql("e.v", "cents.cv")} / (e.nrm * cents.cn) AS cent_cos
       |        FROM e CROSS JOIN cents)
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY cent_cos DESC, cell_id) = 1),
       |p AS (SELECT DISTINCT x.vec_id
       |      FROM a x JOIN a y
       |        ON x.cell_id = y.cell_id AND x.vec_id <> y.vec_id
       |      WHERE ${dotDSql("x.v", "y.v")} / (x.nrm * y.nrm) > $SemTau
       |        AND (y.cent_cos > x.cent_cos OR
       |             (y.cent_cos = x.cent_cos AND y.vec_id < x.vec_id)))
       |SELECT a.vec_id, a.cell_id, a.cent_cos,
       |       CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END AS is_pruned
       |FROM a LEFT JOIN p ON a.vec_id = p.vec_id""".stripMargin

  // d6 reuses the full d2 oracle verbatim as a CTE (drift-proof, like
  // x5) and states the components as a recursive transitive closure —
  // the UNION (not UNION ALL) in the recursive term is the fixpoint
  private lazy val d6OracleSql: String =
    s"""WITH RECURSIVE d2 AS (
       |${oraclesD2Body}
       |),
       |near AS (SELECT a, b FROM d2 WHERE is_near_dup = 1),
       |edges AS (SELECT a AS x, b AS y FROM near
       |          UNION SELECT b AS x, a AS y FROM near),
       |reach(src, node) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, e.y FROM reach r JOIN edges e ON r.node = e.x
       |)
       |SELECT src AS doc_id,
       |       min(node) AS cluster_id,
       |       CASE WHEN min(node) = src THEN 1 ELSE 0 END AS is_keeper
       |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  /** d6's closure over a filtered doc universe — BOTH `FROM documents`
    * sites (the d2 pair body's and the reach seed's) take the same
    * predicate, which is exactly the survivor semantics d30 serves. */
  private def d6OracleSqlOver(where: String): String =
    d6OracleSql.replace("FROM documents", s"FROM documents$where")
}
