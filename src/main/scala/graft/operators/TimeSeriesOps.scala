package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Time-series similarity search over the `events` table — per-user
  * daily activity series compared by EXACT INTEGER distance (builder
  * brief; theme from the retrieved corpus's "Time Series Similarity
  * Search for Streaming Data in Distributed Systems", EDBT 2019 — no
  * reference analog; the reference's closest shape is its per-key
  * stateful aggregation).
  *
  * Determinism: the series are integer count vectors on the shared day
  * grid (`tsMicros div DayMicros` == oracle `epoch_ns // DayNanos` —
  * the w-family contract), and the distance is squared-Euclidean over
  * those integers, so every compared value is exact integer arithmetic:
  * no float enters the output at all, the strongest form of the
  * engine's cross-engine contract.
  *
  * Sparse algebra instead of dense vectors: a user×day matrix at 100 TB
  * is mostly zeros, so SSE decomposes as
  * `Σ(cu−cp)² = Σcu² + Σcp² − 2·Σ cu·cp` — per-user self-energy from
  * one aggregate, the probe's energy a one-row broadcast, and the cross
  * term a broadcast join on the probe's ~30 day rows. Nothing
  * materializes a dense grid and no zero rows are ever generated.
  */
object TimeSeriesOps {

  /** ts1/ts2's probe entity. */
  val ProbeUser = 0L

  val TopK = 10

  /** ts2's motif length (the probe's trailing window, in days). */
  val MotifLen = 3

  /** The day-grid projection `ts → day index` — THE one definition of
    * "a day" for the whole ts family and its streaming fixtures (a
    * bucketing edit cannot desynchronize operators from the specs'
    * streamed state). */
  private[graft] def dayOf(ev: DataFrame): Column =
    expr(s"(${ScanOps.tsMicrosSql(ev)}) div ${WindowOps.DayMicros}")

  private[graft] def dayCounts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(col("user_id"), dayOf(ev).as("day"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The (user, day, cnt) collapse feeds 3 consumers in ts1 (energies,
    * probe, cross term) and 2 in ts2 — persist it so the events scan
    * and count shuffle run once (the d2-signature-table convention;
    * the harness clears the cache after each query, and at rest this
    * IS the persisted counts table). */
  private def cachedCounts(s: SparkSession, dir: String): DataFrame = {
    val c = dayCounts(s, dir)
    CacheScope.persist(c)
    c
  }

  /** TS1 — whole-series k-NN: the [[TopK]] users whose daily activity
    * series is nearest the probe user's by squared Euclidean distance
    * on the day grid. One (user, day) aggregate, one per-user energy
    * aggregate, the probe series broadcast onto the cross-term join,
    * and a TakeOrderedAndProject top-k — at 100 TB nothing shuffles
    * wider than the (user, day) count collapse. Output is all-integer
    * (sse, dot, energies, active-day counts). */
  def seriesKnn(s: SparkSession, dir: String): DataFrame =
    seriesKnnCore(cachedCounts(s, dir))

  /** ts1 over ANY (user_id, day, cnt) frame — the streaming twin serves
    * from the counts STATE a streaming aggregation maintains
    * (StreamingTimeSeriesSpec: standing state == batch collapse, and
    * serving from it reproduces ts1 exactly — integers throughout, so
    * this is equality, not tolerance). */
  private[graft] def seriesKnnCore(c: DataFrame): DataFrame = {
    val perUser = c.groupBy(col("user_id"))
      .agg(sum(col("cnt") * col("cnt")).as("sum_sq"),
        count(lit(1)).as("n_days"))
    val probe = c.filter(col("user_id") === ProbeUser)
      .select(col("day"), col("cnt").as("cp"))
    val probeEnergy = probe.agg(sum(col("cp") * col("cp")).as("sum_sq_p"))
    val dots = c.filter(col("user_id") =!= ProbeUser)
      .join(broadcast(probe), Seq("day"))
      .groupBy(col("user_id"))
      .agg(sum(col("cnt") * col("cp")).as("dot"))
    val top = perUser.filter(col("user_id") =!= ProbeUser)
      .join(dots, Seq("user_id"), "left")
      .withColumn("dot", coalesce(col("dot"), lit(0L)))
      .crossJoin(broadcast(probeEnergy))
      .withColumn("sse",
        col("sum_sq") + col("sum_sq_p") - lit(2L) * col("dot"))
      .orderBy(col("sse").asc, col("user_id")).limit(TopK)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sse").asc, col("user_id"))))
      .select(col("rank"), col("user_id"), col("sse"), col("dot"),
        col("sum_sq"), col("n_days"))
      .transform(Common.presented(_, col("rank")))
  }

  /** TS2 — motif (subsequence) search: the probe's TRAILING
    * [[MotifLen]]-day window slides over every user's series; per user
    * the best-aligned window (min SSE, earliest start on ties), then
    * the [[TopK]] users by that best score — the UCR-suite subsequence
    * query restated relationally. The slide is an offset EXPLODE
    * (each (user, day, cnt) row contributes to [[MotifLen]] candidate
    * starts), so the pair space is rows×MotifLen, never users×days²;
    * windows where the user has no events at all are skipped by
    * construction (their SSE is the motif's own energy — not a match
    * candidate). The sparse identity per window:
    * `sse = Σmᵢ² + Σ_{i: cnt>0} ((cnt−mᵢ)² − mᵢ²)`, all integers. */
  def motifMatch(s: SparkSession, dir: String): DataFrame = {
    val c = cachedCounts(s, dir)
    val probe = c.filter(col("user_id") === ProbeUser)
    val pMax = probe.agg(max(col("day")).as("pmax"))
    // motif position i = 0..MotifLen-1 maps to day pmax-(MotifLen-1-i);
    // absent probe days read as count 0
    val offs = s.range(MotifLen).select(col("id").cast("long").as("i"))
    val motif = offs
      .crossJoin(broadcast(pMax))
      .join(broadcast(probe.select(col("day"), col("cnt"))),
        col("day") === col("pmax") - (lit(MotifLen - 1) - col("i")), "left")
      .select(col("i"), coalesce(col("cnt"), lit(0L)).as("m"))
    val motifSq = motif.agg(sum(col("m") * col("m")).as("msq"))
    val windows = c.filter(col("user_id") =!= ProbeUser)
      .crossJoin(broadcast(motif))
      .withColumn("wstart", col("day") - col("i"))
      .groupBy(col("user_id"), col("wstart"))
      .agg(sum((col("cnt") - col("m")) * (col("cnt") - col("m")) -
        col("m") * col("m")).as("delta"))
    val best = windows
      .crossJoin(broadcast(motifSq))
      .withColumn("sse", col("msq") + col("delta"))
      .withColumn("brn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("sse").asc, col("wstart"))))
      .filter(col("brn") === 1)
      .select(col("user_id"), col("wstart").as("best_start"), col("sse"))
      .orderBy(col("sse").asc, col("user_id")).limit(TopK)
    best
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sse").asc, col("user_id"))))
      .select(col("rank"), col("user_id"), col("best_start"), col("sse"))
      .transform(Common.presented(_, col("rank")))
  }

  /** ts3's lag range (days). */
  val MaxLag = 7

  /** TS3 — seasonality probe: per event_type, the raw lag-ℓ
    * autocovariance numerator `Σ c(d)·c(d+ℓ)` of the GLOBAL daily count
    * series for ℓ = 1..[[MaxLag]], with the per-type peak lag flagged —
    * the weekly-rhythm detector a monitoring pipeline runs over its
    * metric streams. Raw (uncentered) products keep every compared
    * value integer (the centered/normalized form divides by variance —
    * a consumer-side step, the tx12 discipline); the peak flag is an
    * integer max comparison with smallest-lag tie-break. The daily
    * collapse (|types|×|days| rows) is the only wide aggregate; the
    * lag self-join runs on that collapsed frame, so cost is
    * independent of event volume. */
  /** The per-(event_type, day) daily collapse — ONE definition shared
    * by ts3's seasonality and ts7's changepoint (a day-bucketing edit
    * cannot desynchronize them), persisted because ts3 reads it twice
    * and a same-session ts7 reuses the cached plan. */
  private def cachedTypeDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = ev.select(col("event_type"), dayOf(ev).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    CacheScope.persist(daily)
    daily
  }

  def seasonality(s: SparkSession, dir: String): DataFrame =
    seasonalityCore(cachedTypeDaily(s, dir))

  /** ts3 over ANY (event_type, day, cnt) frame — the per-type daily
    * counts are streaming-aggregation state exactly like ts1's
    * per-user counts, and this core serves from that standing state
    * unchanged (StreamingTimeSeriesSpec). */
  private[graft] def seasonalityCore(daily: DataFrame): DataFrame = {
    // equi-join on (event_type, day+lag): the shifted day is a computed
    // key column, so Catalyst plans a hash join — never a per-type
    // cross of the day grid
    val lagged = daily
      .select(col("event_type"), col("cnt"),
        explode(sequence(lit(1), lit(MaxLag))).as("lag"),
        col("day"))
      .withColumn("day2", col("day") + col("lag"))
      .join(daily.select(col("event_type"), col("day").as("day2"),
          col("cnt").as("cnt2")),
        Seq("event_type", "day2"))
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(col("cnt") * col("cnt2")).as("rnum"),
        count(lit(1)).as("n_pairs"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("rnum").desc, col("lag"))
    lagged
      .withColumn("is_peak",
        when(row_number().over(w) === 1, 1).otherwise(0))
      .select(col("event_type"), col("lag").cast("int").as("lag"),
        col("rnum"), col("n_pairs"), col("is_peak"))
      .transform(Common.presented(_, col("event_type"), col("lag")))
  }

  /** SAX geometry (ts4/ts5): [[NumSegs]] segments of [[SegDays]] days
    * each, segment activity quantized to 3 symbols {1,2,3} by the
    * integer breakpoints [[BpMid]]/[[BpHigh]] (picked at the observed
    * tertiles of per-segment activity so symbols spread; 0 is reserved
    * for an absent segment). A user's SAX word packs the [[NumSegs]]
    * symbols 2 bits apiece into ONE BIGINT — integer arithmetic both
    * engines shift identically, no string aggregation, and absent
    * segments contribute 0 without ever materializing a day grid. */
  val NumSegs = 4
  val SegDays = 8
  val BpMid = 14L
  val BpHigh = 19L

  /** Per-user (word, n_active_segs) over any (user_id, day, cnt) frame.
    * ONE hash shuffle on user_id: the [[NumSegs]] segment sums are
    * stated as conditional aggregates of a single groupBy(user) (the
    * x8 fold-the-pivot-into-the-agg trick — a (user, seg) pre-aggregate
    * would spend a second exchange re-keying to user), and the
    * symbol/packing arithmetic runs on the aggregated row with STATIC
    * shift amounts. An absent segment's sum is NULL → symbol 0. */
  private[graft] def saxWords(c: DataFrame): DataFrame =
    saxWordsWith(c, c.agg(min(col("day")).as("d0")))

  /** [[saxWords]] with the day-grid origin passed in — the ts5 probe
    * side aggregates ONLY the probe user's rows but must share the
    * GLOBAL origin, or its segments would shift. */
  private[graft] def saxWordsWith(c: DataFrame, dmin: DataFrame): DataFrame = {
    def segSum(i: Int) =
      sum(when(col("seg") === i, col("cnt"))).as(s"s$i")
    def sym(i: Int): Column =
      when(col(s"s$i") >= BpHigh, lit(3L))
        .when(col(s"s$i") >= BpMid, lit(2L))
        .when(col(s"s$i").isNotNull, lit(1L)).otherwise(lit(0L))
    c.crossJoin(broadcast(dmin))
      .select(col("user_id"),
        expr(s"(day - d0) div $SegDays").as("seg"), col("cnt"))
      .filter(col("seg") < NumSegs)
      .groupBy(col("user_id"))
      .agg(segSum(0), (1 until NumSegs).map(segSum): _*)
      .select(col("user_id"),
        (0 until NumSegs).map(i => sym(i) * (1L << (2 * i)))
          .reduce(_ + _).as("word"),
        (0 until NumSegs).map(i =>
          when(col(s"s$i").isNotNull, 1L).otherwise(0L))
          .reduce(_ + _).as("n_active_segs"))
  }

  /** TS4 — SAX symbolic index over the per-user daily series (PAA →
    * breakpoint quantization → word, Lin/Keogh's SAX restated on
    * integer segment SUMS so every value is exact): each user's series
    * collapses to a [[NumSegs]]-symbol word packed into one BIGINT, and
    * the word IS the index key — users sharing a word are
    * coarse-profile equals, the time-series twin of x2's LSH bucket /
    * d3's simhash band. A user active ONLY beyond the indexed window
    * (every day clips at seg ≥ [[NumSegs]]) has no word row — not
    * active in the window means not indexed, on both engines
    * (fuzz-pinned). Output: each user's word, active-segment count,
    * the word's bucket occupancy, and whether the user shares the probe
    * user's bucket. At 100 TB the index build is two keyed integer
    * aggregates over the counts collapse (nothing wider than ts1's
    * first shuffle), and the words table it emits is ~16 bytes/user —
    * the standing index ts5 probes. */
  def saxIndex(s: SparkSession, dir: String): DataFrame = {
    val words = saxWords(cachedCounts(s, dir))
    val probe = words.filter(col("user_id") === ProbeUser)
      .select(col("word").as("pw"))
    // bucket occupancy as a window count over the word partition — one
    // exchange on word, where a groupBy(word)+join-back would shuffle
    // the words twice
    words
      .withColumn("n_bucket", count(lit(1)).over(
        Window.partitionBy(col("word"))))
      .crossJoin(broadcast(probe))
      .select(col("user_id"), col("word"), col("n_active_segs"),
        col("n_bucket"),
        when(col("word") === col("pw"), lit(1)).otherwise(lit(0))
          .as("is_probe_bucket"))
      .transform(Common.presented(_, col("user_id")))
  }

  /** The ts5 band keys: word with symbol position b (2 bits) zeroed,
    * for b = 0..[[NumSegs]]-1 — two users share a band key iff their
    * words agree on every OTHER position, i.e. symbol-Hamming ≤ 1
    * (d3b's pigeonhole argument on the SAX alphabet). */
  private def bandKeys(words: DataFrame): DataFrame =
    words.select(col("user_id"),
        explode(sequence(lit(0), lit(NumSegs - 1))).as("b"), col("word"))
      .select(col("user_id"), col("b"),
        expr("word - shiftleft(shiftright(word, cast(2 * b as int)) & 3, " +
          "cast(2 * b as int))").as("bk"))

  /** TS5 — k-NN SERVED FROM the SAX index: candidates are the users
    * within symbol-Hamming 1 of the probe's word (the banded join over
    * [[bandKeys]] — exact by pigeonhole, never a scan of the user
    * space), then the exact integer SSE of ts1 verifies and ranks ONLY
    * those candidates. The x2/x3 index-serve discipline transplanted to
    * time series: the index prunes, the exact distance decides, and the
    * verify cost scales with the bucket, not the population. Same
    * output shape as ts1 restricted to the candidate set, so the two
    * are directly comparable: every ts5 row's sse equals its ts1 twin
    * for the same user (TimeSeriesSpec pins it). */
  def saxKnn(s: SparkSession, dir: String): DataFrame =
    saxKnnCore(s, cachedCounts(s, dir))

  /** ts5 over ANY (user_id, day, cnt) frame — like [[seriesKnnCore]],
    * the streaming twin serves from the standing counts STATE
    * (StreamingTimeSeriesSpec: index + verify from streamed state ==
    * the batch rule, exactly). */
  private[graft] def saxKnnCore(s: SparkSession, c: DataFrame): DataFrame = {
    // the probe's word aggregates ONLY its own ~30 count rows (global
    // grid origin shared via dmin); the full saxWords pass runs once,
    // on the non-probe side
    val dmin = c.agg(min(col("day")).as("d0"))
    val cand = bandKeys(saxWordsWith(c.filter(col("user_id") =!= ProbeUser), dmin))
      .join(broadcast(
        bandKeys(saxWordsWith(c.filter(col("user_id") === ProbeUser), dmin))
          .select(col("b"), col("bk"))), Seq("b", "bk"))
      .select(col("user_id")).distinct()
    // the verify core reads its counts frame three times (energies,
    // probe slice, cross term); PERSISTING the candidate-restricted
    // counts (tiny: |bucket|×~30 rows) makes the index pipeline run
    // ONCE at materialization — without it each consumer re-expands
    // the whole band-join subtree into its own AQE broadcast build
    // (measured: 23 independent broadcast compilations, ~3.4 s at
    // sf0.1 vs ~1.1 s persisted). The d2-signature-table convention;
    // the harness clears the cache after each query.
    val cc = c.join(broadcast(cand.unionByName(
        s.range(1).select(lit(ProbeUser).as("user_id")))), Seq("user_id"))
    CacheScope.persist(cc)
    seriesKnnCore(cc)
  }

  /** TS6 — lead/lag alignment: for every user, the shift ℓ ∈
    * ±[[MaxLag]] days that best aligns their activity with the probe
    * user's, by the raw cross-covariance `r(ℓ) = Σ_d c_u(d)·c_p(d+ℓ)`
    * — "who moves with the probe, and who moves N days before/after
    * it" (ts3's autocovariance turned cross-user; the uncentered
    * integer form for the same tx12 reason). The probe's series
    * explodes to its (day−ℓ, cp, ℓ) alignment table — ~days×(2L+1)
    * rows, BROADCAST — so the per-user work is one broadcast join on
    * the computed day key plus one (user, lag) aggregate; no user×user
    * pair space, no dense grid, cost independent of the population
    * beyond the counts collapse. Best lag per user by (dot desc,
    * |lag|, lag) — the zero-shift reading wins ties. Output covers
    * users with ≥1 overlapping active day in the window (no overlap →
    * no alignment evidence → no row, matching the join semantics on
    * both engines). */
  def leadLag(s: SparkSession, dir: String): DataFrame =
    leadLagCore(cachedCounts(s, dir))

  /** ts6 over ANY (user_id, day, cnt) frame — the third serving path
    * off the standing counts state (StreamingTimeSeriesSpec binds it
    * beside ts1/ts5). */
  private[graft] def leadLagCore(c: DataFrame): DataFrame = {
    val probe = c.filter(col("user_id") === ProbeUser)
      .select(col("day").as("pd"), col("cnt").as("cp"))
    val aligned = probe
      .select(col("pd"), col("cp"),
        explode(sequence(lit(-MaxLag), lit(MaxLag))).as("lag"))
      .select((col("pd") - col("lag")).as("day"), col("cp"), col("lag"))
    val dots = c.filter(col("user_id") =!= ProbeUser)
      .join(broadcast(aligned), Seq("day"))
      .groupBy(col("user_id"), col("lag"))
      .agg(sum(col("cnt") * col("cp")).as("dot"),
        count(lit(1)).as("n_overlap"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("dot").desc, abs(col("lag")), col("lag"))
    dots.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("lag").cast("int").as("best_lag"),
        col("dot").as("best_dot"), col("n_overlap"))
      .transform(Common.presented(_, col("user_id")))
  }

  /** TS7 — CUSUM changepoint detection, integer-exact: per event_type,
    * the day where the cumulative deviation of the daily count from the
    * series mean peaks in magnitude — "when did this metric's level
    * shift" (Page's CUSUM, the classic monitoring changepoint
    * statistic, over ts3's daily collapse). The mean is a DIVISION, so
    * the statistic is restated scaled by the day count N:
    * `cusum_scaled(d) = Σ_{d'≤d} (N·cnt(d') − total)` — exactly
    * N·(classic CUSUM), same argmax, every value an exact integer (the
    * tx12 discipline: the consumer divides by N·1 if it wants the
    * classic units). Peak by (|cusum| desc, day asc). Days with no
    * events contribute deviation −total — the relational form never
    * materializes them, so the statistic is defined over the ACTIVE-day
    * sequence (both engines state the same rule). One daily collapse +
    * one per-type window cumsum + one peak aggregate; at 100 TB only
    * the collapse sees event volume (|types|×|days| rows after). */
  def changepoint(s: SparkSession, dir: String): DataFrame =
    changepointCore(cachedTypeDaily(s, dir))

  /** ts7 over ANY (event_type, day, cnt) frame — serves from the same
    * standing daily-counts state as [[seasonalityCore]]. */
  private[graft] def changepointCore(daily: DataFrame): DataFrame = {
    val stats = Window.partitionBy(col("event_type"))
    val cum = Window.partitionBy(col("event_type"))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("day"))
    daily
      .withColumn("n_days", count(lit(1)).over(stats))
      .withColumn("total", sum(col("cnt")).over(stats))
      .withColumn("cusum",
        sum(col("cnt") * col("n_days") - col("total")).over(cum))
      .withColumn("rn", row_number().over(peak))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("peak_day"),
        col("cusum").as("peak_cusum"), col("n_days"), col("total"))
      .transform(Common.presented(_, col("event_type")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts1_series_knn" -> (seriesKnn _),
    "ts2_motif_match" -> (motifMatch _),
    "ts3_seasonality" -> (seasonality _),
    "ts4_sax_index" -> (saxIndex _),
    "ts5_sax_knn" -> (saxKnn _),
    "ts6_lead_lag" -> (leadLag _),
    "ts7_changepoint" -> (changepoint _),
    "ts8_sax_discord" -> (saxDiscord _))

  /** ts8's window geometry and DAY-level breakpoints (the segment
    * breakpoints [[BpMid]]/[[BpHigh]] quantize 8-day sums; discord
    * windows quantize single days — observed day counts run 1..10
    * with median 2 at every harness SF, so 3/5 splits the occupied
    * range into three live symbols; 0 = inactive day). */
  val DiscordLen = 3
  val DayBpMid = 3L
  val DayBpHigh = 5L

  /** TS8 — SAX DISCORD ranking (the HOT SAX outer heuristic, Keogh,
    * Lin & Fu 2005): every [[DiscordLen]]-day sliding window of every
    * user's series collapses to a SAX word (per-day symbols, integer
    * breakpoints), and windows are ranked by how RARE their word is
    * corpus-wide — rarest first. That word-occupancy ordering is
    * exactly the published discord candidate order ("subsequences with
    * the least-frequent words first"); the exact-distance verify that
    * HOT SAX runs over candidates is ts5's banded-SSE machinery,
    * composable downstream. All-integer (counts, words, occupancies),
    * so the ranking is bit-stable across engines. Windows with no
    * active day are not indexed (ts4's not-active-not-indexed rule);
    * ties break (word, user, wstart) for determinism.
    *
    * 100 TB plan: SPARSE window generation — each active (user, day)
    * count row explodes to its ≤ [[DiscordLen]] covering windows
    * (slot = offset, no range join), so row volume is
    * activity × L, never users × calendar (the dense-grid anti-shape
    * the ts-family header bans). One (user, wstart) collapse, one
    * word-keyed exchange over the COLLAPSED window rows for
    * occupancy, and the top-k is TakeOrderedAndProject. The word
    * table is the standing artifact: a streaming ingest maintains the
    * (user, wstart, word) rows incrementally (day counts are
    * associative) and re-ranks occupancy per batch. */
  def saxDiscord(s: SparkSession, dir: String): DataFrame =
    saxDiscordCore(cachedCounts(s, dir))

  private[graft] def saxDiscordCore(c: DataFrame): DataFrame = {
    val bounds = c.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val slots = c.crossJoin(broadcast(bounds))
      .select(col("user_id"), (col("day") - col("d0")).as("rel"),
        (col("d1") - col("d0")).as("span"), col("cnt"))
      .select(col("user_id"), col("rel"), col("span"), col("cnt"),
        explode(sequence(lit(0), lit(DiscordLen - 1))).as("off"))
      .select(col("user_id"), (col("rel") - col("off")).as("wstart"),
        col("span"), col("off"), col("cnt"))
      .filter(col("wstart") >= 0 &&
        col("wstart") <= col("span") - (DiscordLen - 1))
    def slotSum(i: Int) =
      sum(when(col("off") === i, col("cnt"))).as(s"c$i")
    def sym(i: Int): Column =
      when(col(s"c$i") >= DayBpHigh, lit(3L))
        .when(col(s"c$i") >= DayBpMid, lit(2L))
        .when(col(s"c$i").isNotNull, lit(1L)).otherwise(lit(0L))
    val words = slots.groupBy(col("user_id"), col("wstart"))
      .agg(slotSum(0), (1 until DiscordLen).map(slotSum): _*)
      .select(Seq(col("user_id"), col("wstart"),
        (0 until DiscordLen).map(i => sym(i) * (1L << (2 * i)))
          .reduce(_ + _).as("word")) ++
        (0 until DiscordLen).map(i =>
          coalesce(col(s"c$i"), lit(0L)).as(s"c$i")): _*)
    val ord = Seq(col("n_bucket"), col("word"), col("user_id"), col("wstart"))
    words
      .withColumn("n_bucket", count(lit(1)).over(
        Window.partitionBy(col("word"))))
      .orderBy(ord: _*).limit(TopK)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
      .select(Seq(col("rank"), col("user_id"), col("wstart"), col("word"),
        col("n_bucket")) ++
        (0 until DiscordLen).map(i => col(s"c$i")): _*)
      .transform(Common.presented(_, col("rank")))
  }

  private def daySql = s"epoch_ns(ts) // ${WindowOps.DayNanos}"

  /** Shared ts4/ts5 oracle prefix: counts → segments → symbols → packed
    * words (the SQL twin of [[saxWords]]). */
  private val saxWordSql =
    s"""c AS (SELECT user_id, $daySql AS day, count(*) AS cnt
       |           FROM events GROUP BY user_id, ($daySql)),
       |dmin AS (SELECT min(day) AS d0 FROM c),
       |seg AS (SELECT user_id, (day - d0) // $SegDays AS seg,
       |               CAST(sum(cnt) AS BIGINT) AS ssum
       |        FROM c, dmin WHERE (day - d0) // $SegDays < $NumSegs
       |        GROUP BY user_id, (day - d0) // $SegDays),
       |sym AS (SELECT user_id, seg,
       |               CASE WHEN ssum >= $BpHigh THEN 3
       |                    WHEN ssum >= $BpMid THEN 2 ELSE 1 END AS s
       |        FROM seg),
       |words AS (SELECT user_id,
       |                 CAST(sum(s * (CAST(1 AS BIGINT) << CAST(2 * seg AS INT))) AS BIGINT) AS word,
       |                 count(*) AS n_active_segs
       |          FROM sym GROUP BY user_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // ts8: sparse window generation restated via the offset unnest;
    // every compared value is integer (words, counts, occupancies)
    "ts8_sax_discord" -> {
      val symSql = (i: Int) =>
        s"CASE WHEN c$i >= $DayBpHigh THEN 3 WHEN c$i >= $DayBpMid THEN 2 " +
          s"WHEN c$i IS NOT NULL THEN 1 ELSE 0 END"
      val slotSums = (0 until DiscordLen).map(i =>
        s"CAST(sum(CASE WHEN off = $i THEN cnt END) AS BIGINT) AS c$i")
        .mkString(",\n       |               ")
      s"""WITH c AS (SELECT user_id, $daySql AS day, count(*) AS cnt
         |           FROM events GROUP BY user_id, ($daySql)),
         |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM c),
         |sl AS (SELECT user_id, (day - d0) - u.off AS wstart,
         |              CAST(u.off AS INT) AS off, cnt
         |       FROM c, b, unnest(range($DiscordLen)) AS u(off)
         |       WHERE (day - d0) - u.off >= 0
         |         AND (day - d0) - u.off <= (d1 - d0) - ${DiscordLen - 1}),
         |w AS (SELECT user_id, wstart,
         |               $slotSums
         |      FROM sl GROUP BY user_id, wstart),
         |w2 AS (SELECT user_id, wstart,
         |              CAST(${(0 until DiscordLen)
                  .map(i => s"(${symSql(i)}) * ${1L << (2 * i)}")
                  .mkString(" + ")} AS BIGINT) AS word,
         |              ${(0 until DiscordLen)
                  .map(i => s"coalesce(c$i, 0) AS c$i").mkString(", ")}
         |       FROM w),
         |w3 AS (SELECT *, count(*) OVER (PARTITION BY word) AS n_bucket
         |       FROM w2),
         |top AS (SELECT * FROM w3
         |        ORDER BY n_bucket, word, user_id, wstart LIMIT $TopK)
         |SELECT CAST(row_number() OVER (ORDER BY n_bucket, word, user_id,
         |              wstart) AS INT) AS rank,
         |       user_id, wstart, word, n_bucket,
         |       ${(0 until DiscordLen).map(i => s"c$i").mkString(", ")}
         |FROM top ORDER BY rank""".stripMargin
    },
    "ts7_changepoint" ->
      s"""WITH daily AS (SELECT event_type, $daySql AS day, count(*) AS cnt
         |               FROM events GROUP BY event_type, ($daySql)),
         |st AS (SELECT *, count(*) OVER (PARTITION BY event_type) AS n_days,
         |              CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
         |                AS total
         |       FROM daily),
         |cu AS (SELECT *, CAST(sum(cnt * n_days - total)
         |                       OVER (PARTITION BY event_type ORDER BY day
         |                             ROWS BETWEEN UNBOUNDED PRECEDING
         |                             AND CURRENT ROW) AS BIGINT) AS cusum
         |       FROM st)
         |SELECT event_type, day AS peak_day, cusum AS peak_cusum,
         |       n_days, total
         |FROM cu
         |QUALIFY row_number() OVER (PARTITION BY event_type
         |                           ORDER BY abs(cusum) DESC, day) = 1
         |ORDER BY event_type""".stripMargin,
    "ts6_lead_lag" ->
      s"""WITH c AS (SELECT user_id, $daySql AS day, count(*) AS cnt
         |           FROM events GROUP BY user_id, ($daySql)),
         |aligned AS (SELECT pd - lag AS day, cp, lag
         |            FROM (SELECT day AS pd, cnt AS cp FROM c
         |                  WHERE user_id = $ProbeUser) p
         |            CROSS JOIN (SELECT CAST(unnest(range(-$MaxLag, ${MaxLag + 1})) AS BIGINT) AS lag) l),
         |dots AS (SELECT user_id, lag,
         |                CAST(sum(cnt * cp) AS BIGINT) AS dot,
         |                count(*) AS n_overlap
         |         FROM c JOIN aligned USING (day)
         |         WHERE user_id <> $ProbeUser
         |         GROUP BY user_id, lag)
         |SELECT user_id, CAST(lag AS INT) AS best_lag, dot AS best_dot,
         |       n_overlap
         |FROM dots
         |QUALIFY row_number() OVER (PARTITION BY user_id
         |                           ORDER BY dot DESC, abs(lag), lag) = 1
         |ORDER BY user_id""".stripMargin,
    "ts4_sax_index" ->
      s"""WITH $saxWordSql,
         |b AS (SELECT word, count(*) AS n_bucket FROM words GROUP BY word),
         |p AS (SELECT word AS pw FROM words WHERE user_id = $ProbeUser)
         |SELECT user_id, word, n_active_segs, n_bucket,
         |       CASE WHEN word = pw THEN 1 ELSE 0 END AS is_probe_bucket
         |FROM words JOIN b USING (word), p
         |ORDER BY user_id""".stripMargin,
    "ts5_sax_knn" ->
      s"""WITH $saxWordSql,
         |bands AS (SELECT user_id, b,
         |                 word - (((word >> CAST(2 * b AS INT)) & 3)
         |                         << CAST(2 * b AS INT)) AS bk
         |          FROM words,
         |               (SELECT CAST(unnest(range($NumSegs)) AS BIGINT) AS b) bb),
         |cand AS (SELECT DISTINCT x.user_id FROM bands x
         |         JOIN bands pb ON pb.user_id = $ProbeUser
         |                      AND x.b = pb.b AND x.bk = pb.bk
         |         WHERE x.user_id <> $ProbeUser),
         |cc AS (SELECT * FROM c
         |       WHERE user_id IN (SELECT user_id FROM cand)
         |          OR user_id = $ProbeUser),
         |pu AS (SELECT user_id, CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq,
         |              count(*) AS n_days
         |       FROM cc GROUP BY user_id),
         |probe AS (SELECT day, cnt AS cp FROM cc WHERE user_id = $ProbeUser),
         |pe AS (SELECT CAST(sum(cp * cp) AS BIGINT) AS sum_sq_p FROM probe),
         |dots AS (SELECT user_id, CAST(sum(cnt * cp) AS BIGINT) AS dot
         |         FROM cc JOIN probe USING (day)
         |         WHERE user_id <> $ProbeUser GROUP BY user_id),
         |f AS (SELECT pu.user_id, coalesce(dot, 0) AS dot, sum_sq, n_days,
         |             sum_sq + sum_sq_p - 2 * coalesce(dot, 0) AS sse
         |      FROM pu LEFT JOIN dots ON dots.user_id = pu.user_id, pe
         |      WHERE pu.user_id <> $ProbeUser),
         |top AS (SELECT * FROM f ORDER BY sse ASC, user_id LIMIT $TopK)
         |SELECT CAST(row_number() OVER (ORDER BY sse ASC, user_id) AS INT) AS rank,
         |       user_id, sse, dot, sum_sq, n_days
         |FROM top ORDER BY rank""".stripMargin,
    "ts1_series_knn" ->
      s"""WITH c AS (SELECT user_id, $daySql AS day, count(*) AS cnt
         |           FROM events GROUP BY user_id, ($daySql)),
         |pu AS (SELECT user_id, CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq,
         |              count(*) AS n_days
         |       FROM c GROUP BY user_id),
         |probe AS (SELECT day, cnt AS cp FROM c WHERE user_id = $ProbeUser),
         |pe AS (SELECT CAST(sum(cp * cp) AS BIGINT) AS sum_sq_p FROM probe),
         |dots AS (SELECT user_id, CAST(sum(cnt * cp) AS BIGINT) AS dot
         |         FROM c JOIN probe USING (day)
         |         WHERE user_id <> $ProbeUser GROUP BY user_id),
         |f AS (SELECT pu.user_id, coalesce(dot, 0) AS dot, sum_sq, n_days,
         |             sum_sq + sum_sq_p - 2 * coalesce(dot, 0) AS sse
         |      FROM pu LEFT JOIN dots ON dots.user_id = pu.user_id, pe
         |      WHERE pu.user_id <> $ProbeUser),
         |top AS (SELECT * FROM f ORDER BY sse ASC, user_id LIMIT $TopK)
         |SELECT CAST(row_number() OVER (ORDER BY sse ASC, user_id) AS INT) AS rank,
         |       user_id, sse, dot, sum_sq, n_days
         |FROM top ORDER BY rank""".stripMargin,
    "ts3_seasonality" ->
      s"""WITH daily AS (SELECT event_type, $daySql AS day, count(*) AS cnt
         |               FROM events GROUP BY event_type, ($daySql)),
         |lagged AS (SELECT a.event_type, l.lag,
         |                  CAST(sum(a.cnt * b.cnt) AS BIGINT) AS rnum,
         |                  count(*) AS n_pairs
         |           FROM daily a
         |           CROSS JOIN (SELECT CAST(unnest(range(1, ${MaxLag + 1})) AS BIGINT) AS lag) l
         |           JOIN daily b ON b.event_type = a.event_type
         |                       AND b.day = a.day + l.lag
         |           GROUP BY a.event_type, l.lag)
         |SELECT event_type, CAST(lag AS INT) AS lag, rnum, n_pairs,
         |       CASE WHEN row_number() OVER (PARTITION BY event_type
         |                                    ORDER BY rnum DESC, lag) = 1
         |            THEN 1 ELSE 0 END AS is_peak
         |FROM lagged ORDER BY event_type, lag""".stripMargin,
    "ts2_motif_match" ->
      s"""WITH c AS (SELECT user_id, $daySql AS day, count(*) AS cnt
         |           FROM events GROUP BY user_id, ($daySql)),
         |probe AS (SELECT day, cnt FROM c WHERE user_id = $ProbeUser),
         |pm AS (SELECT max(day) AS pmax FROM probe),
         |offs AS (SELECT CAST(unnest(range($MotifLen)) AS BIGINT) AS i),
         |motif AS (SELECT i, CAST(coalesce(cnt, 0) AS BIGINT) AS m
         |          FROM (SELECT i, pmax - (${MotifLen - 1} - i) AS md
         |                FROM offs, pm) o
         |          LEFT JOIN probe ON probe.day = o.md),
         |msq AS (SELECT CAST(sum(m * m) AS BIGINT) AS msq FROM motif),
         |win AS (SELECT user_id, day - i AS wstart,
         |               CAST(sum((cnt - m) * (cnt - m) - m * m) AS BIGINT) AS delta
         |        FROM c CROSS JOIN motif
         |        WHERE user_id <> $ProbeUser
         |        GROUP BY user_id, day - i),
         |best AS (SELECT user_id, wstart AS best_start, msq + delta AS sse
         |         FROM win, msq
         |         QUALIFY row_number() OVER (PARTITION BY user_id
         |                                    ORDER BY msq + delta ASC, wstart) = 1),
         |top AS (SELECT * FROM best ORDER BY sse ASC, user_id LIMIT $TopK)
         |SELECT CAST(row_number() OVER (ORDER BY sse ASC, user_id) AS INT) AS rank,
         |       user_id, best_start, sse
         |FROM top ORDER BY rank""".stripMargin)
}
