package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Shared maintenance for the bucket-partitioned at-rest index
  * layouts. Every maintained family (postings, positional, shingle,
  * bands, winnow, SAX, z-order, vector cells) appends ≥1 new data
  * file per touched bucket per batch, so a daily-ingest deployment
  * accretes small files until reads pay per-file open cost — the
  * bin-pack here is ir19's compaction (RetrievalOps) extracted so the
  * identical pass applies to EVERY family instead of being
  * re-implemented per layout (SCALE.md's admitted gap, closed):
  * AFFECTED buckets (more data files than `targetFiles`) are read
  * with a STATIC partition predicate (only their directories are
  * listed), repartitioned so each bucket lands as ONE file, staged
  * beside the table, and written back with DYNAMIC partition
  * overwrite — untouched buckets' files are never rewritten
  * (CompactionSpec pins their file sets byte-identical per family).
  *
  * Restart-safe without a log (the crash points are spec-exercised,
  * not just argued): a crash BEFORE the staging write changes
  * nothing; a crash BETWEEN staging and the overwrite reruns from the
  * top (staging rebuilds from the intact table); a crash MID-
  * overwrite leaves some buckets compacted (1 file — the rerun's
  * listing skips them) and some not (still >targetFiles — the rerun
  * re-stages exactly those), and every replaced partition holds the
  * same rows it held before, so a serve at ANY intermediate state
  * answers exactly what it answered before compaction began.
  */
object AtRest {

  /** The filesystem of `path` — resolved from the path, NOT the
    * default FS (they differ when the index lives on an object
    * store). */
  private[graft] def fsOf(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Run INDEPENDENT maintenance chains concurrently (guide §2.6:
    * Spark's scheduler happily overlaps jobs submitted from several
    * threads — actions are only sequential because driver code calls
    * them sequentially). The at-rest verbs are chains of small
    * fixed-cost jobs over disjoint tables (postings metadata vs
    * doclen/consts; the clusters vs members projections; docsets vs
    * bands), so overlapping the independent chains cuts a verb's wall
    * by roughly the shorter chain, and the tail of one chain's stages
    * back-fills cores the other frees. Callers guarantee the chains
    * touch DISJOINT outputs and that any frame a chain reads from a
    * table the other replaces is pinned (localCheckpoint) before this
    * call — the same self-read discipline the serial forms already
    * follow. Failures rethrow their original exception at the join,
    * after every chain has settled (no torn half-verb beyond what the
    * serial form's crash contract already covers — each family's heal
    * recounts from the base of record either way). */
  private[graft] def inParallel(work: (() => Unit)*): Unit = {
    if (work.sizeIs <= 1) { work.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(work.size)
    try {
      val futs = work.map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = w()
        })
      }
      var firstFailure: Throwable = null
      futs.foreach { f =>
        try { f.get(); () }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure == null) firstFailure = e.getCause
        }
      }
      if (firstFailure != null) throw firstFailure
    } finally { pool.shutdown(); () }
  }

  /** Data files per bucket partition of a partitioned table —
    * driver-side FS listing, O(#files) layout metadata (the same
    * bookkeeping a table format's manifest gives for free). A missing
    * table directory (never built, or every bucket dropped by earlier
    * forgets) is the empty layout, not an error. */
  private[graft] def bucketFiles(s: SparkSession, table: String,
      partitionCol: String): Map[Int, Seq[FileStatus]] = {
    val fs = fsOf(s, table)
    if (!fs.exists(new Path(table))) return Map.empty
    fs.listStatus(new Path(table))
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol="))
      .map { d =>
        val b = d.getPath.getName.stripPrefix(s"$partitionCol=").toInt
        b -> fs.listStatus(d.getPath).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
      }.toMap
  }

  /** The buckets whose directories have accreted past `targetFiles`
    * data files — the rerun-safe work list (a bucket already
    * compacted to ≤ targetFiles files never re-lists as affected). */
  private[graft] def accretedBuckets(s: SparkSession, table: String,
      partitionCol: String, targetFiles: Int): Seq[Int] =
    bucketFiles(s, table, partitionCol)
      .filter(_._2.size > targetFiles).keys.toSeq.sorted

  /** Stage the affected buckets, bin-packed to one file each, beside
    * the table (`<table>_staging`). Pure layout: the staged rows ARE
    * the buckets' rows. Families that promise a PER-FILE row order
    * (the positional lists' (tok, doc_id, pos)) pass it as
    * `sortCols` — the partition column leads the sort so
    * FileFormatWriter's own required ordering is already satisfied
    * and cannot destroy the promised order (the ir21 lesson). */
  private[graft] def stageCompaction(s: SparkSession, table: String,
      partitionCol: String, buckets: Seq[Int],
      sortCols: Seq[Column] = Nil): Unit = {
    val packed = s.read.parquet(table)
      .filter(col(partitionCol).isin(buckets: _*))
      .repartition(buckets.size, col(partitionCol))
    val ordered =
      if (sortCols.isEmpty) packed
      else packed.sortWithinPartitions(col(partitionCol) +: sortCols: _*)
    ordered.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(s"${table}_staging")
  }

  /** Replace exactly the staged buckets via dynamic partition
    * overwrite; the staging dir is dropped after a completed apply
    * (a crash before the drop leaves it — the next compaction's
    * staging write overwrites it wholesale). */
  private[graft] def applyCompaction(s: SparkSession, table: String,
      partitionCol: String): Unit = {
    s.read.parquet(s"${table}_staging")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(table)
    fsOf(s, table).delete(new Path(s"${table}_staging"), true)
    ()
  }

  /** Bin-pack a bucket-partitioned table back to ≤ `targetFiles` data
    * files per bucket directory. Row content is untouched — serves
    * before, during and after compaction answer identically; only
    * accreted buckets are listed, read, staged or rewritten. Returns
    * the compacted bucket ids (Nil = nothing to do, and the call did
    * no IO beyond the directory listing).
    *
    * `targetBytes > 0` switches to BYTE-TARGET mode (the 100 TB
    * form): instead of one file per bucket — absurd when a bucket
    * directory is gigabytes — each accreted bucket bin-packs to
    * `ceil(bucketBytes / targetBytes)` files (sizes from the same
    * [[FileStatus]] listing), a bucket is accreted only when it
    * holds MORE files than that plan, and the stage spreads each
    * bucket's rows over its planned file count with a round-robin
    * salt — so rewrite parallelism tracks data volume, not the
    * bucket-count constant. The per-bucket plan is an exact UPPER
    * bound on the resulting file count (each (bucket, salt) pair
    * lands in exactly one shuffle partition), and the mode is
    * idempotent like the file-count mode: a compacted bucket never
    * re-lists as accreted. */
  def compactBucketedTable(s: SparkSession, table: String,
      partitionCol: String, targetFiles: Int = 1,
      sortCols: Seq[Column] = Nil, targetBytes: Long = 0L): Seq[Int] = {
    if (targetBytes > 0L) {
      val files = bucketFiles(s, table, partitionCol)
        .filter(_._2.nonEmpty)
      val plan = files.map { case (b, fl) =>
        b -> math.max(1L, (fl.map(_.getLen).sum + targetBytes - 1)
          / targetBytes).toInt
      }
      val affected = plan
        .filter { case (b, n) => files(b).size > n }.keys.toSeq.sorted
      if (affected.nonEmpty) {
        val aPlan = affected.map(b => b -> plan(b)).toMap
        val nOf = element_at(
          map(aPlan.toSeq.sortBy(_._1)
            .flatMap { case (b, n) => Seq(lit(b), lit(n)) }: _*),
          col(partitionCol))
        s.read.parquet(table)
          .filter(col(partitionCol).isin(affected: _*))
          .withColumn("__salt", pmod(monotonically_increasing_id(), nOf))
          .repartition(math.max(1, aPlan.values.sum),
            col(partitionCol), col("__salt"))
          .drop("__salt")
          .transform(d => if (sortCols.isEmpty) d
            else d.sortWithinPartitions(col(partitionCol) +: sortCols: _*))
          .write.mode("overwrite").partitionBy(partitionCol)
          .parquet(s"${table}_staging")
        applyCompaction(s, table, partitionCol)
      }
      return affected
    }
    val affected = accretedBuckets(s, table, partitionCol, targetFiles)
    if (affected.nonEmpty) {
      stageCompaction(s, table, partitionCol, affected, sortCols)
      applyCompaction(s, table, partitionCol)
    }
    affected
  }

  // ---------------------------------------------------------------
  // The shared maintenance OVERWRITE verb. Every maintained family's
  // update/forget ends the same way: stage the affected buckets'
  // replacement rows, dynamic-overwrite them, and explicitly drop the
  // affected buckets that staged ZERO rows (dynamic overwrite only
  // touches partitions PRESENT in the data — the x17/d27/c6
  // empty-partition trap). Hand-rolled per family, this four-step
  // tail re-risks three traps the repo has each caught exactly once:
  //   - the EMPTY-PARTITION drop: a bucket whose rows all vanish
  //     keeps its stale directory unless deleted explicitly;
  //   - the COLUMN-ORDER mismatch: a staged frame whose column order
  //     differs from the written files' corrupts the mixed read (the
  //     d23 lesson);
  //   - the UNPINNED-STAGE self-read: the staged plan reads the very
  //     files the overwrite replaces, so it must materialize before
  //     the write begins (the refreshByPath trap).
  // overwriteBuckets owns all three once: canonical column order is
  // read from the table's own files, the stage is localCheckpoint-
  // pinned here, and the drop set is affected − staged.
  // ---------------------------------------------------------------

  /** Replace exactly the `affected` buckets of a bucket-partitioned
    * `table` with `staged`'s rows (any columns order; any subset —
    * or superset — of `affected` may actually stage rows: a staged
    * bucket outside `affected` is written too, an affected bucket
    * with no staged rows has its directory dropped). Returns the
    * bucket ids that received rows. Families that promise a PER-FILE
    * row order pass it as `sortCols` — the partition column leads the
    * sort so FileFormatWriter's required ordering cannot destroy it
    * (the ir21 lesson, [[stageCompaction]]'s convention).
    *
    * EMPTIED-TABLE guard: when every partition directory of `table`
    * has already been dropped (a rerun after a total forget), the
    * table has no files to read a canonical column order from — the
    * staged frame's own order becomes canonical (there are no
    * existing files to mix with), and the affected-dir cleanup still
    * runs, so the rerun no-ops instead of throwing schema-inference
    * errors. */
  private[graft] def overwriteBuckets(s: SparkSession, table: String,
      partitionCol: String, affected: Seq[Int], staged: DataFrame,
      sortCols: Seq[Column] = Nil): Set[Int] = {
    val hasFiles = bucketFiles(s, table, partitionCol).valuesIterator
      .exists(_.nonEmpty)
    val cols = if (hasFiles) s.read.parquet(table).columns
               else staged.columns
    // cluster by the partition column before the pin: staged frames
    // routinely arrive WIDE (a survivors-read unioned with a shuffled
    // delta concatenates both sides' partitions), and a wide
    // partitionBy write opens (tasks × buckets) parquet files — ~2 s
    // of writer churn measured on the SAX landed append for a
    // KB-sized delta. One narrow exchange of the request-sized stage
    // lands each bucket as ONE file (guide §6's output sizing; the
    // per-file sortCols promise below survives — the sort is applied
    // after this shuffle, partition column leading).
    val pinned = staged.select(cols.map(col(_)): _*)
      .repartition(col(partitionCol)).localCheckpoint()
    val present = pinned.select(col(partitionCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    if (present.nonEmpty) {
      val ordered =
        if (sortCols.isEmpty) pinned
        else pinned.sortWithinPartitions(col(partitionCol) +: sortCols: _*)
      ordered.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(table)
    }
    val fs = fsOf(s, table)
    (affected.toSet -- present).foreach { b =>
      fs.delete(new Path(s"$table/$partitionCol=$b"), true)
      ()
    }
    present
  }

  /** The sweep's survivor frame — exposed separately so
    * PlanContractSpec can pin, per family, the STATIC `IN` partition
    * predicate on the table scan (only the affected buckets'
    * directories are listed or read) and the broadcast anti-join. */
  private[graft] def sweepSurvivors(s: SparkSession, table: String,
      partitionCol: String, affected: Seq[Int], drop: DataFrame,
      keys: Seq[String]): DataFrame =
    s.read.parquet(table)
      .filter(col(partitionCol).isin(affected: _*))
      .join(broadcast(drop), keys, "left_anti")

  /** The bucket-count SIZING RULE (SCALE.md's scaling law, one
    * definition): the smallest power-of-two bucket count that keeps
    * every bucket directory at or under `targetBucketBytes` for a
    * table of `tableBytes`. Power-of-two counts make every growth
    * step an integer-factor split [[rebucketTable]] can execute
    * (hash mod 2N refines hash mod N), and the fixture constants
    * (16/64) are this rule evaluated at harness scale — production
    * re-evaluates it as the table grows and migrates with the
    * re-bucket verb when the answer changes. */
  def bucketCountFor(tableBytes: Long, targetBucketBytes: Long): Int = {
    require(targetBucketBytes > 0, "targetBucketBytes must be positive")
    val need = math.max(1L,
      (tableBytes + targetBucketBytes - 1) / targetBucketBytes)
    var n = 1
    while (n < need && n < (1 << 30)) n <<= 1
    n
  }

  /** The RE-BUCKET migration verb (r17 verdict #1): grow a
    * bucket-partitioned table from `oldN` to `newN` buckets, `newN`
    * an integer multiple of `oldN`, with `newBucket` the family's own
    * bucket expression evaluated at the NEW modulus. The arithmetic
    * that makes this a safe in-place migration: for h the family's
    * row hash, (h mod newN) mod oldN == h mod oldN — so every STAYER
    * (new bucket == current dir) is already in its correct directory
    * under the new modulus, and every MOVER's target bucket is
    * >= oldN, a FRESH directory that never collides with a standing
    * one. The migration is dq9's land-then-resolve shape with one
    * simplification that removes the intent manifest entirely: a
    * row's correct location is a PURE FUNCTION of the row (the value
    * does not change, unlike dq9's generalization), so every
    * intermediate state is self-describing and a rerun recomputes
    * exactly the remaining work:
    *   1. LAND: movers (rows in dirs < oldN whose `newBucket` differs
    *      from their dir) append to their new buckets behind a `keys`
    *      anti-join exactly-once guard against rows already landed in
    *      dirs >= oldN;
    *   2. RESOLVE: the mover-holding old buckets (pinned driver-side
    *      before the land) overwrite with their stayers through
    *      [[overwriteBuckets]] — an all-movers bucket's directory
    *      drops.
    * Crash convergence (spec-planted): a crash mid-land reruns behind
    * the guard; a crash between land and resolve leaves movers in
    * BOTH dirs — a rerun's mover set still sees the old copies (their
    * dir ≠ their new bucket) and the guard drops the landed ones; a
    * crash mid-resolve leaves some buckets resolved (no movers — the
    * rerun skips them) and some not. Serve stability: during phase 1
    * the OLD-modulus probe is exactly correct (every row still has
    * its old-dir copy, and landed copies sit in dirs an old-modulus
    * probe never lists); after resolve the NEW-modulus probe is; a
    * deployment serving DURING the resolve window probes BOTH moduli
    * and dedups on `keys` — correct in every intermediate state
    * (AtRestSpec pins it at the planted crash point). A completed
    * migration is idempotent: a rerun finds no movers and touches no
    * file. */
  private[graft] def rebucketTable(s: SparkSession, table: String,
      partitionCol: String, oldN: Int, newN: Int, newBucket: Column,
      keys: Seq[String], sortCols: Seq[Column] = Nil,
      crashAfterLand: Boolean = false): Unit = {
    require(newN > oldN && newN % oldN == 0,
      s"re-bucket grows by an integer factor: $oldN -> $newN")
    if (!bucketFiles(s, table, partitionCol).valuesIterator
        .exists(_.nonEmpty)) return // emptied table: nothing to move
    val rows = s.read.parquet(table)
    val movers = rows.filter(col(partitionCol) < oldN)
      .withColumn("__nb", newBucket)
      .filter(col("__nb") =!= col(partitionCol))
    // the resolve work list, pinned BEFORE the land (O(oldN) driver
    // metadata) — after the land the mover old-copies still hold it,
    // so a rerun recomputes the same list
    val affected = movers.select(col(partitionCol)).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (affected.isEmpty) return // migrated already (or nothing moves)
    // 1. LAND, exactly-once: a landed copy already sits in a >= oldN
    // dir under the same keys. Pinned EAGERLY — the plan reads the
    // very path the write appends to (the refreshByPath trap) — and
    // re-ordered to the table's canonical file column order (the d23
    // trap; `rows.columns` is that order).
    val canonical = rows.columns
    val toLand = movers
      .join(rows.filter(col(partitionCol) >= oldN)
          .select(keys.map(col(_)): _*),
        keys, "left_anti")
      .withColumn(partitionCol, col("__nb"))
      .select(canonical.map(col(_)): _*)
      .repartition(col(partitionCol)) // one landed file per fresh bucket
      .localCheckpoint()
    val ordered =
      if (sortCols.isEmpty) toLand
      else toLand.sortWithinPartitions(col(partitionCol) +: sortCols: _*)
    ordered.write.mode("append").partitionBy(partitionCol).parquet(table)
    if (crashAfterLand) return // spec-planted crash point: (1)→(2)
    // 2. RESOLVE: the affected old buckets keep exactly their stayers
    overwriteBuckets(s, table, partitionCol, affected,
      s.read.parquet(table)
        .filter(col(partitionCol).isin(affected: _*))
        .filter(newBucket === col(partitionCol)),
      sortCols)
    ()
  }

  /** The HEAL-BY-RECOUNT verb: overwrite one derived artifact at
    * `out` with `derived`, its wholesale recomputation from the
    * family's base of record — the recovery tail every maintained
    * family's heal used to hand-roll (healSaxIndex, healWinnowIndex,
    * refreshOccupancy, healPostingsMetadata — the r17 verdict's
    * copy-pasted-tail finding, extracted like the overwrite verb
    * was). The contract: derived tables are PURE functions of the
    * at-rest base, so a crash that left them stale (never wrong)
    * heals by recomputing — no log, no replay. The stage is
    * localCheckpoint-pinned before the overwrite unconditionally:
    * heals are recovery paths (the materialization is off the hot
    * path), and the pin makes the verb immune to the self-read trap
    * by construction even when a family's derivation reads the very
    * table it replaces. Chained heals (base → A → B where B derives
    * from A) call this once per artifact IN DEPENDENCY ORDER — each
    * pin materializes the upstream table's fresh state before the
    * next derivation reads it. */
  private[graft] def healDerived(s: SparkSession, out: String,
      derived: DataFrame, partitionCols: Seq[String] = Nil): Unit = {
    val w = derived.localCheckpoint().write.mode("overwrite")
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(out)
  }

  /** The anti-join removal form of [[overwriteBuckets]] — the FORGET
    * verb: drop from exactly the `affected` buckets every row whose
    * `keys` match a row of `drop` (broadcast — request-sized), keep
    * the rest byte-equal. Untouched buckets are never listed or
    * read; an all-dropped bucket's directory is deleted. */
  private[graft] def sweepBuckets(s: SparkSession, table: String,
      partitionCol: String, affected: Seq[Int], drop: DataFrame,
      keys: Seq[String], sortCols: Seq[Column] = Nil): Set[Int] = {
    if (affected.isEmpty) return Set.empty
    if (!bucketFiles(s, table, partitionCol).valuesIterator
        .exists(_.nonEmpty)) {
      // EMPTIED table (every bucket already dropped — e.g. a forget
      // rerun after a total forget): nothing to sweep, and no files
      // for the survivor read to infer a schema from (the r17 ADVICE
      // emptied-table guard — TimeSeriesOps guards via saxOrigin;
      // every other family gets the guard here). Stale empty affected
      // dirs are still deleted so the layout converges.
      val fs = fsOf(s, table)
      affected.foreach { b =>
        fs.delete(new Path(s"$table/$partitionCol=$b"), true)
        ()
      }
      return Set.empty
    }
    overwriteBuckets(s, table, partitionCol, affected,
      sweepSurvivors(s, table, partitionCol, affected, drop, keys),
      sortCols)
  }
}
