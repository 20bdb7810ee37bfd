package graft

import org.apache.spark.sql.functions._
import graft.operators.AuditOps
import graft.sources.Tables

/** dq1 contract: every declared constraint reports against the right
  * row universe, counters agree with independently-computed values,
  * and the pass flag is exactly n_violations == 0. */
class AuditOpsSpec extends SparkSpec {

  test("dq1: constraint rows, universes and independent counter checks") {
    val rows = AuditOps.constraints(spark, Sf).collect()
      .map(r => r.getAs[String]("constraint_name") -> r).toMap
    assert(rows.size == 8)
    val nEvents = Tables.events(spark, Sf).count()
    val nOrders = Tables.orders(spark, Sf).count()
    val nLi = Tables.lineitem(spark, Sf).count()
    assert(rows.keys.count(_.startsWith("events.")) == 4)
    rows.foreach { case (name, r) =>
      val expected =
        if (name.startsWith("events.")) nEvents
        else if (name.startsWith("orders.")) nOrders else nLi
      assert(r.getAs[Long]("n_rows") == expected, name)
      assert((r.getAs[Int]("pass") == 1) == (r.getAs[Long]("n_violations") == 0L), name)
    }
    // independent recomputations
    val dupIds = nEvents -
      Tables.events(spark, Sf).select(col("event_id")).distinct().count()
    assert(rows("events.event_id_unique").getAs[Long]("n_violations") == dupIds)
    val orphans = Tables.orders(spark, Sf)
      .join(Tables.customer(spark, Sf)
        .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .filter(col("o_custkey").isNotNull).count()
    assert(rows("orders.o_custkey_in_customer").getAs[Long]("n_violations") == orphans)
    val badQty = Tables.lineitem(spark, Sf)
      .filter(col("l_quantity") <= 0).count()
    assert(rows("lineitem.l_quantity_positive").getAs[Long]("n_violations") == badQty)
  }

  test("dq3: QI cells == brute-force recount, flag rule exact, universe covered") {
    val cells = AuditOps.kAnonymity(spark, Sf).collect()
    // brute-force cell recount off the raw table
    val docs = Tables.documents(spark, Sf)
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.min(9L, r.getLong(2) / 100).toInt))
    val truth = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(cells.length == truth.size, "one row per occupied QI cell")
    cells.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Int]("len_bucket"))
      val n = r.getAs[Long]("n_docs")
      assert(n == truth(key), s"cell $key population")
      assert((r.getAs[Int]("is_k_anon") == 1) == (n >= AuditOps.KAnonK), key)
      assert(r.getAs[Double]("reident_risk") == 1.0 / n, key)
    }
    // every document is in exactly one cell, and both verdicts occur
    // (K was chosen so the gate is non-vacuous at every harness SF)
    assert(cells.map(_.getAs[Long]("n_docs")).sum == docs.length)
    assert(cells.map(_.getAs[Int]("is_k_anon")).toSet == Set(0, 1),
      "degenerate verdict distribution — retune KAnonK")
  }

  test("dq4: rollup == brute-force recount; flag and top-share rules exact") {
    val cells = AuditOps.lDiversity(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf)
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), math.min(9L, r.getLong(2) / 100).toInt,
        r.getString(1)))
    val byCell = docs.groupBy(d => (d._1, d._2))
    assert(cells.length == byCell.size, "one row per occupied QI cell")
    cells.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Int]("len_bucket"))
      val members = byCell(key)
      val bySrc = members.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      assert(r.getAs[Long]("n_docs") == members.length.toLong, key)
      assert(r.getAs[Long]("n_sources") == bySrc.size.toLong, key)
      assert((r.getAs[Int]("is_l_diverse") == 1) ==
        (bySrc.size >= AuditOps.LDivL), key)
      assert(r.getAs[Double]("top_share") ==
        bySrc.values.max.toDouble / members.length.toDouble, key)
    }
    // every doc in exactly one cell; both verdicts live at the fixture
    // SF (the scaladoc's saturation note covers sf0.1)
    assert(cells.map(_.getAs[Long]("n_docs")).sum == docs.length)
    assert(cells.map(_.getAs[Int]("is_l_diverse")).toSet == Set(0, 1),
      "degenerate verdict distribution — retune LDivL")
  }

  test("dq6: TV numerator == brute-force recount; distance/flag rules exact; both verdicts live") {
    val cells = AuditOps.tCloseness(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf)
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), math.min(9L, r.getLong(2) / 100).toInt,
        r.getString(1)))
    val byCell = docs.groupBy(d => (d._1, d._2))
    val globBySrc = docs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nTotal = docs.length.toLong
    assert(cells.length == byCell.size, "one row per occupied QI cell")
    cells.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Int]("len_bucket"))
      val members = byCell(key)
      val bySrc = members.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val nCell = members.length.toLong
      // the integer cross-multiplied numerator, over the FULL source
      // domain (absent sources contribute their whole global mass)
      val num = globBySrc.map { case (src, nv) =>
        math.abs(bySrc.getOrElse(src, 0L) * nTotal - nv * nCell) }.sum
      assert(r.getAs[Long]("n_docs") == nCell, key)
      assert(r.getAs[Long]("tv_num") == num, key)
      assert(r.getAs[Double]("tv_dist") ==
        num.toDouble / ((2.0 * nCell.toDouble) * nTotal.toDouble), key)
      assert((r.getAs[Int]("is_t_close") == 1) ==
        (num * AuditOps.TCloseDen <= nCell * nTotal * 2), key)
      // TV is a probability distance: 0 ≤ tv < 1 strictly (every cell
      // shares at least its own members' source mass with the global)
      assert(r.getAs[Double]("tv_dist") >= 0.0 &&
        r.getAs[Double]("tv_dist") < 1.0, key)
    }
    assert(cells.map(_.getAs[Long]("n_docs")).sum == docs.length)
    assert(cells.map(_.getAs[Int]("is_t_close")).toSet == Set(0, 1),
      "degenerate verdict distribution — retune TCloseDen")
  }

  test("dq7: cells == brute-force recount; delta/flag rules exact; both verdicts live") {
    val cells = AuditOps.deltaPresence(spark, Sf).collect()
    // the release membership recounts through d10's oracle-gated
    // output, not dq7's own split column
    val split = graft.operators.DedupOps.clusterSplit(spark, Sf)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(1), math.min(9L, r.getLong(2) / 100).toInt,
        split(r.getLong(0)) == "train"))
    val byCell = docs.groupBy(d => (d._1, d._2))
    assert(cells.length == byCell.size, "one row per occupied QI cell")
    cells.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Int]("len_bucket"))
      val members = byCell(key)
      val nWorld = members.length.toLong
      val nRel = members.count(_._3).toLong
      assert(r.getAs[Long]("n_world") == nWorld, key)
      assert(r.getAs[Long]("n_released") == nRel, key)
      assert(r.getAs[Double]("delta") == nRel.toDouble / nWorld.toDouble, key)
      assert((r.getAs[Int]("is_delta_present") == 1) ==
        (nRel * AuditOps.DPresDen >= nWorld * AuditOps.DPresMinNum &&
          nRel * AuditOps.DPresDen <= nWorld * AuditOps.DPresMaxNum), key)
    }
    assert(cells.map(_.getAs[Long]("n_world")).sum == docs.length)
    assert(cells.map(_.getAs[Int]("is_delta_present")).toSet == Set(0, 1),
      "degenerate verdict distribution — retune the presence window")
  }

  test("dq5: per-column profile == brute-force recount over EVERY profiled column") {
    val rows = AuditOps.profile(spark, Sf).collect()
      .map(r => (r.getAs[String]("table_name"),
        r.getAs[String]("column_name")) -> r).toMap
    val declared = AuditOps.ProfileCols
      .flatMap { case (t, nums, strs) => (nums ++ strs).map(t -> _) }
    assert(rows.keySet == declared.toSet, "one row per declared column")
    AuditOps.ProfileCols.foreach { case (t, nums, strs) =>
      val raw = Tables.table(spark, Sf, t)
        .select((nums ++ strs).map(col): _*).collect()
      (nums ++ strs).zipWithIndex.foreach { case (cn, i) =>
        val r = rows((t, cn))
        val vals = raw.map(row => if (row.isNullAt(i)) None else Some(row.get(i)))
        val nums2 = vals.flatten.map {
          case s: String => s.length.toDouble
          case n: Number => n.doubleValue()
          case other => fail(s"unprofilable type $other")
        }
        assert(r.getAs[Long]("n_rows") == raw.length.toLong, s"$t.$cn rows")
        assert(r.getAs[Long]("n_nulls") == vals.count(_.isEmpty).toLong,
          s"$t.$cn nulls")
        assert(r.getAs[Long]("n_distinct") ==
          vals.flatten.distinct.length.toLong, s"$t.$cn distinct")
        assert(r.getAs[Double]("min_num") == nums2.min, s"$t.$cn min")
        assert(r.getAs[Double]("max_num") == nums2.max, s"$t.$cn max")
      }
    }
    // the profile surface is non-degenerate on the fixture: a key
    // column where distinct == rows, and a bounded-domain column
    val ok = rows(("orders", "o_orderkey"))
    assert(ok.getAs[Long]("n_distinct") == ok.getAs[Long]("n_rows"))
    assert(rows(("documents", "lang")).getAs[Long]("n_distinct") < 10L)
  }

  test("dq8: enforcement drops exactly the under-K cells' rows; rerun a zero-IO no-op; all-violating bucket dir drops") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf)
    val root = "target/graft-index/spec-dq8"
    def rm(): Unit = {
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      ()
    }
    rm()
    AuditOps.writeRelease(spark, root, docs)
    // brute-force expectation: rows whose QI cell has >= K members
    val raw = docs.select(col("doc_id"), col("lang"), col("source"),
        least(lit(9), expr("n_chars div 100")).cast("int").as("lb"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    val cellN = raw.groupBy(t => (t._2, t._3, t._4)).map { case (k, v) => k -> v.size }
    val expectIds = raw.filter(t => cellN((t._2, t._3, t._4)) >= AuditOps.KAnonK)
      .map(_._1).toSet
    assert(expectIds.size < raw.length, "fixture has no violating cell — enforcement untestable")
    AuditOps.enforceKAnonymity(spark, root)
    val kept = spark.read.parquet(s"$root/release")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == expectIds, "enforced release != brute-force survivor set")
    // the audit over the enforced files passes everywhere
    val served = AuditOps.kAnonymityEnforced(spark, Sf).collect()
    assert(served.nonEmpty && served.forall(_.getAs[Int]("is_k_anon") == 1),
      "a surviving cell still violates k-anonymity")
    // rerun: a compliant release re-enforces with zero rewrite IO —
    // every data file survives byte-identical (name+len+mtime)
    def sig(): Seq[(String, Long, Long)] =
      new java.io.File(s"$root/release").listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.length, f.lastModified)).sortBy(_._1).toSeq
    val before = sig()
    AuditOps.enforceKAnonymity(spark, root)
    assert(sig() == before, "re-enforcing a compliant release rewrote files")
    rm()
    // planted corpus: one bucket holds ONLY violating cells — its
    // directory must drop entirely (the c6/d27 empty-partition edge)
    import spark.implicits._
    val planted = (1 to 20).map(i => (i.toLong, "en", "web", 150L)) ++    // one big cell
      Seq((100L, "fr", "web", 950L), (101L, "de", "arxiv", 50L))          // two singletons
    val pdocs = planted.toDF("doc_id", "lang", "source", "n_chars")
      .withColumn("text", lit(""))
    AuditOps.writeRelease(spark, root, pdocs)
    // (derive each planted cell's bucket from the operator's own rule)
    val bucketOf = pdocs
      .select(col("lang"), col("source"),
        least(lit(9), expr("n_chars div 100")).cast("int").as("len_bucket"))
      .withColumn("b", AuditOps.qiBucketCol).distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getInt(3)).toMap
    val bigB = bucketOf(("en", "web", 1))
    val loneBs = Seq(bucketOf(("fr", "web", 9)), bucketOf(("de", "arxiv", 0)))
    assume(loneBs.forall(_ != bigB), "planted cells collide in one bucket — re-plant")
    AuditOps.enforceKAnonymity(spark, root)
    loneBs.foreach { b =>
      assert(!new java.io.File(s"$root/release/qi_bucket=$b").exists(),
        s"all-violating bucket $b kept its directory")
    }
    assert(spark.read.parquet(s"$root/release").count() == 20L,
      "planted enforcement kept the wrong rows")
    rm()
  }

  test("dq9: generalize-then-suppress == brute-force policy replay; retains more than suppress-only; rerun a zero-IO no-op") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf)
    val root = "target/graft-index/spec-dq9"
    def rm(): Unit = {
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      ()
    }
    rm()
    AuditOps.writeRelease(spark, root, docs)
    // brute-force replay of the policy over the raw rows
    val raw = docs.select(col("doc_id"), col("lang"), col("source"),
        least(lit(9), expr("n_chars div 100")).cast("int").as("lb"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    val fine = raw.groupBy(t => (t._2, t._3, t._4)).map { case (k, v) => k -> v.size }
    val badBands = fine.keys.filter(k => fine(k) < AuditOps.KAnonK)
      .map(k => (k._1, k._2, k._3 / 2)).toSet
    val released = raw.map { case (id, l, s, lb) =>
      val rlb = if (badBands((l, s, lb / 2))) (lb / 2) * 2 else lb
      (id, l, s, rlb)
    }
    val merged = released.groupBy(t => (t._2, t._3, t._4)).map { case (k, v) => k -> v.size }
    val expectIds = released
      .filter(t => merged((t._2, t._3, t._4)) >= AuditOps.KAnonK).map(_._1).toSet
    val expectCells = merged.filter(_._2 >= AuditOps.KAnonK)
    // suppress-only retains strictly less on this fixture (bands bite)
    val suppressOnly = raw.count(t => fine((t._2, t._3, t._4)) >= AuditOps.KAnonK)
    assert(expectIds.size > suppressOnly,
      "fixture regression: generalization saved nothing over suppression")
    AuditOps.generalizeKAnonymity(spark, root)
    AuditOps.enforceKAnonymity(spark, root)
    val kept = spark.read.parquet(s"$root/release")
      .select(col("doc_id"), col("lang"), col("source"), col("len_bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(kept.map(_._1).toSet == expectIds,
      "generalized release != brute-force survivor set")
    assert(kept.groupBy(t => (t._2, t._3, t._4)).map { case (k, v) => k -> v.size } ==
      expectCells, "released cells != brute-force policy cells")
    // rerun: a compliant release runs both stages with zero rewrite IO
    def sig(): Seq[(String, Long, Long)] =
      new java.io.File(s"$root/release").listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.length, f.lastModified)).sortBy(_._1).toSeq
    val before = sig()
    AuditOps.generalizeKAnonymity(spark, root)
    AuditOps.enforceKAnonymity(spark, root)
    assert(sig() == before, "re-enforcing a compliant release rewrote files")
    rm()
  }

  test("dq8: per-micro-batch enforcement is SEMANTICALLY wrong — suppression destroys rows a later batch would have saved (the documented streamed-twin decline)") {
    import spark.implicits._
    // Every other maintained family has a streamed twin because its
    // verbs are MONOTONE under append. Suppression is not: it DELETES
    // under-K rows, and a later batch can lift the same cell over K —
    // the whole-release enforcement keeps those rows, the incremental
    // one has already destroyed them. This pins the divergence, which
    // is WHY the k-anon release rebuilds per release (SCALE.md's
    // matrix cell) instead of binding enforcement per micro-batch.
    def seed(r: String, rows: Seq[(Long, String, String, Int)]): Unit =
      rows.toDF("doc_id", "lang", "source", "len_bucket")
        .withColumn("qi_bucket", AuditOps.qiBucketCol)
        .write.mode("overwrite").partitionBy("qi_bucket")
        .parquet(s"$r/release")
    def rm(r: String): Unit = {
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(r), true)
      ()
    }
    val cellA = (1L to 3L).map(i => (i, "zz", "w1", 4))   // 3 < K at first
    val cellB = (11L to 14L).map(i => (i, "zz", "w1", 5)) // separate cell, under K both ways
    val later = (21L to 24L).map(i => (i, "zz", "w1", 4)) // 4 more of cell A → union = 7 >= K
    val rootI = "target/graft-index/spec-dq8-incr"
    val rootW = "target/graft-index/spec-dq8-whole"
    rm(rootI); rm(rootW)
    // incremental: enforce batch 1, append batch 2, enforce again
    seed(rootI, cellA ++ cellB)
    AuditOps.enforceKAnonymity(spark, rootI)
    later.toDF("doc_id", "lang", "source", "len_bucket")
      .withColumn("qi_bucket", AuditOps.qiBucketCol)
      .write.mode("append").partitionBy("qi_bucket")
      .parquet(s"$rootI/release")
    AuditOps.enforceKAnonymity(spark, rootI)
    // whole-release: one enforcement over the union
    seed(rootW, cellA ++ cellB ++ later)
    AuditOps.enforceKAnonymity(spark, rootW)
    // the incremental run can empty the release entirely (every cell
    // suppressed) — a file-less dir has no inferable schema
    def ids(r: String): Set[Long] = {
      val d = new java.io.File(s"$r/release")
      val hasData = Option(d.listFiles).exists(_.exists(p =>
        p.isDirectory && Option(p.listFiles).exists(
          _.exists(_.getName.endsWith(".parquet")))))
      if (!hasData) Set.empty
      else spark.read.parquet(s"$r/release")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    }
    val (incr, whole) = (ids(rootI), ids(rootW))
    // the whole-release run keeps cell A's 7 rows; the incremental run
    // destroyed the first 3 before batch 2 could save them
    assert(whole.count(_ <= 3L) == 3,
      "fixture regression: the whole-release run must retain cell A's early rows")
    assert(incr.count(_ <= 3L) == 0,
      "fixture regression: the incremental run must have suppressed them already")
    assert(incr != whole,
      "incremental enforcement accidentally matched — the decline rationale no longer holds")
    rm(rootI); rm(rootW)
  }

  test("dq9 crash point: a band whose ONLY under-K cell is the EVEN one still converges (the migration-intent manifest)") {
    import spark.implicits._
    // the r16 ADVICE trap: the odd cell is itself >= K, so after the
    // mover append both cells recount >= K and the band VANISHES from
    // the under-K filter — detection from counts alone would orphan
    // the stranded odd copies at both granularities forever
    val root = "target/graft-index/spec-dq9-evencrash"
    val rootB = "target/graft-index/spec-dq9-evencrash-clean"
    def rm(r: String): Unit = {
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(r), true)
      ()
    }
    def seed(r: String): Unit =
      ((1L to 2L).map(i => (i, "zz", "w1", 2)) ++ // EVEN cell: 2 < K
        (11L to 16L).map(i => (i, "zz", "w1", 3)) ++ // ODD cell: 6 >= K
        (21L to 27L).map(i => (i, "zz", "w2", 4))) // healthy band
        .toDF("doc_id", "lang", "source", "len_bucket")
        .withColumn("qi_bucket", AuditOps.qiBucketCol)
        .write.mode("overwrite").partitionBy("qi_bucket")
        .parquet(s"$r/release")
    rm(root); rm(rootB)
    seed(root); seed(rootB)
    // plant the crash: movers landed at the even edge, the odd-bucket
    // resolve never ran — the intent manifest is on disk
    AuditOps.generalizeKAnonymity(spark, root, crashAfterLand = true)
    val cells = spark.read.parquet(s"$root/release")
      .groupBy(col("len_bucket")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.getOrElse(2, 0L) == 8L && cells.getOrElse(3, 0L) == 6L,
      s"fixture regression: the crash state must hold movers at BOTH granularities ($cells)")
    assert(new java.io.File(s"$root/migrate_intent/gen=0/_SUCCESS").exists(),
      "the intent manifest must be on disk inside the crash window")
    // the r17 ADVICE tear: a recovery rerun must never rewrite the
    // standing generation while its movers are landed — it writes a
    // NEW one, so a crash right after the intent write still leaves
    // gen=0 intact with its _SUCCESS (the stranded copies stay covered)
    AuditOps.generalizeKAnonymity(spark, root, crashAfterIntent = true)
    assert(new java.io.File(s"$root/migrate_intent/gen=0/_SUCCESS").exists(),
      "a recovery rerun rewrote the standing intent generation")
    assert(new java.io.File(s"$root/migrate_intent/gen=1/_SUCCESS").exists(),
      "the recovery rerun must persist its own unioned generation")
    // recovery = rerun: the recount alone sees nothing under K here,
    // but the intent forces the band back into the mover set
    AuditOps.generalizeKAnonymity(spark, root)
    AuditOps.enforceKAnonymity(spark, root)
    assert(!new java.io.File(s"$root/migrate_intent").exists(),
      "a completed run must clear the intent manifest")
    val ids = spark.read.parquet(s"$root/release")
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      "crash-rerun left a doc released twice")
    // and equals the clean end state
    AuditOps.generalizeKAnonymity(spark, rootB)
    AuditOps.enforceKAnonymity(spark, rootB)
    def rows(r: String) = spark.read.parquet(s"$r/release")
      .select(col("doc_id"), col("lang"), col("source"), col("len_bucket"))
      .collect().map(_.toSeq).toSet
    assert(rows(root) == rows(rootB),
      "even-cell crash-rerun diverged from the clean enforcement")
    assert(rows(root).count(_(3) == 2) == 8,
      "the bad band's rows must all sit at the even edge")
    rm(root); rm(rootB)
  }

  test("dq9: the transient both-copies crash window converges by rerun") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf)
    val root = "target/graft-index/spec-dq9-crash"
    def rm(): Unit = {
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      ()
    }
    rm()
    AuditOps.writeRelease(spark, root, docs)
    // capture the pre-enforcement rows of the docs that WILL move
    val pre = spark.read.parquet(s"$root/release").localCheckpoint()
    AuditOps.generalizeKAnonymity(spark, root)
    val post = spark.read.parquet(s"$root/release")
      .select(col("doc_id"), col("len_bucket")).localCheckpoint()
    val movedIds = pre.as("p").join(post.as("q"),
        col("p.doc_id") === col("q.doc_id") &&
          col("p.len_bucket") =!= col("q.len_bucket"))
      .select(col("p.doc_id"), col("p.lang"), col("p.source"),
        col("p.len_bucket"), col("p.qi_bucket"))
      .localCheckpoint()
    assert(movedIds.count() > 0, "fixture regression: nothing migrated")
    // simulate the crash-between-append-and-overwrite state: the OLD
    // copies reappear beside the landed new ones
    movedIds.write.mode("append").partitionBy("qi_bucket")
      .parquet(s"$root/release")
    // rerun converges: the landed copies survive, the stale old
    // copies relabel onto them and dedup away
    AuditOps.generalizeKAnonymity(spark, root)
    AuditOps.enforceKAnonymity(spark, root)
    val ids = spark.read.parquet(s"$root/release")
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      "crash-rerun left a doc released twice")
    // and equals the clean end state
    val rootB = "target/graft-index/spec-dq9-clean"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(rootB), true)
    AuditOps.writeRelease(spark, rootB, docs)
    AuditOps.generalizeKAnonymity(spark, rootB)
    AuditOps.enforceKAnonymity(spark, rootB)
    def rows(r: String) = spark.read.parquet(s"$r/release")
      .select(col("doc_id"), col("lang"), col("source"), col("len_bucket"))
      .collect().map(_.toSeq).toSet
    assert(rows(root) == rows(rootB),
      "crash-rerun diverged from the clean enforcement")
    rm()
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(rootB), true)
    ()
  }
}
