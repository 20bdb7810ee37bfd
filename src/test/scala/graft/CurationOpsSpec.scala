package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps, WindowOps}

/** Edge-semantics for the round-5 curation operators (tx9-tx11, w7,
  * d9): the oracle hash-compare proves engine parity on the harness
  * corpus; these pin the CONTRACTS on crafted rows — redaction spans,
  * rank tie-breaks, cohort arithmetic — that the synthetic data may
  * not exercise. */
class CurationOpsSpec extends SparkSpec {

  test("tx9: every salted doc has its email, IP and phone found and redacted") {
    val rows = TextOps.piiScrub(spark, Sf).collect()
    assert(rows.nonEmpty)
    // the deterministic salt plants exactly one of each per doc; the
    // synthetic corpus text itself contains none
    assert(rows.forall(_.getAs[Int]("n_emails") == 1))
    assert(rows.forall(_.getAs[Int]("n_ips") == 1))
    assert(rows.forall(_.getAs[Int]("n_phones") == 1))
  }

  test("tx9: redaction replaces the exact spans (crafted string)") {
    // reproduce the operator's regex chain on a hand-built value
    val df = spark.range(1).select(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            lit("mail a.b@x.co then 1.2.3.4 and +1-555-0042 end"),
            TextOps.PiiEmailRe, "[EMAIL]"),
          TextOps.PiiIpRe, "[IP]"),
        TextOps.PiiPhoneRe, "[PHONE]").as("red"))
    assert(df.head().getString(0) ==
      "mail [EMAIL] then [IP] and [PHONE] end")
  }

  test("tx10: ranks are 1..k per lang, counts non-increasing within a lang") {
    val rows = TextOps.vocab(spark, Sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Int]("rk"))
      assert(ranked.map(_.getAs[Int]("rk")).toSeq ==
        (1 to ranked.length).toSeq)
      val cnts = ranked.map(_.getAs[Long]("cnt")).toSeq
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
      assert(ranked.length <= TextOps.VocabTopK)
    }
  }

  test("tx11: shares sum to 1 and weights invert the mixture") {
    val rows = TextOps.mixture(spark, Sf).collect()
    val actual = rows.map(_.getAs[Double]("actual_share")).sum
    assert(math.abs(actual - 1.0) < 1e-9)
    // weight * actual_share == target_share (same double tree)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("weight") * r.getAs[Double]("actual_share")
        - r.getAs[Double]("target_share")) < 1e-12)
    }
  }

  test("w7: offset 0 covers every user exactly once across cohorts") {
    val rows = WindowOps.retention(spark, Sf).collect()
    // each user appears in its cohort's offset-0 cell by construction,
    // so summing offset-0 counts = distinct users with any event
    val atZero = rows.filter(_.getAs[Int]("week_offset") == 0)
      .map(_.getAs[Long]("n_active")).sum
    val users = operators.ScanOps.eventsTs(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(atZero == users)
    // retention never exceeds the cohort's OWN offset-0 size
    val sizeByCohort = rows.filter(_.getAs[Int]("week_offset") == 0)
      .map(r => r.get(r.fieldIndex("cohort_week")) -> r.getAs[Long]("n_active"))
      .toMap
    assert(rows.forall { r =>
      r.getAs[Long]("n_active") <= sizeByCohort(r.get(r.fieldIndex("cohort_week")))
    })
  }

  test("tx13: the fused report equals the composed join of the gate cores") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, Sf)
    val fused = TextOps.curationReport(spark, Sf).collect().toSeq
    val composed = TextOps.qualityCore(docs)
      .select(col("doc_id"), col("quality_bucket"), col("n_tokens"))
      .join(DedupOps.clusterSplitCore(docs)
        .select(col("doc_id"), col("split")), Seq("doc_id"))
      .groupBy(col("quality_bucket"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("quality_bucket"), col("split"))
      .collect().toSeq
    assert(fused == composed)
  }

  test("d10: every member of a cluster lands in the same split") {
    val rows = DedupOps.clusterSplit(spark, Sf).collect()
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    rows.groupBy(_.getAs[String]("cluster_key")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("split")).toSet.size == 1)
    }
    // the shares land near 80/10/10 at cluster granularity
    val n = rows.length.toDouble
    val train = rows.count(_.getAs[String]("split") == "train") / n
    assert(train > 0.5 && train < 1.0)
  }

  test("d9: exactly one keeper per cluster, and it has the cluster-max score") {
    val rows = DedupOps.qualityKeeper(spark, Sf).collect()
    rows.groupBy(_.getAs[String]("cluster_key")).foreach { case (_, rs) =>
      val keepers = rs.filter(_.getAs[Int]("is_keeper") == 1)
      assert(keepers.length == 1)
      val best = rs.map(_.getAs[Long]("score")).max
      assert(keepers.head.getAs[Long]("score") == best)
      // tie-break: lowest doc_id among max-score members
      val tied = rs.filter(_.getAs[Long]("score") == best)
        .map(_.getAs[Long]("doc_id")).min
      assert(keepers.head.getAs[Long]("doc_id") == tied)
      assert(rs.forall(_.getAs[Long]("cluster_sz") == rs.length))
    }
  }

  test("tx16: smallest cell keeps everything; kept mass ≈ min cell; deterministic") {
    val rows = TextOps.weightedSample(spark, Sf).collect()
    assert(rows.nonEmpty)
    val cells = rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
    val cellTokens = cells.view.mapValues(_.map(_.getAs[Long]("n_tok")).sum).toMap
    val minTokens = cellTokens.values.min
    cells.foreach { case (cell, rs) =>
      val thr = rs.head.getAs[Long]("thr")
      assert(rs.forall(_.getAs[Long]("thr") == thr), s"$cell thr not constant")
      assert(thr == minTokens * TextOps.SampleMod / cellTokens(cell))
      assert(rs.forall(r => (r.getAs[Int]("kept") == 1) ==
        (r.getAs[Long]("bucket") < thr)))
      // the smallest cell's threshold is the full modulus: keep all
      if (cellTokens(cell) == minTokens)
        assert(rs.forall(_.getAs[Int]("kept") == 1), s"$cell should keep all")
      // expected kept mass is the min cell's (hash-uniform; generous band)
      val keptTok = rs.filter(_.getAs[Int]("kept") == 1).map(_.getAs[Long]("n_tok")).sum
      assert(keptTok <= 2 * minTokens + 1000, s"$cell kept $keptTok of min $minTokens")
    }
    // determinism: a second run is bit-identical
    val again = TextOps.weightedSample(spark, Sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("tx17: kept set is the maximal score-ordered prefix within half the lang budget") {
    val rows = TextOps.budgetSelect(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val total = rs.head.getAs[Long]("lang_tokens")
      assert(rs.map(_.getAs[Long]("n_tok")).sum == total)
      val ordered = rs.sortBy(r => (-r.getAs[Long]("score"), r.getAs[Long]("doc_id")))
      // kept is a PREFIX in score order
      val keptFlags = ordered.map(_.getAs[Int]("kept"))
      assert(!keptFlags.sliding(2).exists { case Array(a, b) => a == 0 && b == 1; case _ => false },
        s"$lang: kept set is not a prefix")
      val keptTok = ordered.takeWhile(_.getAs[Int]("kept") == 1)
        .map(_.getAs[Long]("n_tok")).sum
      assert(keptTok * 2 <= total, s"$lang over budget")
      // maximality: the first dropped doc would cross the budget
      ordered.dropWhile(_.getAs[Int]("kept") == 1).headOption.foreach { next =>
        assert((keptTok + next.getAs[Long]("n_tok")) * 2 > total, s"$lang not maximal")
      }
    }
  }

  test("c1: manifest statuses agree with the standalone stage queries") {
    import org.apache.spark.sql.functions._
    val manifest = TextOps.trainingManifest(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("quality_bucket"), r.getAs[String]("split"),
          r.getAs[String]("status"))).toMap
    assert(manifest.size == 500)
    // stage agreement: quality buckets == tx2's, splits == d10's
    val q = TextOps.quality(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("quality_bucket")).toMap
    val sp = graft.operators.DedupOps.clusterSplit(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    manifest.foreach { case (id, (qb, s, _)) =>
      assert(qb == q(id) && s == sp(id), s"doc $id stage drift")
    }
    // dup statuses are exactly d1's non-keepers (d1 emits one row per
    // content group with its keep_id)
    val keepIds = graft.operators.DedupOps.exact(spark, Sf).collect()
      .map(_.getAs[Long]("keep_id")).toSet
    manifest.foreach { case (id, (_, _, st)) =>
      assert((st == "dup") == !keepIds(id), s"doc $id dup mismatch")
    }
    // the status ladder is exhaustive and ordered: selected implies
    // keeper + ok + train
    manifest.values.map(_._3).foreach(st =>
      assert(Set("dup", "low_quality", "heldout", "selected", "over_budget")(st)))
    manifest.foreach { case (id, (qb, s, st)) =>
      if (st == "selected" || st == "over_budget") {
        assert(keepIds(id) && qb == "ok" && s == "train", s"doc $id ladder")
      }
    }
    assert(manifest.values.exists(_._3 == "selected"))
  }

  test("c2: semantic stage agrees with d16; non-dedup stages agree with c1") {
    val c1 = TextOps.trainingManifest(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    val c2 = TextOps.semanticManifest(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(c2.size == c1.size)
    val pruned = graft.operators.DedupOps.semDedup(spark, Sf).collect()
      .filter(_.getAs[Int]("is_pruned") == 1).map(_.getAs[Long]("vec_id")).toSet
    // semantic_dup is exactly d16's pruned set minus exact-dup losers
    // (the exact fact outranks the semantic one)
    c2.foreach { case (id, st) =>
      assert((st == "semantic_dup") == (pruned(id) && c1(id) != "dup"),
        s"doc $id: c2=$st c1=${c1(id)} pruned=${pruned(id)}")
    }
    assert(c2.values.count(_ == "semantic_dup") > 0,
      "fixture regression: semantic stage went vacuous")
    // upstream-of-budget statuses are untouched by the new stage;
    // selected/over_budget may reflow (the budget runs over the
    // semantically-deduped eligible set)
    c2.foreach { case (id, st) =>
      if (!pruned(id)) {
        if (Set("dup", "low_quality", "heldout")(c1(id)))
          assert(st == c1(id), s"doc $id upstream status drifted: $st vs ${c1(id)}")
        else assert(Set("selected", "over_budget")(st), s"doc $id: $st")
      }
    }
  }

  test("c3: shard manifest == per-doc Scala replay; XOR digest order-independent; devs sum to zero") {
    def md5Long60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val ref = docs.groupBy { case (id, _) =>
      md5Long60(s"shard:$id") % TextOps.NumShards
    }.map { case (shard, ds) =>
      shard -> (ds.length.toLong,
        ds.map(_._2.split(" ", -1).length.toLong).sum,
        ds.map(d => md5Long60(d._2)).reduce(_ ^ _))
    }
    val rows = TextOps.shardExport(spark, Sf).collect()
    assert(rows.length == ref.size)
    val grand = ref.values.map(_._2).sum
    rows.foreach { r =>
      val (nDocs, nTok, digest) = ref(r.getLong(0))
      assert(r.getLong(1) == nDocs, s"shard ${r.getLong(0)} n_docs")
      assert(r.getLong(2) == nTok, s"shard ${r.getLong(0)} total_tokens")
      assert(r.getLong(3) == digest, s"shard ${r.getLong(0)} digest")
      assert(r.getLong(4) == nTok * TextOps.NumShards - grand)
    }
    // the balance deviations are a zero-sum decomposition of the corpus
    assert(rows.map(_.getLong(4)).sum == 0L)
    // every shard non-empty at fixture scale (hash spread sanity)
    assert(rows.forall(_.getLong(1) > 0L))
  }

  test("c4: per-store sweep counts == Scala replay; zero orphans; before = deleted + after") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def isDel(id: Long) = id % TextOps.ForgetMod == TextOps.ForgetRem
    val postingRows = docs.toSeq.flatMap { case (id, text) =>
      text.split(" ", -1).distinct.map(t => (t, id))
    }
    val expected = Map(
      "documents" -> (docs.size.toLong, docs.keys.count(isDel).toLong),
      "embeddings" -> {
        val vecs = graft.sources.Tables.embeddings(spark, Sf)
          .select("vec_id").collect().map(_.getLong(0))
        (vecs.length.toLong, vecs.count(isDel).toLong)
      },
      "postings" -> (postingRows.size.toLong,
        postingRows.count(p => isDel(p._2)).toLong))
    val rows = TextOps.forgetAudit(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val (before, deleted) = expected(r.getString(0))
      assert(r.getLong(1) == before, s"${r.getString(0)} rows_before")
      assert(r.getLong(2) == deleted, s"${r.getString(0)} rows_deleted")
      assert(r.getLong(3) == before - deleted, s"${r.getString(0)} rows_after")
      assert(r.getLong(4) == 0L, s"${r.getString(0)} orphans_after must be 0")
    }
  }
}
