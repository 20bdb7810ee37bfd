package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables
import graft.functions.TextFunctions.tokHashSql
import graft.functions.VectorFunctions.dotDSql

/** SQL-first surface checks (SURVEY §2.11 / round-4 verdict #5): the
  * same custom Catalyst expressions the DataFrame operators use, driven
  * END TO END through `spark.sql(...)` text against registered views —
  * the path a SQL-only user of the library takes after installing
  * [[graft.GraftExtensions]]. ExtensionsBuildSpec proves the build-time
  * `spark.sql.extensions` registration (functions + asof planner
  * strategy with no manual install); these queries prove the resolved
  * SQL functions compute oracle-identical results on real tables via
  * the live-session `GraftExtensions.register` path (the driver owns
  * its session, so build-time config is not available here).
  *
  * Outputs serialize arrays through `to_json` (driver-comparer
  * contract, see AggOps.nestedAggJson).
  */
object SqlSurfaceOps {

  /** SX1 — the d2/d3 signature stack in pure SQL: hashed bigram shingle
    * sets → minhash signature (library A/B constants) and a 16-bit
    * simhash, per document. */
  def sqlSignatures(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("documents_sqlsurface")
    s.sql(
      """SELECT doc_id,
        |       to_json(minhash_sig(hashed_shingle_set(split(text, ' '), 2))) AS mh,
        |       simhash_long(split(text, ' '), 16) AS simhash16
        |FROM documents_sqlsurface
        |ORDER BY doc_id""".stripMargin)
  }

  /** SX2 — `topk_by` + `float_vec_dot` in pure SQL: per vec_id%4 cohort,
    * the 5 largest-norm vectors (norm via the injected dot product). */
  def sqlTopkByNorm(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_sqlsurface")
    s.sql(
      """SELECT CAST(pmod(vec_id, 4) AS INT) AS grp,
        |       to_json(topk_by(sqrt(float_vec_dot(embedding, embedding)), vec_id, 5)) AS top_ids,
        |       count(*) AS n_vecs
        |FROM embeddings_sqlsurface
        |GROUP BY pmod(vec_id, 4)
        |ORDER BY grp""".stripMargin)
  }

  /** SX3 — the AS-OF JOIN driven from SQL TEXT: `asof_le(l_ts, r_ts)`
    * in the ON clause marks the inner join, [[graft.plans.AsofSqlRewrite]]
    * rewrites it to the [[graft.plans.AsofJoin]] logical node, and the
    * injected strategy plans the sorted-merge exec — the same plan (and
    * the same DuckDB `ASOF JOIN` oracle) as jx5's DataFrame-API path.
    * Build-time sessions get the rewrite as an injected resolution rule
    * (ExtensionsBuildSpec); on this live driver session the rule is
    * applied to the analyzed plan via [[graft.plans.AsofSqlRewrite.force]]. */
  def sqlAsof(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.plans.AsofJoin.installStrategy(s)
    val (l, r) = JoinOps.asofSides(s, dir)
    l.createOrReplaceTempView("asof_l_sqlsurface")
    r.createOrReplaceTempView("asof_r_sqlsurface")
    val df = s.sql(
      """SELECT l_event_id, user_id, l_ts, l_value, r_event_id, r_ts, r_value
        |FROM asof_l_sqlsurface l JOIN asof_r_sqlsurface r
        |  ON l.user_id = r.r_user AND asof_le(l.l_ts, r.r_ts)""".stripMargin)
    org.apache.spark.sql.GraftSqlBridge.ofRows(s,
        graft.plans.AsofSqlRewrite.force(
          org.apache.spark.sql.GraftSqlBridge.logicalPlan(df)))
      .transform(Common.presented(_, org.apache.spark.sql.functions.col("l_event_id")))
  }

  /** SX4 — the qf1 classifier in pure SQL: `hashed_bow_score` resolved
    * from the registry, the 64-weight model inlined as a SQL array
    * literal (exactly what a SQL-first user pastes after loading their
    * weight table), the verdict arithmetic in plain SQL — oracle is
    * qf1's VERBATIM, so the SQL-text path must hash-match the
    * DataFrame path bit-for-bit. */
  def sqlClassifier(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("documents_sqlsurface")
    val weights = QualityFilterOps.QfWeights
      .map(w => s"CAST($w AS BIGINT)").mkString("array(", ", ", ")")
    // score computed ONCE in a subquery — the kernel is CodegenFallback,
    // so Catalyst's common-subexpression elimination is not guaranteed
    // to collapse repeated calls (and one sits in a CASE branch)
    s.sql(
      s"""SELECT doc_id, n_tokens, score,
         |       score / n_tokens AS mean_score,
         |       CASE WHEN score > 0 THEN 1 ELSE 0 END AS keep
         |FROM (SELECT doc_id,
         |             CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
         |             hashed_bow_score(split(text, ' '), $weights) AS score
         |      FROM documents_sqlsurface)
         |ORDER BY doc_id""".stripMargin)
  }

  /** SX5 — the ly1 Z-order audit in pure SQL text: the Morton
    * interleave is plain `& | shiftleft` arithmetic, so a SQL-first
    * user needs NO registered function at all — this is the paste-in
    * form of the layout audit. Oracle is ly1's VERBATIM, so the SQL
    * path must hash-match the DataFrame path bit-for-bit. */
  def sqlZorder(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.createOrReplaceTempView("events_sqlsurface_z")
    val day = s"((${ScanOps.tsMicrosSql(ev)}) div ${WindowOps.DayMicros})"
    // the ONE spread definition (LayoutOps), rendered with Spark SQL's
    // shiftleft(x, n) syntax — a ZBits/mask retune cannot leave this
    // restatement behind
    def sp(x: String): String =
      LayoutOps.spreadSqlText(x, (e, n) => s"shiftleft($e, $n)")
    s.sql(
      s"""WITH base AS (SELECT user_id & ${LayoutOps.DimMask} AS u,
         |                     $day & ${LayoutOps.DimMask} AS day
         |              FROM events_sqlsurface_z),
         |zt AS (SELECT u, day,
         |              shiftright(${sp("u")} | shiftleft(${sp("day")}, 1),
         |                         ${2 * LayoutOps.CellBits}) AS cell
         |       FROM base)
         |SELECT cell, count(*) AS n_rows,
         |       min(u) AS u_min, max(u) AS u_max,
         |       min(day) AS day_min, max(day) AS day_max,
         |       max(u) - min(u) + 1 AS u_span,
         |       max(day) - min(day) + 1 AS day_span
         |FROM zt GROUP BY cell
         |ORDER BY cell""".stripMargin)
  }

  /** SX6 — the packed-SQ8 SDC serve (x23) in pure SQL text:
    * `pack_codes` packs the per-dim codes into the at-rest binary
    * layout and `sq8_sdc_dist` is the compiled integer fold — the
    * full quantize→pack→serve pipeline a SQL-first user pastes after
    * installing [[graft.GraftExtensions]]. Every arithmetic node
    * mirrors x21/x22's trees (the code rule, the grouped pack, the
    * brute pair space), so the oracle is x22's VERBATIM and the SQL
    * path must hash-match the DataFrame path bit-for-bit. */
  def sqlSq8(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_sqlsurface_q")
    s.sql(
      s"""WITH x AS (SELECT vec_id, CAST(d AS INT) AS d, CAST(xf AS DOUBLE) AS x
         |           FROM embeddings_sqlsurface_q
         |           LATERAL VIEW posexplode(embedding) t AS d, xf),
         |st AS (SELECT d, min(x) AS mn, max(x) AS mx FROM x GROUP BY d),
         |c AS (SELECT vec_id, x.d,
         |             CASE WHEN st.mx > st.mn
         |                  THEN CAST(least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
         |                         CAST(floor((x.x - st.mn) * CAST(255 AS DOUBLE)
         |                                    / (st.mx - st.mn)) AS BIGINT))) AS INT)
         |                  ELSE 0 END AS code
         |      FROM x JOIN st ON x.d = st.d),
         |p AS (SELECT vec_id,
         |             pack_codes(transform(array_sort(collect_list(struct(d, code))),
         |                                  s -> s.code)) AS codes
         |      FROM c GROUP BY vec_id),
         |q AS (SELECT vec_id AS query_id, codes AS qcodes
         |      FROM p WHERE vec_id < ${SimilarityOps.NumQueries}),
         |r AS (SELECT q.query_id, p.vec_id,
         |             sq8_sdc_dist(q.qcodes, p.codes) AS code_d2
         |      FROM p JOIN q ON q.query_id <> p.vec_id),
         |ranked AS (SELECT query_id, vec_id, code_d2,
         |                  row_number() OVER (PARTITION BY query_id
         |                    ORDER BY code_d2, vec_id) AS rank
         |           FROM r)
         |SELECT query_id, CAST(rank AS INT) AS rank,
         |       vec_id AS neighbor_id, code_d2
         |FROM ranked WHERE rank <= ${SimilarityOps.K}
         |ORDER BY query_id, rank""".stripMargin)
  }

  /** SX7 — the AT-REST postings serve (ir15) as pure SQL text: the
    * index builds through the library's write path (plumbing SQL has
    * no analog for), then the SERVE is one `spark.sql` statement over
    * the written files — `parquet.` path relations with the STATIC
    * `term_bucket IN` partition predicate inlined as literals (the
    * same driver-computed bucket list ir15 plants), the conditional-
    * max pivot, the stored dictionary/constants reads, and ir2's
    * score tree node-for-node (rational idf × saturated tf, summed
    * left-associated in term order). Proves the at-rest layout is
    * SQL-surface-servable — a SQL-first user queries the index files
    * directly, no DataFrame API — and the oracle is ir2's VERBATIM,
    * so the SQL-text serve must hash-match the exhaustive scan
    * bit-for-bit. */
  def sqlIndexServe(s: SparkSession, dir: String): DataFrame = {
    val root = new java.io.File(
      SimilarityOps.indexRoot(s, dir) + "/irindexsx7").getAbsolutePath
    RetrievalOps.writePostingsIndex(s, root, Tables.documents(s, dir))
    val terms = RetrievalOps.QueryTerms
    val buckets = terms.map(RetrievalOps.termBucketOf(_)).distinct.mkString(", ")
    val inTerms = terms.map(t => s"'$t'").mkString(", ")
    val tfCols = terms.map(t =>
      s"CAST(coalesce(max(CASE WHEN tok = '$t' THEN tf END), 0) AS INT) AS tf_$t")
      .mkString(",\n       ")
    val dfCols = terms.map(t =>
      s"coalesce(max(CASE WHEN tok = '$t' THEN df END), CAST(0 AS BIGINT)) AS df_$t")
      .mkString(",\n       ")
    // ir2's score expression node-for-node: rational idf
    // ((N-df)*2+1)/(df*2+1) as double/long, saturated tf
    // 22·tf/(10·tf+3+9·dl/avgdl), summed left-assoc in term order
    val score = terms.map(t =>
      s"(CAST((n_docs - df_$t) * 2 + 1 AS DOUBLE) / (df_$t * 2 + 1)) * " +
        s"(CAST(tf_$t * 22 AS DOUBLE) / (CAST(tf_$t * 10 + 3 AS DOUBLE) + " +
        s"CAST(9 AS DOUBLE) * (CAST(dl AS DOUBLE) / avgdl)))")
      .mkString(" + ")
    s.sql(
      s"""WITH probe AS (
         |  SELECT doc_id, max(dl) AS dl,
         |       $tfCols
         |  FROM parquet.`$root/postings`
         |  WHERE term_bucket IN ($buckets) AND tok IN ($inTerms)
         |  GROUP BY doc_id),
         |d AS (SELECT
         |       $dfCols
         |      FROM parquet.`$root/dict`
         |      WHERE term_bucket IN ($buckets) AND tok IN ($inTerms)),
         |c AS (SELECT n_docs, avgdl FROM parquet.`$root/consts`),
         |scored AS (SELECT doc_id, dl,
         |                  ${terms.map(t => s"tf_$t").mkString(", ")},
         |                  $score AS score
         |           FROM probe CROSS JOIN d CROSS JOIN c)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
         |         AS rank,
         |       doc_id, score, dl, ${terms.map(t => s"tf_$t").mkString(", ")}
         |FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT
         |      ${RetrievalOps.TopK})
         |ORDER BY rank""".stripMargin)
  }

  /** SX8 — the at-rest NEAR-DUP PROBE as ONE SQL statement: d25's
    * two-stage pruned probe (candidates from the probe's band buckets,
    * exact-Jaccard verify sets from the candidates' id buckets)
    * restated as pure SQL text over `parquet.` path relations — the
    * sx convention extended to the second index family. The incoming
    * batch signs itself with the SQL-REGISTERED compiled expressions
    * (`hashed_shingle_set` / `minhash_sig` /
    * `sorted_intersect_count`), the probe and candidate sides carry
    * the writer's own bucket arithmetic as visible predicates on the
    * BARE partition attributes, and BOTH dynamic-pruning subqueries
    * fire inside the one statement exactly as on the DataFrame path
    * (PlanContractSpec pins both) — no driver-side bucket collection,
    * no DataFrame API. Oracle = d15's SQL VERBATIM, so the SQL-text
    * serve must hash-match the in-memory incremental probe
    * bit-for-bit. */
  def sqlBandProbe(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val root = new java.io.File(
      SimilarityOps.indexRoot(s, dir) + "/bandidxsx8").getAbsolutePath
    val docs = Tables.documents(s, dir)
    DedupOps.writeBandIndex(s, root,
      docs.filter(org.apache.spark.sql.functions.col("doc_id")
        % DedupOps.IncomingMod =!= 0))
    docs.createOrReplaceTempView("documents_sx8")
    val hashMod = graft.functions.TextFunctions.HashMod
    val bandSigs = (0 until DedupOps.Bands).map(b =>
      s"element_at(mh, ${2 * b + 1}) * $hashMod + element_at(mh, ${2 * b + 2})")
      .mkString(",\n                 ")
    s.sql(
      s"""WITH inc AS (SELECT doc_id,
         |               hashed_shingle_set(split(text, ' '), 2) AS bg
         |             FROM documents_sx8
         |             WHERE doc_id % ${DedupOps.IncomingMod} = 0),
         |m AS (SELECT doc_id, bg, minhash_sig(bg) AS mh FROM inc),
         |probe AS (SELECT doc_id AS a, p.pos AS band, p.col AS sig,
         |                 CAST(pmod(p.pos + p.col, ${DedupOps.BandBuckets})
         |                      AS INT) AS p_bucket
         |          FROM m
         |          LATERAL VIEW posexplode(array(
         |                 $bandSigs)) p AS pos, col),
         |cand AS (SELECT /*+ BROADCAST(pr) */ DISTINCT pr.a, bx.doc_id AS b
         |         FROM parquet.`$root/bands` bx
         |         JOIN (SELECT * FROM probe WHERE p_bucket >= 0) pr
         |           ON bx.band_bucket = pr.p_bucket AND bx.band = pr.band
         |              AND bx.sig = pr.sig),
         |slb AS (SELECT a, b,
         |               CAST(pmod(b, ${DedupOps.IdBuckets}) AS INT) AS b_bucket
         |        FROM cand),
         |fetched AS (SELECT /*+ BROADCAST(sl) */ sl.a, sl.b, ds.bg AS bgb
         |            FROM parquet.`$root/docsets` ds
         |            JOIN (SELECT * FROM slb WHERE b_bucket >= 0) sl
         |              ON ds.id_bucket = sl.b_bucket AND ds.doc_id = sl.b),
         |ver AS (SELECT f.a, f.b,
         |               CASE WHEN CAST(sorted_intersect_count(i.bg, f.bgb)
         |                          AS BIGINT) * ${DedupOps.JaccardNum}
         |                         >= CAST(size(i.bg) + size(f.bgb) AS BIGINT)
         |                            - CAST(sorted_intersect_count(i.bg, f.bgb)
         |                                   AS BIGINT)
         |                    THEN 1 ELSE 0 END AS nd
         |        FROM fetched f JOIN inc i ON f.a = i.doc_id),
         |agg AS (SELECT a AS doc_id, count(*) AS n_cand,
         |               CAST(sum(nd) AS BIGINT) AS n_dup,
         |               min(CASE WHEN nd = 1 THEN b END) AS dup_of
         |        FROM ver GROUP BY a)
         |SELECT i.doc_id,
         |       coalesce(n_cand, CAST(0 AS BIGINT)) AS n_cand,
         |       coalesce(n_dup, CAST(0 AS BIGINT)) AS n_dup,
         |       dup_of,
         |       CASE WHEN coalesce(n_dup, 0) > 0 THEN 'near_dup_of_corpus'
         |            ELSE 'new' END AS verdict
         |FROM inc i LEFT JOIN agg USING (doc_id)
         |ORDER BY i.doc_id""".stripMargin)
  }

  /** SX9 — the at-rest SHARD MANIFEST as ONE SQL statement: c5's
    * recount over the written export restated as pure SQL text over a
    * `parquet.` path relation — the sx convention extended to the
    * curation store (third index family with a SQL-surface serve).
    * The statement reads exactly the (shard_id, n_tok, h) columns the
    * DataFrame path column-prunes to — text bytes untouched — and the
    * oracle is c3's manifest SQL VERBATIM, so the SQL-text serve must
    * hash-match the logical recount bit-for-bit. */
  def sqlShardManifest(s: SparkSession, dir: String): DataFrame = {
    val root = new java.io.File(
      SimilarityOps.indexRoot(s, dir) + "/shardstoresx9").getAbsolutePath
    TextOps.writeShardStore(s, root, Tables.documents(s, dir))
    s.sql(
      s"""WITH sh AS (SELECT shard_id, count(*) AS n_docs,
         |                   sum(n_tok) AS total_tokens,
         |                   bit_xor(h) AS digest
         |            FROM parquet.`$root/shards`
         |            GROUP BY shard_id)
         |SELECT CAST(shard_id AS BIGINT) AS shard_id, n_docs,
         |       total_tokens, digest,
         |       total_tokens * ${TextOps.NumShards}
         |         - sum(total_tokens) OVER () AS dev
         |FROM sh ORDER BY shard_id""".stripMargin)
  }

  /** SX10 — the at-rest SKETCH STORE served as ONE SQL statement:
    * ap6's global bottom-k + estimator restated as pure SQL text over
    * the `parquet.` path relation — the sx convention extended to the
    * AGGREGATE-STATE family (fourth at-rest family with a SQL-surface
    * serve, and the first whose artifact is a sketch, not rows of an
    * index). Every float node matches ap6's column tree: the CASTs
    * produce the same doubles as `lit(255.0)` / `HashMod.toDouble`,
    * and the division order is identical — the oracle is ap6's SQL
    * VERBATIM, so the SQL-text serve must hash-match the DataFrame
    * serve bit-for-bit. */
  def sqlSketchServe(s: SparkSession, dir: String): DataFrame = {
    val root = new java.io.File(
      SimilarityOps.indexRoot(s, dir) + "/kmvstoresx10").getAbsolutePath
    ApproxOps.writeSketchStore(s, root, Tables.documents(s, dir))
    val k = ApproxOps.KmvK
    val m = graft.functions.TextFunctions.HashMod
    s.sql(
      s"""WITH r AS (SELECT lang, h,
         |                  row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
         |           FROM parquet.`$root/kmv`),
         |k AS (SELECT lang, sort_array(collect_list(h)) AS s
         |      FROM r WHERE rn <= $k GROUP BY lang)
         |SELECT lang, CAST(size(s) AS BIGINT) AS n_kept,
         |       CASE WHEN size(s) < $k THEN CAST(size(s) AS DOUBLE)
         |            ELSE CAST(${k - 1} AS DOUBLE) /
         |                 (CAST(element_at(s, $k) + 1 AS DOUBLE) / CAST($m AS DOUBLE))
         |       END AS est_distinct
         |FROM k ORDER BY lang""".stripMargin)
  }

  /** SX11 — the AT-REST POSITIONAL PHRASE SERVE as ONE SQL statement:
    * ir17's partition-pruned adjacency serve restated as pure SQL
    * text over the `parquet.` path relation — the sx convention
    * extended to the POSITIONAL layout (one of the three maintained
    * families r17 flagged as unservable by a SQL-only user). The
    * statement carries the driver-computed STATIC `term_bucket IN`
    * literal (ir15's planting), the self-join adjacency (pos2 ==
    * pos + 1), the per-term tf rollup and the anchor-ratio ranking —
    * every node mirroring [[RetrievalOps.positionalServe]]'s tree, so
    * the oracle is ir6's phrase SQL VERBATIM and the SQL-text serve
    * must hash-match the scan form bit-for-bit. */
  def sqlPhraseServe(s: SparkSession, dir: String): DataFrame = {
    val root = new java.io.File(
      SimilarityOps.indexRoot(s, dir) + "/posidxsx11").getAbsolutePath
    RetrievalOps.writePositionalIndex(s, root, Tables.documents(s, dir))
    val (w1, w2) = RetrievalOps.Phrase
    val buckets = Seq(w1, w2).map(RetrievalOps.termBucketOf(_))
      .distinct.mkString(", ")
    s.sql(
      s"""WITH pp AS (SELECT doc_id, dl, pos, tok
         |            FROM parquet.`$root/positional`
         |            WHERE term_bucket IN ($buckets)
         |              AND tok IN ('$w1', '$w2')),
         |adj AS (SELECT p1.doc_id, CAST(count(*) AS INT) AS phrase_tf,
         |               max(p1.dl) AS dl
         |        FROM pp p1 JOIN pp p2
         |          ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
         |        WHERE p1.tok = '$w1' AND p2.tok = '$w2'
         |        GROUP BY p1.doc_id),
         |tfs AS (SELECT doc_id,
         |          CAST(sum(CASE WHEN tok = '$w1' THEN 1 ELSE 0 END) AS INT)
         |            AS tf_$w1,
         |          CAST(sum(CASE WHEN tok = '$w2' THEN 1 ELSE 0 END) AS INT)
         |            AS tf_$w2
         |        FROM pp GROUP BY doc_id),
         |f AS (SELECT adj.doc_id, phrase_tf, tf_$w1, tf_$w2, dl,
         |             CAST(phrase_tf AS DOUBLE) / least(tf_$w1, tf_$w2)
         |               AS anchor_ratio
         |      FROM adj JOIN tfs ON adj.doc_id = tfs.doc_id),
         |top AS (SELECT * FROM f
         |        ORDER BY phrase_tf DESC, anchor_ratio DESC, doc_id
         |        LIMIT ${RetrievalOps.TopK})
         |SELECT CAST(row_number() OVER
         |         (ORDER BY phrase_tf DESC, anchor_ratio DESC, doc_id)
         |         AS INT) AS rank,
         |       doc_id, phrase_tf, tf_$w1, tf_$w2, dl, anchor_ratio
         |FROM top ORDER BY rank""".stripMargin)
  }

  /** SX12 — the AT-REST SAX k-NN PROBE as ONE SQL statement: ts9's
    * three-stage serve (probe word → banded candidates → exact
    * integer SSE verify) restated as pure SQL text over the written
    * index — the sx convention extended to the SAX layout. The
    * probe's word reads with the STATIC u_bucket literal, its band
    * keys derive with the build's own bit arithmetic (the same expr
    * text as [[TimeSeriesOps.bandKeys]]) and `hash(b, bk)` bucket mix,
    * the candidate and verify reads carry the writer's bucket
    * arithmetic as visible predicates on the BARE partition
    * attributes, and the verify tail is ts1's energies + day-join
    * dot, all integers. Oracle = ts5's SQL VERBATIM, so the SQL-text
    * serve must hash-match the in-memory probe bit-for-bit. */
  def sqlSaxProbe(s: SparkSession, dir: String): DataFrame = {
    val T = TimeSeriesOps
    val root = new java.io.File(
      SimilarityOps.indexRoot(s, dir) + "/saxidxsx12").getAbsolutePath
    T.writeSaxIndex(s, root, T.dayCounts(s, dir))
    val probeBucket = (T.ProbeUser % T.SaxUserBuckets).toInt
    s.sql(
      s"""WITH pb AS (
         |  SELECT b,
         |         word - shiftleft(shiftright(word, cast(2 * b as int)) & 3,
         |                          cast(2 * b as int)) AS bk
         |  FROM (SELECT word FROM parquet.`$root/words`
         |        WHERE u_bucket = $probeBucket AND user_id = ${T.ProbeUser})
         |  LATERAL VIEW explode(sequence(0, ${T.NumSegs - 1})) t AS b),
         |pbk AS (SELECT b, bk,
         |               CAST(pmod(hash(b, bk), ${T.SaxBandBuckets}) AS INT)
         |                 AS p_bucket
         |        FROM pb),
         |cand AS (SELECT /*+ BROADCAST(p) */ DISTINCT x.user_id
         |         FROM parquet.`$root/bands` x
         |         JOIN (SELECT * FROM pbk WHERE p_bucket >= 0) p
         |           ON x.bb_bucket = p.p_bucket AND x.b = p.b
         |              AND x.bk = p.bk
         |         WHERE x.user_id <> ${T.ProbeUser}),
         |cw AS (SELECT user_id AS w_user,
         |              CAST(pmod(user_id, ${T.SaxUserBuckets}) AS INT)
         |                AS w_bucket
         |       FROM cand),
         |cc AS (SELECT /*+ BROADCAST(w) */ c.user_id, c.day, c.cnt
         |       FROM parquet.`$root/counts` c
         |       JOIN (SELECT * FROM cw WHERE w_bucket >= 0) w
         |         ON c.u_bucket = w.w_bucket AND c.user_id = w.w_user
         |       UNION ALL
         |       SELECT user_id, day, cnt FROM parquet.`$root/counts`
         |       WHERE u_bucket = $probeBucket AND user_id = ${T.ProbeUser}),
         |pu AS (SELECT user_id, sum(cnt * cnt) AS sum_sq,
         |              count(*) AS n_days
         |       FROM cc GROUP BY user_id),
         |probe AS (SELECT day, cnt AS cp FROM cc
         |          WHERE user_id = ${T.ProbeUser}),
         |pe AS (SELECT sum(cp * cp) AS sum_sq_p FROM probe),
         |dots AS (SELECT /*+ BROADCAST(probe) */ user_id,
         |                sum(cnt * cp) AS dot
         |         FROM cc JOIN probe USING (day)
         |         WHERE user_id <> ${T.ProbeUser} GROUP BY user_id),
         |f AS (SELECT pu.user_id, coalesce(dot, CAST(0 AS BIGINT)) AS dot,
         |             sum_sq, n_days,
         |             sum_sq + sum_sq_p
         |               - 2 * coalesce(dot, CAST(0 AS BIGINT)) AS sse
         |      FROM pu LEFT JOIN dots USING (user_id) CROSS JOIN pe
         |      WHERE pu.user_id <> ${T.ProbeUser}),
         |top AS (SELECT * FROM f ORDER BY sse ASC, user_id
         |        LIMIT ${T.TopK})
         |SELECT CAST(row_number() OVER (ORDER BY sse ASC, user_id) AS INT)
         |         AS rank,
         |       user_id, sse, dot, sum_sq, n_days
         |FROM top ORDER BY rank""".stripMargin)
  }

  /** SX13 — the AT-REST WINNOWING PROBE as ONE SQL statement: d26's
    * re-crawl verdict restated as pure SQL text — the sx convention
    * extended to the winnowing layout (the last of r17's three
    * SQL-unservable maintained families). The incoming batch winnows
    * ITSELF with the SQL-registered compiled kernel
    * (`winnowed_fingerprint_set`, the same [[graft.functions
    * .WinnowedFingerprintSet]] expression the DataFrame path
    * compiles), probes the capped serving table on the BARE h_bucket
    * partition attribute with the writer's own bucket arithmetic
    * visible, and the verdict tail mirrors
    * [[DedupOps.winnowVerdictCore]] node-for-node. Oracle = d18's SQL
    * VERBATIM, so the SQL-text probe must hash-match the DataFrame
    * path bit-for-bit. */
  def sqlWinnowProbe(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    val root = new java.io.File(
      SimilarityOps.indexRoot(s, dir) + "/winidxsx13").getAbsolutePath
    val docs = Tables.documents(s, dir)
    DedupOps.writeWinnowIndex(s, root, docs.filter(
      org.apache.spark.sql.functions.col("doc_id")
        % DedupOps.IncomingMod =!= 0))
    docs.createOrReplaceTempView("documents_sx13")
    s.sql(
      s"""WITH inc AS (SELECT doc_id, text FROM documents_sx13
         |             WHERE doc_id % ${DedupOps.IncomingMod} = 0),
         |bfp AS (SELECT doc_id, h
         |        FROM inc
         |        LATERAL VIEW explode(winnowed_fingerprint_set(
         |          split(text, ' '), ${DedupOps.WinnowK},
         |          ${DedupOps.WinnowW})) t AS h),
         |pr AS (SELECT doc_id AS p_doc, h AS p_h,
         |              CAST(pmod(h, ${DedupOps.WinnowBuckets}) AS INT)
         |                AS p_bucket
         |       FROM bfp),
         |hits AS (SELECT /*+ BROADCAST(p) */ p.p_doc AS doc_id,
         |                k.doc_id AS match_doc, count(*) AS n_shared
         |         FROM parquet.`$root/kept` k
         |         JOIN (SELECT * FROM pr WHERE p_bucket >= 0) p
         |           ON k.h_bucket = p.p_bucket AND k.h = p.p_h
         |         GROUP BY p.p_doc, k.doc_id),
         |nf AS (SELECT doc_id, count(*) AS nfp FROM bfp GROUP BY doc_id),
         |best AS (SELECT doc_id, n_cand, match_doc, n_shared
         |         FROM (SELECT doc_id, match_doc, n_shared,
         |                      count(*) OVER (PARTITION BY doc_id)
         |                        AS n_cand,
         |                      row_number() OVER (PARTITION BY doc_id
         |                        ORDER BY n_shared DESC, match_doc) AS rn
         |               FROM hits)
         |         WHERE rn = 1)
         |SELECT i.doc_id,
         |       coalesce(nfp, CAST(0 AS BIGINT)) AS nfp,
         |       coalesce(n_cand, CAST(0 AS BIGINT)) AS n_cand,
         |       match_doc,
         |       coalesce(n_shared, CAST(0 AS BIGINT)) AS n_shared,
         |       CASE WHEN n_shared > 0
         |            THEN CAST(n_shared AS DOUBLE) / CAST(nfp AS DOUBLE)
         |       END AS overlap,
         |       CASE WHEN coalesce(n_shared, 0) > 0 THEN 'overlaps_corpus'
         |            ELSE 'new' END AS verdict
         |FROM inc i LEFT JOIN nf USING (doc_id) LEFT JOIN best USING (doc_id)
         |ORDER BY i.doc_id""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sx11_sql_phrase_serve" -> (sqlPhraseServe _),
    "sx12_sql_sax_probe" -> (sqlSaxProbe _),
    "sx13_sql_winnow_probe" -> (sqlWinnowProbe _),
    "sx10_sql_sketch_serve" -> (sqlSketchServe _),
    "sx9_sql_shard_manifest" -> (sqlShardManifest _),
    "sx8_sql_band_probe" -> (sqlBandProbe _),
    "sx7_sql_index_serve" -> (sqlIndexServe _),
    "sx6_sql_sq8" -> (sqlSq8 _),
    "sx1_sql_signatures" -> (sqlSignatures _),
    "sx2_sql_topk" -> (sqlTopkByNorm _),
    "sx3_sql_asof" -> (sqlAsof _),
    "sx4_sql_classifier" -> (sqlClassifier _),
    "sx5_sql_zorder" -> (sqlZorder _))

  val oracles: Map[String, String] = Map(
    // ap6's oracle verbatim: the SQL-text serve of the written sketch
    // partials must match the DataFrame serve bit-for-bit
    // ir6's phrase oracle verbatim: the SQL-text positional serve
    // must match the scan form bit-for-bit (ir17's contract on the
    // SQL surface)
    "sx11_sql_phrase_serve" -> RetrievalOps.oracles("ir17_phrase_at_rest"),
    // ts5's oracle verbatim: the SQL-text SAX probe must match the
    // in-memory banded probe bit-for-bit (ts9's contract)
    "sx12_sql_sax_probe" -> TimeSeriesOps.oracles("ts9_sax_atrest"),
    // d18's oracle verbatim: the SQL-text winnow probe must match the
    // DataFrame at-rest probe bit-for-bit (d26's contract)
    "sx13_sql_winnow_probe" -> DedupOps.oracles("d26_winnow_probe_atrest"),
    "sx10_sql_sketch_serve" -> ApproxOps.oracles("ap6_sketch_atrest"),
    // c3's manifest oracle verbatim: the SQL-text serve of the written
    // export must match the logical recount bit-for-bit
    "sx9_sql_shard_manifest" -> TextOps.oracles("c3_shard_export"),
    // ir2's oracle verbatim: the SQL-text at-rest serve must match the
    // exhaustive scan bit-for-bit (the ir15 convention on the SQL
    // surface)
    "sx7_sql_index_serve" -> RetrievalOps.oracles("ir2_bm25_topk"),
    // d15's oracle verbatim: the SQL-text at-rest band probe must
    // match the in-memory incremental probe bit-for-bit
    "sx8_sql_band_probe" -> DedupOps.oracles("d15_minhash_incremental"),
    // ly1's oracle verbatim: SQL-text path == DataFrame path == DuckDB
    // sx6 restates x22's exact integer ranking (x23's packed path) in
    // SQL text — the oracle is x22's verbatim, the x23 convention
    "sx6_sql_sq8" -> SimilarityOps.oracles("x22_sq8_sdc"),
    "sx5_sql_zorder" -> LayoutOps.oracles("ly1_zorder_layout"),
    // qf1's oracle verbatim: SQL-text path == DataFrame path == DuckDB
    "sx4_sql_classifier" -> QualityFilterOps.oracles("qf1_classifier"),
    // same oracle as jx4/jx5: the SQL-text path must agree bit-for-bit
    // with the DataFrame-API path and DuckDB's native ASOF JOIN
    "sx3_sql_asof" -> JoinOps.asofOracle,
    "sx1_sql_signatures" ->
      s"""WITH t AS (SELECT doc_id, ${DedupOps.bgSql} AS bg FROM documents),
         |h AS (SELECT doc_id, list_transform(bg, s -> ${tokHashSql("s")}) AS hs FROM t),
         |m AS (SELECT doc_id,
         |       ${DedupOps.mhSqls}
         |       FROM h),
         |sh AS (${DedupOps.simhashCoreSql})
         |SELECT m.doc_id,
         |       CAST(to_json([mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7]) AS VARCHAR) AS mh,
         |       sh.simhash AS simhash16
         |FROM m JOIN sh ON m.doc_id = sh.doc_id
         |ORDER BY m.doc_id""".stripMargin,
    "sx2_sql_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(vec_id % 4 AS INT) AS grp,
         |                  sqrt(${dotDSql("embedding", "embedding")}) AS nrm
         |           FROM embeddings)
         |SELECT grp,
         |       CAST(to_json((list(vec_id ORDER BY nrm DESC, vec_id ASC))[1:5])
         |         AS VARCHAR) AS top_ids,
         |       count(*) AS n_vecs
         |FROM e GROUP BY grp ORDER BY grp""".stripMargin)
}
