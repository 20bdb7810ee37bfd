package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps}

/** D16 SemDeDup contract, checked against a plain-Scala brute-force
  * reference on the collected sf0.001 embeddings (small enough to
  * enumerate every within-cell pair locally). The reference replays the
  * exact double arithmetic ([[graft.functions.FloatVecDot]]'s
  * left-to-right fold over per-element float→double products), so cell
  * assignment and the prune verdicts must match EXACTLY, not
  * approximately. */
class SemDedupSpec extends SparkSpec {

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private lazy val vecs: Map[Long, Array[Float]] =
    graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap

  private lazy val reference: Map[Long, (Long, Double, Int)] = {
    val nrm = vecs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    val cents = (SimilarityOps.NumQueries.toLong until
      (SimilarityOps.NumQueries + SimilarityOps.NumCentroids).toLong).toSeq
    // nearest centroid: cent_cos desc, cell_id asc tie-break
    val assigned = vecs.keys.map { id =>
      val best = cents.map { c =>
        (dot(vecs(id), vecs(c)) / (nrm(id) * nrm(c)), c)
      }.minBy { case (cos, c) => (-cos, c) }
      id -> (best._2, best._1)
    }.toMap
    val byCell = assigned.keys.groupBy(id => assigned(id)._1)
    assigned.map { case (id, (cell, centCos)) =>
      val pruned = byCell(cell).exists { other =>
        val (_, oCos) = assigned(other)
        other != id &&
          dot(vecs(id), vecs(other)) / (nrm(id) * nrm(other)) > DedupOps.SemTau &&
          (oCos > centCos || (oCos == centCos && other < id))
      }
      id -> (cell, centCos, if (pruned) 1 else 0)
    }
  }

  private lazy val result = DedupOps.semDedup(spark, Sf).collect()

  test("d16: cell assignment, cent_cos, and prune verdicts match brute force exactly") {
    assert(result.length === vecs.size)
    result.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val (cell, centCos, pruned) = reference(id)
      assert(r.getAs[Long]("cell_id") === cell, s"vec $id cell")
      assert(r.getAs[Double]("cent_cos") === centCos, s"vec $id cent_cos bit drift")
      assert(r.getAs[Int]("is_pruned") === pruned, s"vec $id verdict")
    }
  }

  test("d16: every non-empty cell keeps at least one member, and something is pruned") {
    val byCell = result.groupBy(_.getAs[Long]("cell_id"))
    byCell.foreach { case (cell, rows) =>
      assert(rows.exists(_.getAs[Int]("is_pruned") == 0),
        s"cell $cell pruned everything — no keeper survives")
    }
    // the harness corpus does contain semantic near-dups; a prune count
    // of zero would mean the threshold went dead, not that data is clean
    assert(result.count(_.getAs[Int]("is_pruned") == 1) > 0)
  }

  test("d16: the most central member of each cell is never pruned") {
    result.groupBy(_.getAs[Long]("cell_id")).foreach { case (cell, rows) =>
      val top = rows.minBy(r => (-r.getAs[Double]("cent_cos"), r.getAs[Long]("vec_id")))
      assert(top.getAs[Int]("is_pruned") === 0,
        s"cell $cell: most-central ${top.getAs[Long]("vec_id")} was pruned")
    }
  }
}
