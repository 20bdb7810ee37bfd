package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps
import graft.sources.Tables

/** LY1's two claims, pinned independently of the DuckDB oracle:
  *
  *   1. the compiled shift-mask Morton code equals a bit-by-bit
  *      plain-Scala interleave (the definition, not the trick);
  *   2. the layout GUARANTEE: a z cell freezes the top bits of both
  *      dimensions, so every cell spans ≤ 2^CellBits in BOTH — while
  *      the user-major sort it replaces leaves the day span at the
  *      full calendar width (measured on the same data).
  */
class LayoutSpec extends SparkSpec {

  private def mortonRef(x: Long, y: Long): Long =
    (0 until LayoutOps.ZBits).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("compiled z value == bit-by-bit Morton reference on every event") {
    val ev = Tables.events(spark, Sf)
    val got = ev.select(
        col("user_id").bitwiseAND(lit(65535L)).as("u"),
        graft.operators.TimeSeriesOps.dayOf(ev).bitwiseAND(lit(65535L)).as("day"))
      .select(col("u"), col("day"),
        LayoutOps.zValue(col("u"), col("day")).as("z"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, d, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonRef(u, d), s"u=$u day=$d")
    }
    // seeded fuzz off the fixture domain: the shift-mask spread must
    // hold over the full 16-bit range, not just the corpus's corner
    val rnd = new scala.util.Random(42)
    val pairs = Vector.fill(200)((rnd.nextLong() & 65535L, rnd.nextLong() & 65535L))
    import spark.implicits._
    val fz = pairs.toDF("u", "day")
      .select(col("u"), col("day"), LayoutOps.zValue(col("u"), col("day")).as("z"))
      .collect()
    fz.foreach(r => assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1))))
  }

  test("every z cell spans <= 2^CellBits in BOTH dimensions; user-major files do not bound day") {
    val cells = LayoutOps.zorderLayout(spark, Sf).collect()
    assert(cells.nonEmpty)
    val bound = 1L << LayoutOps.CellBits
    cells.foreach { r =>
      assert(r.getAs[Long]("u_span") <= bound, s"cell ${r.getAs[Long]("cell")}")
      assert(r.getAs[Long]("day_span") <= bound, s"cell ${r.getAs[Long]("cell")}")
      assert(r.getAs[Long]("u_span") == r.getAs[Long]("u_max") - r.getAs[Long]("u_min") + 1)
      assert(r.getAs[Long]("day_span") == r.getAs[Long]("day_max") - r.getAs[Long]("day_min") + 1)
    }
    // universe: every event lands in exactly one cell
    assert(cells.map(_.getAs[Long]("n_rows")).sum == Tables.events(spark, Sf).count())
    // the contrast claim: chop the SAME rows into as many user-major
    // files (sort by (u, day), equal count) — day span per file stays
    // at (nearly) the full calendar because each file holds complete
    // user timelines; the z grid cut it to <= 2^CellBits
    val ev = Tables.events(spark, Sf)
    val coords = ev.select(
        col("user_id").bitwiseAND(lit(65535L)).as("u"),
        graft.operators.TimeSeriesOps.dayOf(ev).bitwiseAND(lit(65535L)).as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val calendar = coords.map(_._2).max - coords.map(_._2).min + 1
    val perFile = math.max(1, coords.length / cells.length)
    val lexDaySpans = coords.sortBy(identity).grouped(perFile).toSeq
      .map(f => f.map(_._2).max - f.map(_._2).min + 1)
    assert(lexDaySpans.max >= calendar,
      "fixture regression: user-major files should span the calendar")
    assert(cells.map(_.getAs[Long]("day_span")).max < lexDaySpans.max,
      "z cells must bound the day dimension the user-major sort leaves unbounded")
  }

  test("driver-side cell enumeration matches the per-row cell assignment") {
    // cellsForRange's planning step and zCoords' per-row cell id must
    // agree, or a pruned read silently drops rows: every row's cell is
    // in the enumeration of its own point rectangle
    val ev = Tables.events(spark, Sf)
    val rows = LayoutOps.zCoords(ev).collect()
    rows.foreach { r =>
      val (u, d, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(LayoutOps.cellsForRange(u, u, d, d) == Seq(c), s"u=$u day=$d")
    }
    // and a rectangle's enumeration covers exactly the cells its rows
    // occupy plus (possibly) empty grid cells — never fewer
    val d0 = rows.map(_.getLong(1)).min
    val enumd = LayoutOps.cellsForRange(0, 40, d0, d0 + 12).toSet
    val occupied = rows.filter(r => r.getLong(0) <= 40 &&
      r.getLong(1) >= d0 && r.getLong(1) <= d0 + 12).map(_.getLong(2)).toSet
    assert(occupied.subsetOf(enumd))
  }

  test("ly3: append lands ONLY new files (standing files byte-identical); stats append == rebuild; read == fresh build") {
    import java.io.File
    val rootA = "target/graft-index/spec-ly3-append"
    val rootB = "target/graft-index/spec-ly3-rebuild"
    val ev = Tables.events(spark, Sf)
    val isNew = col("event_id") % graft.operators.DedupOps.IncomingMod === 0
    LayoutOps.writeZorder(spark, rootA, ev.filter(!isNew))
    def snapshot(): Map[String, Set[(String, Long, Long)]] =
      new File(s"$rootA/rows").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSet).toMap
    val before = snapshot()
    LayoutOps.appendZorder(spark, rootA, ev.filter(isNew))
    val after = snapshot()
    // every standing file survives byte-identical — the append never
    // re-sorts or rewrites the clustered table (x19's invariant)
    before.foreach { case (cell, files) =>
      assert(files.subsetOf(after.getOrElse(cell, Set.empty)),
        s"$cell: a standing file was rewritten by the append")
    }
    assert(after.exists { case (cell, files) =>
      files.size > before.getOrElse(cell, Set.empty).size },
      "the append landed no new file")
    // the maintained stats equal a fresh build's, row-exact
    LayoutOps.writeZorder(spark, rootB, ev)
    val sa = spark.read.parquet(s"$rootA/stats")
    val sb = spark.read.parquet(s"$rootB/stats")
    assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty,
      "stats append != rebuild")
    // and the maintained layout serves the same rows
    val a = spark.read.parquet(s"$rootA/rows")
      .select(col("event_id"), col("u"), col("day"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    val b = spark.read.parquet(s"$rootB/rows")
      .select(col("event_id"), col("u"), col("day"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(a.nonEmpty && a === b, "appended layout content != rebuilt")
  }

  test("ly1 served from streamed cell-stat state == batch audit, 3 seeds") {
    // count/min/max are associative, so the standing streaming
    // aggregation over cell IS the audit's stats table under any
    // arrival order; the span projection serves from it unchanged
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val keyed = (rows: Array[org.apache.spark.sql.Row]) => rows.map { r =>
      (r.getAs[Long]("cell"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("u_min"), r.getAs[Long]("u_max"),
        r.getAs[Long]("day_min"), r.getAs[Long]("day_max"),
        r.getAs[Long]("u_span"), r.getAs[Long]("day_span"))
    }.sortBy(_._1).toSeq
    val expected = keyed(LayoutOps.zorderLayout(spark, Sf).collect())
    val coords = LayoutOps.zCoords(Tables.events(spark, Sf))
      .as[(Long, Long, Long)].collect().toVector
    for (seed <- Seq(2, 17, 31)) {
      val rnd = new scala.util.Random(seed)
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
      val stats = LayoutOps.cellAgg(in.toDF().toDF("u", "day", "cell"))
      val name = s"ly1_cell_state_$seed"
      val q = stats.writeStream.format("memory")
        .queryName(name).outputMode("complete").start()
      try {
        var rest = rnd.shuffle(coords)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(300))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // plain streaming agg — safe to drain
        }
        val served = keyed(LayoutOps.cellSpans(spark.table(name)).collect())
        assert(served == expected,
          s"seed $seed: ly1 served from streamed state drifted from batch")
      } finally q.stop()
    }
  }
}
