package graft

import org.apache.spark.sql.functions._
import graft.operators.AtRest

/** Unit pins for the shared maintenance verbs themselves — the three
  * traps [[graft.operators.AtRest.overwriteBuckets]] exists to own
  * (empty-partition drop, canonical column order, unpinned-stage
  * self-read) exercised directly on a synthetic table, so a
  * regression in the verb fails HERE with a one-table reproduction
  * instead of inside some family's 30-second lifecycle test. */
class AtRestSpec extends SparkSpec {

  private def rmRoot(root: String): Unit = {
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  private def seed(root: String): Unit = {
    import spark.implicits._
    (0L until 40L).map(i => (i, s"v$i", (i % 4).toInt))
      .toDF("id", "payload", "b")
      .write.mode("overwrite").partitionBy("b").parquet(root)
  }

  private def rows(root: String): Set[(Long, String, Int)] =
    spark.read.parquet(root).select(col("id"), col("payload"), col("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

  test("overwriteBuckets: an affected bucket staging ZERO rows has its directory dropped; others replaced exactly") {
    import spark.implicits._
    val root = "target/graft-index/spec-atrest-drop"
    rmRoot(root); seed(root)
    // replace buckets 1 and 2; stage rows only for bucket 1
    val staged = Seq((100L, "new", 1)).toDF("id", "payload", "b")
    val present = AtRest.overwriteBuckets(spark, root, "b",
      Seq(1, 2), staged)
    assert(present == Set(1))
    assert(!new java.io.File(s"$root/b=2").exists(),
      "the zero-survivor bucket kept its stale directory")
    val r = rows(root)
    assert(r.count(_._3 == 1) == 1 && r.exists(_._1 == 100L),
      "bucket 1 was not replaced by the staged row")
    assert(r.count(_._3 == 0) == 10 && r.count(_._3 == 3) == 10,
      "an untouched bucket changed")
  }

  test("overwriteBuckets: staged columns re-order to the table's canonical file order (the d23 trap)") {
    import spark.implicits._
    val root = "target/graft-index/spec-atrest-order"
    rmRoot(root); seed(root)
    // staged frame deliberately in the WRONG column order
    val staged = Seq((1, "scrambled", 200L)).toDF("b", "payload", "id")
    AtRest.overwriteBuckets(spark, root, "b", Seq(1), staged)
    // a subsequent read must see ONE consistent schema and the row
    // under its right columns
    val r = spark.read.parquet(root)
      .filter(col("b") === 1).collect()
    assert(r.length == 1 && r.head.getAs[Long]("id") == 200L &&
      r.head.getAs[String]("payload") == "scrambled",
      s"column order scrambled the replacement row: ${r.toSeq}")
  }

  test("overwriteBuckets: the staged plan may READ the very buckets it replaces (the unpinned-stage trap)") {
    val root = "target/graft-index/spec-atrest-selfread"
    rmRoot(root); seed(root)
    // staged = a pure function of the table's own bucket-1 rows — the
    // verb must pin it before the overwrite destroys its inputs
    val staged = spark.read.parquet(root)
      .filter(col("b") === 1)
      .withColumn("payload", concat(col("payload"), lit("!")))
    AtRest.overwriteBuckets(spark, root, "b", Seq(1), staged)
    val r = rows(root).filter(_._3 == 1)
    assert(r.size == 10 && r.forall(_._2.endsWith("!")),
      s"self-read staging lost rows: ${r.take(3)}")
  }

  test("sweepBuckets: drops exactly the keyed rows from exactly the affected buckets; empty affected is a no-op") {
    import spark.implicits._
    val root = "target/graft-index/spec-atrest-sweep"
    rmRoot(root); seed(root)
    // ids 1 and 5 live in bucket 1; id 2 lives in bucket 2 — sweeping
    // ONLY bucket 1 must not touch id 2 even though it is in the drop
    // frame (the affected list bounds the IO, the caller owns it)
    val drop = Seq(1L, 5L, 2L).toDF("id")
    AtRest.sweepBuckets(spark, root, "b", Seq(1), drop, Seq("id"))
    val r = rows(root)
    assert(!r.exists(t => t._1 == 1L || t._1 == 5L), "swept rows survive")
    assert(r.exists(_._1 == 2L), "a row outside the affected buckets was dropped")
    assert(r.size == 38)
    assert(AtRest.sweepBuckets(spark, root, "b", Nil, drop, Seq("id")).isEmpty,
      "empty affected list must be a pure no-op")
    assert(rows(root).size == 38)
  }

  test("sweepBuckets: sortCols re-asserts the per-file row order through the rewrite (the ir21 trap)") {
    import spark.implicits._
    val root = "target/graft-index/spec-atrest-sort"
    rmRoot(root)
    // two files per bucket, each internally sorted on (k, id)
    def write(lo: Long): Unit =
      (lo until lo + 20L).map(i => (i, (i % 7).toInt, (i % 2).toInt))
        .toDF("id", "k", "b")
        .sortWithinPartitions(col("b"), col("k"), col("id"))
        .write.mode("append").partitionBy("b").parquet(root)
    write(0L); write(100L)
    AtRest.sweepBuckets(spark, root, "b", Seq(0, 1),
      Seq(2L, 104L).toDF("id"), Seq("id"),
      sortCols = Seq(col("k"), col("id")))
    for (b <- Seq(0, 1)) {
      val files = new java.io.File(s"$root/b=$b").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      files.foreach { f =>
        val inFile = spark.read.parquet(f.getPath)
          .select(col("k"), col("id")).collect()
          .map(r => (r.getInt(0), r.getLong(1)))
        assert(inFile.sameElements(inFile.sortBy(identity)),
          s"file ${f.getName} in bucket $b lost the (k, id) sort")
      }
    }
    assert(!rows3(root).exists(t => t._1 == 2L || t._1 == 104L),
      "swept ids survive")
  }

  test("sweepBuckets: an EMPTIED table (every bucket already dropped) no-ops instead of throwing; stale dirs clean up") {
    import spark.implicits._
    val root = "target/graft-index/spec-atrest-emptied"
    rmRoot(root); seed(root)
    // total forget: every row of every bucket sweeps → all dirs drop
    val all = (0L until 40L).toDF("id")
    AtRest.sweepBuckets(spark, root, "b", Seq(0, 1, 2, 3), all, Seq("id"))
    assert(new java.io.File(root).exists(), "table root should remain")
    assert((0 to 3).forall(b => !new java.io.File(s"$root/b=$b").exists()),
      "a total sweep must drop every bucket directory")
    // the r17 ADVICE guard: a RERUN of the forget on the emptied table
    // must no-op (the survivor read has no files to infer a schema
    // from) — and clean a stale empty dir if one exists
    new java.io.File(s"$root/b=2").mkdirs()
    val swept = AtRest.sweepBuckets(spark, root, "b", Seq(1, 2), all,
      Seq("id"))
    assert(swept.isEmpty, "an emptied-table sweep must stage nothing")
    assert(!new java.io.File(s"$root/b=2").exists(),
      "the rerun must delete a stale empty affected dir")
    // overwriteBuckets on the emptied table: staged rows (a re-seed)
    // write with the STAGED frame's own column order as canonical
    val staged = Seq((7L, "reseed", 1)).toDF("id", "payload", "b")
    val present = AtRest.overwriteBuckets(spark, root, "b", Seq(1), staged)
    assert(present == Set(1) && rows(root) == Set((7L, "reseed", 1)),
      "re-seeding an emptied table through overwriteBuckets failed")
  }

  private def rows3(root: String): Set[(Long, Int, Int)] =
    spark.read.parquet(root).select(col("id"), col("k"), col("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
}
