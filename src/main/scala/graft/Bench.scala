package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // (name -> Right(seconds) | Left(errorClass)); a failing query must be
    // visibly an error, never a plausible-looking timing.
    //
    // Each query runs three times: an untimed warm run (JIT,
    // codegen-compile, parquet footers, AQE machinery — one-time costs
    // that would otherwise all land on the alphabetically-first query)
    // and two timed runs, reporting the min (GC pauses in a shared JVM
    // add multi-second noise to single samples). Any cache a query
    // materializes internally (e.g. the MinHash signature persist) is
    // dropped BEFORE each timed run, so a timed run always pays the
    // query's full compute, and never sees another query's cache.
    //
    // Materialization is a noop-sink WRITE, not count(): count() lets
    // the optimizer prune unused columns and eliminate the final sort,
    // so projection-heavy queries would be under-measured (and warm vs
    // timed would exercise different expression sets). The noop sink
    // evaluates every output column and the presentation sort — the
    // same work DuckDB pays materializing the oracle result.
    // Optional comma-separated substring filter for targeted profiling
    // (e.g. SPARK_GRAFT_ONLY=d2,d3b); absent = full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    val results = selected.map { case (name, fn) =>
      def materialize(): Unit =
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val r =
        try {
          materialize() // warm, untimed
          val dt = (1 to 2).map { _ =>
            spark.sharedState.cacheManager.clearCache()
            val t0 = System.nanoTime()
            materialize()
            (System.nanoTime() - t0) / 1e9
          }.min
          spark.sharedState.cacheManager.clearCache()
          Right(dt)
        } catch { case e: Throwable => Left(e.getClass.getSimpleName) }
      name -> r
    }
    // Locale.ROOT: the default-locale formatter would emit "1,234" under
    // e.g. de_DE — invalid JSON, defeating the parse-the-last-line contract.
    def sec(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    // 3-decimal seconds: ms precision is already below run-to-run noise,
    // and it keeps the one-line JSON compact enough to survive a
    // bounded-tail capture of the run's stdout
    val qs = results.map {
      case (k, Right(v)) => s""""$k":${sec(v)}"""
      case (k, Left(err)) => s""""$k":"ERROR:$err""""
    }.mkString("{", ",", "}")
    val ok = results.collect { case (_, Right(v)) => v }
    val errors = results.count(_._2.isLeft)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val full =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    // The per-query map (~3.7 KB at 106 queries) is wider than a bounded
    // stdout-tail capture, which keeps the END of stdout — so a long last
    // line gets its FRONT cut off and never JSON-parses. Print the full
    // record second-to-last (humans / full captures) and a compact summary
    // with no per-query map as the very last line: short enough to survive
    // any tail window intact. The full per-query record is also durable at
    // target/bench.json.
    val compact =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n":${results.size},"errors":$errors,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench.json"), full + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    // LAST stdout lines (showSuccess := false suppresses sbt's trailing
    // "[success]" line; spark.stop() above keeps shutdown logs off
    // stderr from landing after it on interleaved captures)
    println(full)
    println(compact)
  }
}
