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
    def timedMinOf2(materialize: () => Unit): Double = {
      val dt = (1 to 2).map { _ =>
        // registry-level unpersist of the prior run's internal persists
        // (CacheScope), then the blanket clearCache as belt-and-braces
        graft.operators.CacheScope.drain()
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        materialize()
        (System.nanoTime() - t0) / 1e9
      }.min
      graft.operators.CacheScope.drain()
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      def materialize(): Unit =
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      try {
        materialize() // warm, untimed
        Right(timedMinOf2(materialize _))
      } catch { case e: Throwable => Left(e.getClass.getSimpleName) }
    }
    val firstPass = selected.map { case (name, fn) => name -> runOne(fn) }
    // ---- contention-outlier re-time pass --------------------------------
    // Host contention spanning a sweep segment defeats warm-plus-min-of-2
    // (all three runs sit inside the contention window): round 12 recorded
    // a contiguous 4-9x "regression" across v3..w10 that re-measured at its
    // historical level in isolation. Guard: any query whose reading exceeds
    // OutlierFactor x its prior-run value (target/bench.json from the last
    // sweep, else the committed BENCH_REF.json) AND the OutlierFloor is
    // re-timed once the sweep is over — by then the contention window has
    // moved — and the MIN of the two readings is reported, with the count
    // surfaced as "outliers_retimed". A REAL regression re-times high and
    // keeps its recorded value; only transient noise is corrected.
    val OutlierFactor = 3.0
    val OutlierFloor = 0.3 // below this, 3x is scheduling jitter, not signal
    def refTimes(path: String): Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
        // a reference recorded at a different SF is no baseline at all —
        // every reading would differ by the data-volume ratio, not noise
        val sfOk = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt)
          .forall(_.group(1) == sfDir)
        if (!sfOk) Map.empty
        else "\"([A-Za-z0-9_]+)\":([0-9]+\\.[0-9]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap - "value"
      } catch { case _: Throwable => Map.empty }
    val ref = {
      val prior = refTimes("target/bench.json")
      if (prior.nonEmpty) prior else refTimes("BENCH_REF.json")
    }
    val outliers = firstPass.collect {
      case (name, Right(v))
        if v > OutlierFloor &&
          ref.get(name).exists(r => v > OutlierFactor * r) => name
    }.toSet
    val byName = selected.toMap
    val results = firstPass.map {
      case (name, Right(v)) if outliers(name) =>
        name -> (runOne(byName(name)) match {
          case Right(rv) => Right(math.min(v, rv))
          case Left(_) => Right(v) // a retry error never erases a reading
        })
      case other => other
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
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"errors":$errors,"outliers_retimed":${outliers.size},"sf":"$sfDir"}"""
    // The per-query map (~3.7 KB at 106 queries) is wider than a bounded
    // stdout-tail capture, which keeps the END of stdout — so a long last
    // line gets its FRONT cut off and never JSON-parses. Print the full
    // record second-to-last (humans / full captures) and a compact summary
    // with no per-query map as the very last line: short enough to survive
    // any tail window intact. The full per-query record is also durable at
    // target/bench.json.
    val compact =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n":${results.size},"errors":$errors,"outliers_retimed":${outliers.size},"sf":"$sfDir"}"""
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
