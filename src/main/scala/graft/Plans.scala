package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-audit dump: `explain("formatted")` for every registered query, so
  * scan pruning (`PushedFilters`/`ReadSchema`), join strategies, exchange
  * counts and WholeStageCodegen spans can be reviewed per query. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    // same targeted-iteration filter as Verify/Bench; the driver and the
    // PLANS.md regen never set it, so those dumps are always complete
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
      .foreach { case (name, fn) =>
      sb.append(s"\n===== $name =====\n")
      try sb.append(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
      // a query's internal persist() marks its logical fragment in the
      // cache manager even though explain never executes it — without
      // this, a LATER query sharing that fragment plans through
      // InMemoryRelation and its audited exchange count is wrong
      // (s11's cached cutoff state perturbed s8's row; Verify and
      // Bench already clear identically)
      graft.operators.CacheScope.drain()
      spark.sharedState.cacheManager.clearCache()
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
