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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val r =
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => Left(e.getClass.getSimpleName) }
      name -> r
    }
    val qs = results.map {
      case (k, Right(v)) => s""""$k":$v"""
      case (k, Left(err)) => s""""$k":"ERROR:$err""""
    }.mkString("{", ",", "}")
    val ok = results.collect { case (_, Right(v)) => v }
    val errors = results.count(_._2.isLeft)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
