package graft

/** SQL surface of the custom expressions via GraftExtensions.register
  * (the shared test session already exists, so the build-time
  * extensions path does not apply — registry insertion does). */
class GraftExtensionsSpec extends SparkSpec {

  test("float_vec_dot is callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT float_vec_dot(
        |  array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(r === 7.0)
  }

  test("simhash_long is callable from SQL and matches the md5 hash contract") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT simhash_long(array('alpha', 'beta', 'gamma'), 16) AS s")
      .head().getLong(0)
    assert(sql >= 0L && sql < (1L << 16))
    // one-token signature: votes are all +1 or all -1, so the signature
    // IS the token's 60-bit md5 hash
    val one = spark.sql("SELECT simhash_long(array('alpha'), 60) AS s")
      .head().getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("alpha".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    assert(one === java.lang.Long.parseLong(hex, 16))
  }

  test("pack_codes + sq8_sdc_dist resolve from SQL; sx6's text pipeline == x22's DataFrame ranking bit-exactly") {
    GraftExtensions.register(spark)
    // unit identities: packing is 1 byte per code, the self-distance
    // is zero, and a one-code difference folds to its square
    val r = spark.sql(
      """SELECT length(pack_codes(array(0, 128, 255))) AS n,
        |       sq8_sdc_dist(pack_codes(array(7, 200)),
        |                    pack_codes(array(7, 200))) AS zero,
        |       sq8_sdc_dist(pack_codes(array(10)),
        |                    pack_codes(array(250))) AS sq""".stripMargin).head()
    assert(r.getInt(0) == 3)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 240L * 240L)
    // the end-to-end SQL-text serve reproduces the DataFrame path
    def key(row: org.apache.spark.sql.Row) =
      (row.getAs[Long]("query_id"), row.getAs[Int]("rank"),
        row.getAs[Long]("neighbor_id"), row.getAs[Long]("code_d2"))
    val sql = graft.operators.SqlSurfaceOps.sqlSq8(spark, Sf)
      .collect().map(key).toSeq
    spark.sharedState.cacheManager.clearCache()
    val df = graft.operators.SimilarityOps.sq8Sdc(spark, Sf)
      .collect().map(key).toSeq
    assert(sql.nonEmpty && sql == df)
    spark.sharedState.cacheManager.clearCache()
  }

  test("the d2 hot-path trio is callable from SQL and self-consistent") {
    GraftExtensions.register(spark)
    // 'a b c' and 'b c d' share exactly one bigram ('b c')
    val r = spark.sql(
      """SELECT sorted_intersect_count(
        |         hashed_shingle_set(split('a b c', ' '), 2),
        |         hashed_shingle_set(split('b c d', ' '), 2)) AS n,
        |       size(minhash_sig(hashed_shingle_set(split('a b c', ' '), 2))) AS m
        |""".stripMargin).head()
    assert(r.getInt(0) === 1)
    assert(r.getInt(1) === graft.operators.DedupOps.MinHashAB.length)
  }
}
