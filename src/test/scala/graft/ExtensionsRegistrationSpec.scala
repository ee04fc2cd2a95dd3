package graft

/** graft_dot reachable from SQL — the shared test session is built with
  * `.withExtensions(new GraftExtensions)`, so this exercises the real
  * injection path.
  */
class ExtensionsRegistrationSpec extends SparkSpec {

  test("graft_dot is callable from SQL and matches the HOF formulation") {
    val row = spark.sql(
      """SELECT graft_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d,
        |       aggregate(zip_with(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F),
        |                 (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |                 0.0D, (a, x) -> a + x) AS hof
        |""".stripMargin).collect().head
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(0) == row.getDouble(1))
  }

  test("graft_dot rejects non-array inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dot"))
  }

  test("graft_hamming is callable from SQL and matches packed popcount") {
    val row = spark.sql(
      """SELECT graft_hamming(array(CAST(5 AS BIGINT), CAST(-1 AS BIGINT)),
        |                     array(CAST(3 AS BIGINT), CAST(0 AS BIGINT))) AS h
        |""".stripMargin).collect().head
    // 5^3 = 6 (2 bits) + (-1)^0 = all 64 bits
    assert(row.getInt(0) == 66)
  }

  test("graft_hamming agrees with Ann.binaryCodes' scan arithmetic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val codes = graft.search.Ann
      .binaryCodes(emb, "embedding", "vec_id", 64).toDF("id", "w")
    val a = codes.select(col("id").as("ia"), col("w").as("wa"))
    val b = codes.select(col("id").as("ib"), col("w").as("wb"))
    val viaExpr = a.crossJoin(b).filter(col("ia") < col("ib")).limit(200)
      .select(col("ia"), col("ib"),
        expr("graft_hamming(wa, wb)").as("h"))
      .as[(Long, Long, Int)].collect().toMap2
    val direct = codes.as[(Long, Array[Long])].collect().toMap
    viaExpr.foreach { case ((x, y), h) =>
      val d = direct(x).zip(direct(y))
        .map { case (u, v) => java.lang.Long.bitCount(u ^ v) }.sum
      assert(h == d, s"($x,$y): expr $h direct $d")
    }
  }

  private implicit class Tup3Ops(rows: Array[(Long, Long, Int)]) {
    def toMap2: Map[(Long, Long), Int] =
      rows.map { case (a, b, h) => (a, b) -> h }.toMap
  }
}
