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
}
