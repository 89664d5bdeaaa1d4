package graft.plans

import graft.SparkSpec

/** The injected SQL functions must work from plain spark.sql — this is
  * the surface a SQL-only user of the library sees. */
class SqlFunctionsSpec extends SparkSpec {

  test("graft_cosine is callable from SQL and agrees with the HOF form") {
    val r = spark.sql(
      """SELECT graft_cosine(array(cast(1.0 as float), cast(0.0 as float)),
        |                    array(cast(1.0 as float), cast(0.0 as float))) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("graft_shingles from SQL") {
    val r = spark.sql("SELECT graft_shingles('a b c d', 3) AS s")
      .collect().head.getSeq[String](0)
    assert(r === Seq("a b c", "b c d"))
  }

  test("graft_minhash from SQL returns k minima") {
    val r = spark.sql("SELECT graft_minhash(graft_shingles('a b c d e', 3), 16) AS m")
      .collect().head.getSeq[Long](0)
    assert(r.length === 16)
    assert(r.forall(_ >= 0))
  }

  test("graft_ratio4 from SQL rounds the exact rational HALF_UP") {
    val r = spark.sql("SELECT graft_ratio4(1, 3) AS a, graft_ratio4(1, 8) AS b, " +
        "graft_ratio4(1, 20000) AS tie")
      .collect().head
    assert(r.getDouble(0) == 0.3333)
    assert(r.getDouble(1) == 0.125)
    // 1/20000 = 0.00005 — an exact tie at the 4th decimal → HALF_UP
    assert(r.getDouble(2) == 0.0001)
  }
}
