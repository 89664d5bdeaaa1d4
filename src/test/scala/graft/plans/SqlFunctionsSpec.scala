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
}
