package graft

import graft.functions.SqlFunctions

/** The SQL surface of the native expressions: registered names evaluate to
  * the same results as the Column API, and schema-fixing shape parameters
  * reject non-literals with a targeted error. */
class SqlFunctionsSpec extends SparkSpec {

  private lazy val registered = { SqlFunctions.register(spark); true }

  test("vec_dot / vec_q8 / vec_dot_q8 / roll_hash evaluate from SQL") {
    assert(registered)
    val dot = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
    assert(dot == 11.0)
    // quantize → integer dot round-trips through the SQL names
    val q8 = spark
      .sql("""SELECT vec_dot_q8(vec_q8(array(1.0d, 2.0d)).q, vec_q8(array(1.0d, 2.0d)).q) AS d""")
      .head()
      .getLong(0)
    assert(q8 > 0)
    // same kernel as the Column API ⇒ same value
    val viaSql = spark.sql("SELECT roll_hash('abc') AS h").head().getLong(0)
    val viaApi = {
      import spark.implicits._
      import org.apache.spark.sql.graftbridge.Bridge
      Seq("abc").toDF("s")
        .select(Bridge.column(graft.functions.RollHash(Bridge.expression(org.apache.spark.sql.functions.col("s")))))
        .head().getLong(0)
    }
    assert(viaSql == viaApi)
  }

  test("hyperplane_sig and winnow_fingerprints take literal shape params") {
    assert(registered)
    val sig = spark
      .sql("SELECT hyperplane_sig(array(0.5d, -0.5d, 1.0d), 16, 8) AS s")
      .head()
      .getSeq[Long](0)
    assert(sig.length == 8, "one bucket per table")
    val fp = spark.sql("SELECT winnow_fingerprints('the quick brown fox jumps over it', 5, 4) AS f")
      .head().getSeq[Long](0)
    assert(fp.nonEmpty)
  }

  test("non-literal shape parameters fail at analysis with a targeted error") {
    assert(registered)
    val e = intercept[Exception] {
      spark.sql("SELECT hyperplane_sig(array(1.0d), CAST(rand() * 4 AS INT), 2)").collect()
    }
    assert(e.getMessage.contains("integer literal"), s"got: ${e.getMessage}")
  }
}
