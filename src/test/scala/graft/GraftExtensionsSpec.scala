package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("float_dot is callable from SQL in a session built with " +
    "GraftExtensions") {
    // force TestSpark's session up first so the extension session piggy-
    // backs on the same SparkContext instead of racing for local ports;
    // getOrCreate only applies extensions when building a NEW session, so
    // clear the active/default handles around it and restore after
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val d = spark.sql(
        """SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
          |""".stripMargin).head().getDouble(0)
      assert(d == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
