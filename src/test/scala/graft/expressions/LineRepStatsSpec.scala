package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LineRepStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kernelCol(text: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      LineRepStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** The relational chain the kernel collapses (lineRepetition's
    * pre-r13 shape), per unit kind. */
  private def relational(df: DataFrame): DataFrame = {
    val units = Seq("line" -> "\n", "para" -> "\n\n")
    val arrays = units.map { case (u, sep) =>
      transform(split(col("t"), sep), v => struct(lit(u).as("u"), v.as("v")))
    }
    df.select(col("id").as("__doc"),
        explode(flatten(array(arrays: _*))).as("__x"))
      .select(col("__doc"), col("__x.u").as("u"), col("__x.v").as("v"))
      .groupBy(col("__doc"), col("u"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("len", length(col("v")).cast("long"))
      .groupBy(col("__doc"), col("u"))
      .agg(sum(col("c")).as("n_units"), count(lit(1)).as("n_distinct"),
        sum((col("c") - 1) * col("len")).as("dup_chars"),
        sum(col("c") * col("len")).as("tot_chars"))
  }

  private def viaKernel(df: DataFrame): DataFrame = {
    val st = df.select(col("id").as("__doc"), kernelCol(col("t")).as("r"))
    st.select(col("__doc"), lit("line").as("u"),
        col("r.n_lines").as("n_units"), col("r.dist_lines").as("n_distinct"),
        col("r.dup_line_chars").as("dup_chars"),
        col("r.tot_line_chars").as("tot_chars"))
      .unionByName(st.select(col("__doc"), lit("para").as("u"),
        col("r.n_paras").as("n_units"), col("r.dist_paras").as("n_distinct"),
        col("r.dup_para_chars").as("dup_chars"),
        col("r.tot_para_chars").as("tot_chars")))
  }

  test("kernel == relational string-exact chain on fixture docs " +
    "(dup lines/paras, \\n\\n\\n overlap semantics, multibyte, empties)") {
    val docs = Seq(
      (1L, "same line\nsame line\nother\nsame line"),
      (2L, "p one\n\np two\n\np one"),
      (3L, "a\n\n\nb"),            // "\n\n" then remainder "\nb"
      (4L, "a\n\n\n\nb"),          // two para separators back-to-back
      (5L, "no newlines at all"),
      (6L, ""),
      (7L, "\n\n"),                // 3 empty lines, 2 empty paras
      (8L, "naïve\n日本 語\nnaïve\n日本 語"),
      (9L, "trail\n")).toDF("id", "t")
    val a = viaKernel(docs).orderBy("__doc", "u").collect().toSeq
    val b = relational(docs).orderBy("__doc", "u").collect().toSeq
    assert(a == b, s"\nkernel:     ${a.mkString("; ")}\nrelational: ${b.mkString("; ")}")
  }

  test("kernel == relational on 200 seeded random line soups") {
    val rnd = new scala.util.Random(99L)
    val lines = Vector("dup", "x", "", "longer line here", "γραμμή", "\t q")
    val docs = (0 until 200).map { i =>
      val k = rnd.nextInt(30)
      (i.toLong, Seq.fill(k)(lines(rnd.nextInt(lines.size)))
        .mkString(if (rnd.nextBoolean()) "\n" else "\n\n"))
    }.toDF("id", "t")
    val a = viaKernel(docs).orderBy("__doc", "u").collect().toSeq
    val b = relational(docs).orderBy("__doc", "u").collect().toSeq
    assert(a == b)
  }

  test("null text propagates null") {
    val rows = Seq((1L, Some("a\nb")), (2L, None)).toDF("id", "t")
      .select(col("id"), kernelCol(col("t")).as("r")).orderBy("id").collect()
    assert(rows(0).getStruct(1).getLong(0) == 2L) // 2 lines
    assert(rows(1).isNullAt(1))
  }
}
