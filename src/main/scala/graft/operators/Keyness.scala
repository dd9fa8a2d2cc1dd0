package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Corpus keyness — which tokens are statistically over-represented in
  * one slice of the corpus versus the rest (corpus-linguistics "keyword
  * extraction", the per-source domain-signature diagnostic a mixture
  * designer reads before weighting sources; cf. the per-form-type token
  * profiles a filings analyst builds over `core/quarterly.py` output).
  *
  * Score is Pearson's χ² on each token's 2×2 contingency table
  * (token-in-slice a, token-elsewhere b, other-tokens-in-slice c,
  * other-tokens-elsewhere d):
  *
  *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
  *
  * χ² is chosen over log-likelihood G² deliberately: it is a pure
  * RATIONAL function of the exact integer counts. Every product here is
  * computed in long arithmetic (ad, bc, and the paired denominator
  * factors all fit: with ≤ 3·10⁶ corpus tokens each long product is
  * ≤ 9·10¹² ≪ 2⁶³) and only the final three IEEE operations
  * (N·(ad−bc)² as two multiplies, then one divide) run in double — both
  * engines perform the identical float ops in the identical order, so
  * even the χ² doubles hash-match the DuckDB oracle bit-for-bit, where
  * a G² (sums of `ln` terms, libm-vs-StrictMath) could only be pinned.
  *
  * Scale shape: one explode + two map-side-combined aggregations
  * (per-(group, token) counts; per-group totals joined broadcast), a
  * broadcast of the vocab-bounded global token table, and a window over
  * per-(group, token) rows — vocab × groups, corpus-size-independent.
  * Direction (over/under) is an exact integer cross-multiplication, not
  * a float compare.
  */
object Keyness {

  private def castD(c: Column): Column = c.cast(DoubleType)

  /** Top-`topN` over-represented tokens per group with their full
    * contingency evidence. `minCount` floors the in-slice count (χ² is
    * unstable for rare events; 5 is the classical floor).
    */
  def chiSquareKeyness(df: DataFrame, groupCol: String, textCol: String,
      minCount: Long = 5L, topN: Int = 10): DataFrame = {
    val toks = df
      .select(col(groupCol).as("grp"),
        explode(filter(split(lower(col(textCol)), "[^a-z]+"),
          t => t =!= lit(""))).as("token"))
    // per-(group, token) and per-group totals: two shuffles, both
    // map-side combined; the vocab-bounded global table broadcasts.
    val gt = toks.groupBy("grp", "token")
      .agg(count(lit(1)).cast(LongType).as("a"))
    val grpTot = gt.groupBy("grp")
      .agg(sum("a").cast(LongType).as("grp_tokens"))
    val tokTot = gt.groupBy("token")
      .agg(sum("a").cast(LongType).as("tok_tokens"))
    val n = gt.agg(sum("a").cast(LongType).as("n_tokens"))

    val contingency = gt
      .join(broadcast(grpTot), "grp")
      .join(broadcast(tokTot), "token")
      .crossJoin(broadcast(n))
      .withColumn("b", col("tok_tokens") - col("a"))
      .withColumn("c", col("grp_tokens") - col("a"))
      .withColumn("d",
        col("n_tokens") - col("tok_tokens") - col("grp_tokens") + col("a"))

    // all-long integer core, then exactly three IEEE double ops —
    // identical association order in the oracle SQL
    val adbc = col("a") * col("d") - col("b") * col("c")
    val den1 = (col("a") + col("b")) * (col("c") + col("d"))
    val den2 = (col("a") + col("c")) * (col("b") + col("d"))
    val scored = contingency
      .withColumn("chi2",
        castD(col("n_tokens")) * castD(adbc) * castD(adbc) /
          (castD(den1) * castD(den2)))
      // over-representation by exact cross-multiplication:
      // a/(a+c) > b/(b+d) ⟺ a·(b+d) > b·(a+c)
      .filter(col("a") >= minCount &&
        col("a") * (col("b") + col("d")) > col("b") * (col("a") + col("c")))

    val rk = Window.partitionBy("grp")
      .orderBy(col("chi2").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(rk).cast(LongType))
      .filter(col("rank") <= topN)
      .select(col("grp").as(groupCol), col("token"), col("a"), col("b"),
        col("c"), col("d"), col("chi2"), col("rank"))
  }
}
