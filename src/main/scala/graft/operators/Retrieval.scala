package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Keyword retrieval over the corpus — the data-selection / targeted-
  * decontamination face of the training-data tier (find the documents
  * most relevant to a benchmark prompt or a domain seed list).
  *
  * BM25 (Robertson et al., the Lucene-default `+1` idf variant so idf
  * stays positive even for terms in >half the corpus):
  *
  *   score(d) = Σ_t ln((N − df_t + 0.5)/(df_t + 0.5) + 1) ·
  *              tf · (k1 + 1) / (tf + k1 · (1 − b + b · dl/avgdl))
  *
  * Scale shape: the token stream is scanned once; the per-(doc, term)
  * tf table only contains QUERY terms (the isin filter is codegen'd and
  * pushes ahead of the aggregation), the df table is per-term (broadcast),
  * doc lengths join on the doc key, and the final top-N is a
  * TakeOrderedAndProject — no global sort materialization. The only
  * all-corpus aggregates are N and Σdl (one tiny driver-side job, the
  * corpus statistic a production index stores).
  *
  * The per-doc score sums term contributions in ascending-term order via
  * a sorted-array fold, so the double result is deterministic and
  * bitwise-reproducible across partitionings (and against the oracle).
  */
object Retrieval {

  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topN: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tok = df.select(col(idCol).as("doc"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= lit(""))).as("token"))
    val dl = tok.groupBy(col("doc")).agg(count(lit(1)).as("dl"))
    val stats = df.agg(count(lit(1)).as("n")).collect().head
    val n = stats.getLong(0)
    val sumDl = dl.agg(coalesce(sum(col("dl")), lit(0L))).collect().head.getLong(0)
    val avgdl = sumDl.toDouble / n

    val td = tok.filter(col("token").isin(queryTerms: _*))
      .groupBy(col("doc"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = td.groupBy(col("token")).agg(count(lit(1)).as("dfr"))

    // idf = ln(((N - df) + 0.5) / (df + 0.5) + 1) — the oracle carries the
    // same expression tree node for node so the doubles agree bitwise
    val contrib = td
      .join(broadcast(dfreq.withColumn("idf",
        log(((lit(n) - col("dfr")).cast(DoubleType) + lit(0.5)) /
          (col("dfr").cast(DoubleType) + lit(0.5)) + lit(1.0)))),
        Seq("token"))
      .join(dl, Seq("doc"))
      .withColumn("c",
        col("idf") * (col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
          (col("tf").cast(DoubleType) +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast(DoubleType) / lit(avgdl))))
    contrib.groupBy(col("doc"))
      .agg(
        aggregate(sort_array(collect_list(struct(col("token"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("score"),
        count(lit(1)).as("n_terms"))
      .select(col("doc").as(idCol), col("n_terms"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topN)
  }
}
