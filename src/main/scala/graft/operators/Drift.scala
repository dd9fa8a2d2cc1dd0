package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distribution-drift metrics between a baseline slice and every other
  * group — the corpus-monitoring primitive ("did this crawl's length /
  * quality / language profile move away from the reference mix?") run
  * before a new batch is allowed to shift the training distribution.
  *
  * For each comparison group g over the union of populated bins B_g
  * (baseline ∪ g), with Laplace-1 smoothing so empty bins stay finite:
  *
  *   p_i = (c_base_i + 1) / (n_base + |B_g|)
  *   q_i = (c_g_i + 1) / (n_g + |B_g|)
  *   PSI = Σ_i (p_i − q_i) · ln(p_i / q_i)      (symmetric, ≥ 0)
  *   KL  = Σ_i p_i · ln(p_i / q_i)              (baseline ‖ group)
  *
  * The standard alarm thresholds (PSI < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted) assume ~10–20 bins — callers pick `binCol`
  * accordingly.
  *
  * Scale shape: ONE count aggregation over (group, bin) — map-side
  * combined, the only pass over the data — then joins on the
  * bin-profile table (cardinality = groups × bins, trivially
  * broadcastable). Per-group totals and bin counts ride the same
  * profile.
  *
  * Determinism: counts are exact BIGINTs; each term is a fixed IEEE
  * op sequence on them (two +1/÷, one ln of the QUOTIENT — not
  * ln p − ln q — two multiplies), and the per-group sum folds terms
  * in ascending-bin order via the sorted-array aggregate (the
  * [[Retrieval.rrfFuse]] pattern), so any engine replays the doubles
  * bit-for-bit.
  *
  * Output: `(group, n_bins, n_base, n_cmp, psi, kl)`, one row per
  * non-baseline group.
  */
object Drift {

  def psiKl(df: DataFrame, groupCol: String, baseline: String,
      binCol: Column): DataFrame = {
    val binned = df
      .select(col(groupCol).as("g"), binCol.cast(LongType).as("bin"))
      .filter(col("g").isNotNull && col("bin").isNotNull)
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // profile table: groups × bins, tiny
    val base = binned.filter(col("g") === baseline)
      .select(col("bin"), col("c").as("cb"))
    val cmp = binned.filter(col("g") =!= baseline)
      .select(col("g"), col("bin"), col("c").as("cc"))
    val nBase = base.agg(coalesce(sum(col("cb")), lit(0L)).as("n_base"))
    // per-group bin universe: baseline bins appear under every group
    val allBins = cmp.select(col("g")).distinct()
      .join(base.select(col("bin")), lit(true))
      .unionByName(cmp.select(col("g"), col("bin")))
      .distinct()
    val prof = allBins
      .join(base, Seq("bin"), "left")
      .join(cmp, Seq("g", "bin"), "left")
      .na.fill(0L, Seq("cb", "cc"))
    val totals = prof.groupBy(col("g"))
      .agg(count(lit(1)).as("n_bins"), sum(col("cc")).as("n_cmp"))
    prof
      .join(broadcast(totals), Seq("g"))
      .crossJoin(broadcast(nBase))
      .withColumn("p", (col("cb") + lit(1L)).cast(DoubleType) /
        (col("n_base") + col("n_bins")).cast(DoubleType))
      .withColumn("q", (col("cc") + lit(1L)).cast(DoubleType) /
        (col("n_cmp") + col("n_bins")).cast(DoubleType))
      .withColumn("lr", log(col("p") / col("q")))
      .groupBy(col("g").as("group"))
      .agg(
        first(col("n_bins")).as("n_bins"),
        first(col("n_base")).as("n_base"),
        first(col("n_cmp")).as("n_cmp"),
        aggregate(
          sort_array(collect_list(struct(col("bin"),
            ((col("p") - col("q")) * col("lr")).as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("psi"),
        aggregate(
          sort_array(collect_list(struct(col("bin"),
            (col("p") * col("lr")).as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("kl"))
  }
}
