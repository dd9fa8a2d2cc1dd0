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

  /** EMBEDDING-space drift: how far each group's centroid moved from
    * the baseline group's — the monitor that catches a semantic shift
    * (new topic mix, encoder change) that scalar histograms like
    * [[psiKl]] cannot see.
    *
    * Exact-integer evidence face: each float coordinate quantizes to
    * `floor(v·scale + 0.5)` (scale = 1e6 keeps ~7 significant digits —
    * well past float32's precision; the floor form is a pure IEEE op
    * sequence both engines replay bit-identically, unlike `round()`
    * whose tie behavior on doubles is engine/version-dependent),
    * per-(group, dim) sums S and group counts n are exact BIGINTs, and
    * the squared centroid distance scaled by `(n_g·n_b)²` is the integer
    *
    *   drift_num = Σ_d (S_g[d]·n_b − S_b[d]·n_g)²
    *
    * carried in DECIMAL(38,0) (the q_dsir_modweights wide-integer
    * pattern), so the gate hash-compares with no float summation
    * anywhere. The actual distance² is drift_num / (scale·n_g·n_b)².
    *
    * Operand bound, enforced loudly: DECIMAL(38,0) squares overflow once
    * |S_g·n_b − S_b·n_g| ≥ 1e19, and non-ANSI Spark would silently NULL
    * the product — so any |diff| past the bound raises instead of
    * returning a wrong row. Inputs are validated the same way: a NULL
    * coordinate or ragged per-group dimensionality raises rather than
    * skewing the sums.
    *
    * Scale shape: ONE explode pass over the corpus into the (group,
    * dim) sum table — map-side combined, groups × dims rows,
    * localCheckpointed so the baseline/comparison split doesn't
    * re-explode — then joins on that tiny profile only.
    *
    * Output: `(group, n_vecs, n_base, n_dims, drift_num)`, one row per
    * non-baseline group.
    */
  def centroidDrift(emb: DataFrame, vecCol: String, groupCol: String,
      baseline: Long, scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val sums = emb
      .select(col(groupCol).cast(LongType).as("grp"),
        posexplode(col(vecCol)).as(Seq("dim0", "v")))
      .select(col("grp"), (col("dim0") + 1).as("dim"),
        // a NULL coordinate would silently vanish from sum(qv) while
        // still counting toward nd — raise instead of skewing S
        coalesce(
          floor(col("v").cast(DoubleType) * lit(scale.toDouble) + lit(0.5)),
          raise_error(lit("centroidDrift: NULL embedding coordinate"))
            .cast(LongType)).as("qv"))
      .groupBy(col("grp"), col("dim"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("nd"))
      .localCheckpoint(true) // groups × dims rows, one corpus pass
    // n_vecs per group: per-dim counts must agree (ragged arrays would
    // make the cross-product use an inconsistent n) — validate, loudly
    val ns = sums.groupBy(col("grp"))
      .agg(min(col("nd")).as("n_min"), max(col("nd")).as("n_max"))
      .select(col("grp"),
        when(col("n_min") === col("n_max"), col("n_max"))
          .otherwise(raise_error(concat(
            lit("centroidDrift: ragged dimensionality in group "),
            col("grp").cast(org.apache.spark.sql.types.StringType)))
            .cast(LongType)).as("n"))
    val sb = sums.filter(col("grp") === baseline)
      .select(col("dim"), col("s").as("s_b"))
    val nb = ns.filter(col("grp") === baseline)
      .select(col("n").as("n_b"))
    // |diff| < 1e19 keeps diff² inside DECIMAL(38,0); past it, non-ANSI
    // Spark would silently NULL the product — fail loudly instead
    val sqBound = lit(BigDecimal("10000000000000000000")).cast(d38)
    val sq = when(abs(col("diff")) < sqBound, col("diff") * col("diff"))
      .otherwise(raise_error(concat(
        lit("centroidDrift: |S_g*n_b - S_b*n_g| >= 1e19 overflows the "),
        lit("DECIMAL(38,0) square; lower `scale` or shard the group")))
        .cast(d38))
    // gate-portable fold: DECIMAL(38,0) is the one output type whose
    // rendering DuckDB versions disagree on (the q_shard_manifest
    // lesson), so alongside the full-width numerator emit drift_mod =
    // drift_num mod 2^61-1 as BIGINT — (Σ sq) mod p ≡ (Σ (sq mod p))
    // mod p, each residue < 2^61 so the decimal intermediate sum is
    // exact; registry queries hash-compare drift_mod, specs pin the
    // full decimal.
    val p = lit(ImportanceResampling.ModP).cast(d38)
    sums.filter(col("grp") =!= baseline)
      .join(sb, Seq("dim"))
      .join(ns, Seq("grp"))
      .crossJoin(broadcast(nb))
      .withColumn("diff", col("s").cast(d19) * col("n_b").cast(d19) -
        col("s_b").cast(d19) * col("n").cast(d19))
      .groupBy(col("grp").as("group"))
      .agg(first(col("n")).as("n_vecs"), first(col("n_b")).as("n_base"),
        count(lit(1)).as("n_dims"),
        sum(sq).cast(d38).as("drift_num"),
        ((sum((sq % p).cast(d38)).cast(d38) % p))
          .cast(LongType).as("drift_mod"))
  }
}
