package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), the similarity-search tier of the north star.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k. The *query* side is
  *     broadcast (queries are few); the corpus streams through executors
  *     partition-parallel, so cost is O(|Q|·N) flops with zero shuffle of
  *     the corpus and one small top-k aggregation. This is the correctness
  *     baseline and is the right plan whenever |Q| is small.
  *   - [[lshTopK]]: random-hyperplane LSH. Corpus is bucketed once by a
  *     sign-bit key (linear pass), queries probe their own bucket plus all
  *     hamming-1 neighbors (multi-probe) to recover recall; exact rerank
  *     inside the candidate set. At 100 TB the bucketed corpus is written
  *     partitioned by key, so a probe touches only matching partitions
  *     (partition pruning on the join key).
  */
object Similarity {

  /** Two-phase top-k merge shared by the exact and ANN paths: bounded-heap
    * partial aggregation per (task, query) → k-way final merge → ranked
    * explode. Shuffles O(tasks × |Q| × k) rows, never the candidate set.
    * Ordering (sim desc, neighbor_id asc) matches the window formulation
    * it replaced, so results are bit-identical.
    */
  private[operators] def topKMerge(cand: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    cand
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("sim")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e._2").as("neighbor_id"),
        (col("pos") + 1).as("rank"), col("e._1").as("sim"))
  }

  /** Exact cosine top-k: `queries(id, embedding)` × `corpus(id, embedding)`.
    * The query side broadcasts; the corpus streams partition-parallel
    * through the scoring projection straight into the bounded top-k
    * aggregation — zero corpus shuffle.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // norms once per VECTOR, not per pair — sim = dot/(nrm_q·nrm_c) is
    // bit-identical to cosine() but drops two of the three O(dim)
    // reductions from the |Q|×N hot loop
    val q = broadcast(queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("q_nrm")))
    val c = corpus.select(col("id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("c_nrm"))
    val joined = c.crossJoin(q)
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", VectorFunctions.dot(col("q_emb"), col("c_emb")) /
        (col("q_nrm") * col("c_nrm")))
    topKMerge(joined, k)
  }

  /** Corpus exploded into one bucket key per LSH table: (table, bucket).
    * At 100 TB this index is written once, partitioned by (table, bucket),
    * and probes prune to matching partitions.
    */
  def lshBucketed(corpus: DataFrame, nPlanes: Int, nTables: Int = 1): DataFrame =
    corpus.withColumn("tb", explode(array((0 until nTables).map { t =>
      struct(lit(t).as("table"),
        VectorFunctions.randomHyperplaneKey(col("embedding"), nPlanes, t)
          .as("bucket"))
    }: _*)))
      .select(col("*"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
      .drop("tb")

  /** Materialize the LSH index as parquet partitioned by (table, bucket) —
    * the 100 TB story made concrete: the index is written once, and a
    * probe's (table, bucket) equi-predicates prune to matching partitions
    * at the SCAN, so a query touches `tables × (1 + nPlanes)` partitions
    * out of `tables × 2^nPlanes`, never the corpus.
    */
  def writeLshIndex(corpus: DataFrame, path: String, nPlanes: Int,
      nTables: Int = 1): Unit =
    lshBucketed(corpus, nPlanes, nTables)
      .withColumn("c_nrm", VectorFunctions.l2Norm(col("embedding")))
      .write.mode("overwrite")
      .partitionBy("table", "bucket")
      .parquet(path)

  /** ANN top-k over a pre-built [[writeLshIndex]] index: same semantics as
    * [[lshTopK]], but the corpus side is the partitioned index and probes
    * prune its scan.
    *
    * CONTRACT: this is the SERVING path — the distinct probe-key set
    * (≤ |Q| × nTables × (1 + nPlanes) rows) is collected to push a
    * STATIC partition filter, so |Q| is capped at `maxProbeQueries` and
    * the call refuses larger sets rather than accumulating unbounded
    * driver state. For a corpus-sized query set static pruning is the
    * wrong plan anyway (every bucket gets probed): call [[lshTopK]], or
    * join [[lshBucketed]] queries against a direct read of the index —
    * both keep bucket assignment executor-side and scan the index once.
    */
  def lshTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame, k: Int, nPlanes: Int,
      nTables: Int = 1, excludeSelf: Boolean = true,
      maxProbeQueries: Int = 65536): DataFrame = {
    require(queries.limit(maxProbeQueries + 1).count() <= maxProbeQueries,
      s"lshTopKFromIndex serves at most $maxProbeQueries queries per " +
        "call (driver collects the probe-key set for static partition " +
        "pruning); for corpus-sized query sets use lshTopK or a direct " +
        "index join — see the Scaladoc contract")
    val q = broadcast(
      lshBucketed(
        queries.withColumn("q_nrm", VectorFunctions.l2Norm(col("embedding"))),
        nPlanes, nTables)
        .select(col("id").as("query_id"), col("embedding").as("q_emb"),
          col("q_nrm"), col("table"),
          explode(probeKeys(col("bucket"), nPlanes)).as("bucket")))
    // the probe-key set is tiny by construction (|Q| × tables × (1 +
    // nPlanes)), so collect it and push a STATIC predicate on the
    // partition columns — guaranteed partition pruning at the scan, not
    // dependent on runtime DPP heuristics
    val probesByTable = q.select(col("table"), col("bucket")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val pruneP = probesByTable.map { case (t, bks) =>
      col("table") === t && col("bucket").isin(bks: _*)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val bucketed = spark.read.parquet(indexPath)
      .filter(pruneP)
      .select(col("id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("c_nrm"), col("table"), col("bucket"))
    val cand = bucketed.join(q, Seq("table", "bucket"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", VectorFunctions.dot(col("q_emb"), col("c_emb")) /
        (col("q_nrm") * col("c_nrm")))
    topKMerge(cand, k)
  }

  /** Append a batch of NEW vectors to a materialized [[writeLshIndex]]
    * index — the daily-ingest shape ([[graft.operators.IvfPq
    * .appendToIndex]]'s contract): hyperplanes are seeded
    * deterministically per table, so the batch's bucket keys are
    * computed executor-side against the SAME planes the standing layout
    * used, and the new rows land as new files inside their existing
    * `(table, bucket)` partitions — standing rows never rewritten,
    * static pruning unchanged. Append atomicity is parquet's; replay
    * dedup is the caller's (the streaming-minhash batch-id manifest
    * recipe).
    */
  def appendToLshIndex(batch: DataFrame, path: String, nPlanes: Int,
      nTables: Int = 1): Unit =
    lshBucketed(batch, nPlanes, nTables)
      .withColumn("c_nrm", VectorFunctions.l2Norm(col("embedding")))
      .write.mode("append")
      .partitionBy("table", "bucket")
      .parquet(path)

  /** Staleness gate for a served [[writeLshIndex]] index under appends
    * (r15 verdict #6 — [[graft.operators.IvfPq.driftReport]]'s shape):
    * measured recall of the index's top-k against [[bruteForceTopK]] on
    * a probe sample, plus bucket-occupancy skew. LSH has NO trained
    * model to invalidate — hyperplanes are data-independent, so a
    * region's recall is set by its query/neighbor angular distribution
    * alone — which means the one dimension appends CAN drift is
    * occupancy: appended mass concentrating into few buckets says the
    * frozen planes have stopped discriminating for that region (probe
    * candidate sets balloon, cap pressure rises, and multi-probe's
    * hamming-1 neighborhood covers a shrinking similarity shell).
    * `max_bucket_share` is the largest bucket's share of one table's
    * rows (each vector lands once per table; uniform occupancy is
    * 2^-nPlanes). `rebuild` fires when recall sinks below `recallFloor`
    * or skew exceeds `maxBucketShare` — re-plane (more planes / more
    * tables) rather than re-train.
    */
  def lshDriftReport(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, probeQueries: DataFrame, corpus: DataFrame,
      k: Int, nPlanes: Int, nTables: Int = 1, recallFloor: Double = 0.9,
      maxBucketShare: Double = 0.25,
      maxProbeQueries: Int = 65536): DataFrame = {
    require(recallFloor > 0.0 && recallFloor <= 1.0,
      s"recallFloor must be in (0, 1], got $recallFloor")
    require(maxBucketShare > 0.0 && maxBucketShare <= 1.0,
      s"maxBucketShare must be in (0, 1], got $maxBucketShare")
    val approx = lshTopKFromIndex(spark, indexPath, probeQueries, k,
        nPlanes, nTables, excludeSelf = true, maxProbeQueries)
      .select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1L))
    val exact = bruteForceTopK(probeQueries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
    val nq = probeQueries.select(col("id")).distinct().count()
    val occ = spark.read.parquet(indexPath)
      .groupBy(col("table"), col("bucket"))
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("max_bucket"), sum(col("__n")).as("n_rows"))
    exact
      .join(approx, Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_expected"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
      .crossJoin(occ)
      .select(lit(nq).as("n_queries"), lit(k.toLong).as("k"),
        col("n_expected"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_expected").cast("double"))
          .as("recall"),
        col("n_rows"), col("max_bucket"),
        (col("max_bucket").cast("double") * lit(nTables.toDouble) /
          col("n_rows").cast("double")).as("max_bucket_share"))
      .withColumn("rebuild", col("recall") < recallFloor ||
        col("max_bucket_share") > maxBucketShare)
  }

  /** Multi-probe keys: own bucket + each single-bit flip (hamming-1). */
  private def probeKeys(bucket: org.apache.spark.sql.Column, nPlanes: Int) =
    array((bucket +: (0 until nPlanes).map(p =>
      bucket.bitwiseXOR(lit(1L << p)))): _*)

  /** ANN top-k: probe LSH buckets, exact-rerank candidates.
    *
    * Recall levers (standard OR-construction): `nTables` independent
    * hyperplane sets (storage × L, recall union over tables) and hamming-1
    * multi-probe within each table. Fewer planes → bigger buckets → higher
    * recall, more rerank compute.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 8, nTables: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    // norms attached BELOW the table-explode: once per vector, not once
    // per (vector, table) row
    val bucketed = lshBucketed(
      corpus.withColumn("c_nrm", VectorFunctions.l2Norm(col("embedding"))),
      nPlanes, nTables)
      .select(col("id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("c_nrm"), col("table"), col("bucket"))
    val q = broadcast(
      lshBucketed(
        queries.withColumn("q_nrm", VectorFunctions.l2Norm(col("embedding"))),
        nPlanes, nTables)
        .select(col("id").as("query_id"), col("embedding").as("q_emb"),
          col("q_nrm"), col("table"),
          explode(probeKeys(col("bucket"), nPlanes)).as("bucket")))
    val cand = bucketed.join(q, Seq("table", "bucket"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", VectorFunctions.dot(col("q_emb"), col("c_emb")) /
        (col("q_nrm") * col("c_nrm")))
    // a pair found by several tables/probes collapses to one entry inside
    // the top-k buffer — no dropDuplicates shuffle needed
    topKMerge(cand, k)
  }

  /** ENGINE-PORTABLE LSH ANN face: single-table hyperplane bucketing on
    * [[VectorFunctions.portableHyperplaneKey]] (md5-52 sign matrix) +
    * exact cosine rerank within the bucket — every stage (projection
    * signs, bucket assignment, candidate join, similarity, top-k order)
    * exactly reproducible in DuckDB, so `q_ann_lsh_portable` is
    * oracle-checked END-TO-END where the production [[lshTopK]]
    * (xxhash64 signs, multi-probe, multi-table) can only be recall-gated.
    * Same plan shape: queries broadcast, corpus never shuffles, bounded
    * top-k merge.
    */
  def portableLshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    val key = VectorFunctions.portableHyperplaneKey(col("embedding"), nPlanes)
    val c = corpus.select(col("id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("c_nrm"), key.as("bucket"))
    val q = broadcast(queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"),
      VectorFunctions.l2Norm(col("embedding")).as("q_nrm"), key.as("bucket")))
    val cand = c.join(q, Seq("bucket"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", VectorFunctions.dot(col("q_emb"), col("c_emb")) /
        (col("q_nrm") * col("c_nrm")))
    topKMerge(cand, k)
  }

  /** Embedding-cosine near-dup pairs within a semantic blocking key, with
    * adaptive sub-blocking — the guard against the quadratic bomb a
    * popular block becomes at 100 TB:
    *
    *   - blocks of at most `maxBlockSize` rows: exact all-pairs. With many
    *     small blocks (the common case) this is both exact and optimal —
    *     output is bounded by Σ blockᵢ² ≤ maxBlockSize · n;
    *   - larger blocks: LSH sub-blocking. Each row buckets into `nTables`
    *     random-hyperplane sign keys; candidate pairs share (block, table,
    *     bucket) directly or at hamming-1 (each row also probes its
    *     single-bit-flip buckets); exact cosine verification follows. Cost
    *     is linear in block size × tables; recall < 1 is the explicit,
    *     documented tradeoff (levers: `nPlanes` down / `nTables` up), and
    *     is asserted against exact ground truth in SimilaritySpec.
    *
    * Both paths verify with exact cosine, so precision is always 1.
    */
  def cosineDupPairs(df: DataFrame, blockCol: String, threshold: Double,
      maxBlockSize: Int = 10000, nPlanes: Int = 6, nTables: Int = 8): DataFrame = {
    val base = df.select(col(blockCol).as("blk"), col("id"), col("embedding"),
      VectorFunctions.l2Norm(col("embedding")).as("nrm"))
      .withColumn("blk_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("blk")))

    // norms precomputed per row; dot/(nrm·nrm) is bit-identical to
    // cosine() but keeps one O(dim) reduction per pair instead of three
    def verified(pairs: DataFrame): DataFrame = pairs
      .withColumn("sim", VectorFunctions.dot(col("e_a"), col("e_b")) /
        (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))

    // exact tier: all-pairs within bounded blocks
    val small = base.filter(col("blk_n") <= maxBlockSize)
    val exactPairs = verified(
      small.select(col("blk"), col("id").as("id_a"), col("embedding").as("e_a"),
        col("nrm").as("nrm_a"))
        .join(small.select(col("blk"), col("id").as("id_b"),
          col("embedding").as("e_b"), col("nrm").as("nrm_b")), Seq("blk"))
        .filter(col("id_a") < col("id_b")))

    // LSH tier: linear-cost sub-blocking inside oversized blocks
    val big = base.filter(col("blk_n") > maxBlockSize)
    val bucketed = big.withColumn("t", explode(array((0 until nTables).map(t =>
        struct(lit(t).as("table"),
          VectorFunctions.randomHyperplaneKey(col("embedding"), nPlanes, t)
            .as("bucket"))): _*)))
      .select(col("blk"), col("id"), col("embedding"), col("nrm"),
        col("t.table").as("table"), col("t.bucket").as("bucket"))
    // the probing side also emits every hamming-1 flip of its own bucket,
    // so pairs whose keys differ by one plane still collide
    val probing = bucketed.withColumn("bucket",
      explode(array((col("bucket") +: (0 until nPlanes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p)))): _*)))
    val lshPairs = verified(
      probing.select(col("blk"), col("table"), col("bucket"),
        col("id").as("id_a"), col("embedding").as("e_a"),
        col("nrm").as("nrm_a"))
        .join(bucketed.select(col("blk"), col("table"), col("bucket"),
          col("id").as("id_b"), col("embedding").as("e_b"),
          col("nrm").as("nrm_b")),
          Seq("blk", "table", "bucket"))
        .filter(col("id_a") < col("id_b"))
        // the same pair collides once per shared table/probe direction
        .dropDuplicates("id_a", "id_b"))

    exactPairs.unionByName(lshPairs)
  }
}
