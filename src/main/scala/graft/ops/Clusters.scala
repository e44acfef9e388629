package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Duplicate-cluster formation for corpus dedup pipelines (north-star
  * extension — no analogue in the reference). Near-dup detection
  * ([[Dedup.minhashLsh]], [[Similarity.cosineNearDupPairs]]) emits PAIRS;
  * choosing one representative per duplicate GROUP needs the transitive
  * closure of those pairs — connected components over the pair graph.
  *
  * Spark-first design: iterative min-label propagation on DataFrames.
  * Each round is one join + one partial-aggregated groupBy (both keyed
  * shuffles, no driver-side data); labels only decrease, so convergence
  * is detected by a scalar checksum (sum of labels, exact in
  * DECIMAL(38,0)) rather than a row-level diff join. Rounds needed =
  * graph diameter — for dedup graphs (near-cliques around a shared
  * document) that is 2–3 in practice. `localCheckpoint` truncates the
  * growing lineage each round so plan compilation stays O(1) per round
  * at any corpus size.
  */
object Clusters {

  /** Connected components over an undirected edge list. Returns one row
    * per node that appears in at least one pair: (id, cluster) with
    * cluster = the minimum node id in the component. Nodes absent from
    * `pairs` are singletons by definition and are not emitted (at corpus
    * scale the pair graph is tiny next to the corpus; callers left-join
    * and coalesce(cluster, id) to label singletons without ever
    * shuffling the corpus through the iteration).
    */
  def connectedComponents(pairs: DataFrame, idA: Column, idB: Column,
                          maxIter: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame = {
    // localCheckpoint blocks live on executors — right locally, but on a
    // lossy cluster an executor death mid-iteration kills the truncated
    // lineage. A reliable dir trades per-round write cost for
    // fault-tolerant long-running clustering jobs.
    val spark = pairs.sparkSession
    // NOTE: setCheckpointDir is SparkContext-GLOBAL — concurrent callers
    // that also use reliable checkpoints share whichever dir was set last.
    // Checkpoint files accumulate one set per iteration; enable
    // spark.cleaner.referenceTracking.cleanCheckpoints (or clean the dir
    // after the job) for long-running incremental pipelines.
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    // the checksum convergence test is exact ONLY for integral labels:
    // a DECIMAL(38,0) cast silently rounds fractional ids (two opposite
    // roundings leave the sum unchanged -> premature "convergence" ->
    // split clusters) and string ids don't sum at all. Validate BEFORE
    // the first pin — checkpoints are eager, so a post-pin guard would
    // execute a full corpus-scale edge job just to throw
    pairs.select(idA.as("src"), idB.as("dst")).schema.fields.foreach { f =>
      require(f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }, s"connectedComponents ids must be integral (byte/short/int/long); " +
        s"got ${f.name}: ${f.dataType.simpleString} — map ids to dense longs first " +
        "(the label-sum convergence checksum is only exact for integers)")
    }

    val edges = pin(pairs.select(idA.as("src"), idB.as("dst"))
      .union(pairs.select(idB.as("src"), idA.as("dst")))
      .distinct())

    var labels = pin(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")))
    var prevSum = checksum(labels)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .select(col("src").as("id"), col("label"))
      val next = pin(labels.union(propagated)
        .groupBy(col("id")).agg(min(col("label")).as("label")))
      val s = checksum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    // an unconverged result would silently split one component into
    // several clusters (duplicate groups keep extra representatives) —
    // fail loudly; dedup graphs have small diameters, so hitting the cap
    // means the cap is wrong for this graph, not that "close enough" ran out
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        s"the pair graph has diameter > $maxIter; raise maxIter")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Exact scalar convergence check: labels are monotonically
    * non-increasing, so the component assignment is stable iff the label
    * sum stopped moving. DECIMAL(38,0) so 64-bit ids cannot overflow.
    */
  private def checksum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("label").cast(DecimalType(38, 0)))).head.getDecimal(0)

  /** Cluster summary: representative (= cluster id, the min member) and
    * member count per duplicate group.
    */
  def clusterSizes(components: DataFrame): DataFrame =
    components.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))

  /** Fold NEW near-dup pairs into an EXISTING (id, cluster) assignment —
    * the incremental-ingestion step after `DedupIndex.append` + `check`:
    * new pairs may link fresh docs into old groups or even merge two old
    * groups transitively. Each existing assignment is itself an edge
    * (member — representative), so the merged assignment is connected
    * components over assignments ∪ newPairs; the iteration therefore
    * runs over cluster-graph-sized data (one edge per already-clustered
    * doc plus the new pairs), never the corpus. Equivalent to a full
    * rebuild over the union of all pairs ever seen (asserted in
    * PipelineOpsSpec), at the cost of the new batch.
    */
  def merge(assignments: DataFrame, newPairs: DataFrame,
            idA: Column, idB: Column, maxIter: Int = 50,
            checkpointDir: Option[String] = None): DataFrame = {
    val asEdges = assignments
      .select(col("id").as("id_a"), col("cluster").as("id_b"))
      .where(col("id_a") =!= col("id_b")) // representatives need no self-edge
    connectedComponents(
      asEdges.union(newPairs.select(idA.as("id_a"), idB.as("id_b"))),
      col("id_a"), col("id_b"), maxIter, checkpointDir)
  }
}
