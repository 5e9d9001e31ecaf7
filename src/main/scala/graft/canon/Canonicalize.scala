package graft.canon

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Triple

/** Entity canonicalization: sameAs edges → connected components →
  * triple rewrite (north_star: "canonicalization via connected-components
  * (GraphFrames-style iterative DataFrame joins) over sameAs edges").
  *
  * The reference has no canonicalization (each doc links independently);
  * at web scale the same entity surfaces under many URIs/mention spellings,
  * so we cluster URIs that share a lowercased mention surface and rewrite
  * every triple's subj/obj to the cluster representative (lexicographic
  * min — deterministic).
  *
  * CC is min-label propagation by iterative joins with AQE handling the
  * head-entity skew (a handful of URIs like wiki/Americans participate in
  * a large share of edges): each round joins current labels to the
  * bidirected edge list, takes the min over neighbors + self, and stops
  * when no label changes. Lineage is truncated every round — by reliable
  * `checkpoint` when a checkpoint dir is configured (survives executor
  * loss on a real cluster), else `localCheckpoint` (fine for local/test).
  */
object Canonicalize {

  /** sameAs edges from entity-link output: URIs sharing a mention surface.
    * Input columns: (mention, uri). Output: (src, dst) URI pairs.
    *
    * Genuinely ambiguous surfaces — those the disambiguator resolves
    * per-document to DIFFERENT entities ("Chinese" → China vs
    * Chinese_language) — must NOT generate edges: merging them would undo
    * the per-document disambiguation. `ambiguousSurfaces` (lowercased) is
    * that exclusion list; by default it comes from the same candidate
    * dictionary the disambiguator uses.
    */
  def sameAsEdges(
      mentionUri: DataFrame,
      ambiguousSurfaces: Set[String]): DataFrame = {
    val spark = mentionUri.sparkSession
    import spark.implicits._
    val amb = ambiguousSurfaces.toSeq.sorted.toDF("m")
    val m = mentionUri
      .select(lower(col("mention")).as("m"), col("uri"))
      .filter(col("uri").startsWith("http"))
      .join(broadcast(amb), Seq("m"), "left_anti")
      .distinct()
    // per-mention min URI as hub → star edges, avoids quadratic pair blowup
    val hubs = m.groupBy("m").agg(min("uri").as("hub"))
    m.join(hubs, "m")
      .filter(col("uri") =!= col("hub"))
      .select(col("uri").as("src"), col("hub").as("dst"))
      .distinct()
  }

  /** Default exclusion list: every surface the disambiguation dictionary
    * lists >1 candidate URI for (link.Disambiguator.isAmbiguous).
    */
  def defaultAmbiguousSurfaces: Set[String] =
    graft.link.Disambiguator.default.candidates
      .collect { case (surface, cs) if cs.length > 1 => surface }.toSet

  def sameAsEdges(mentionUri: DataFrame): DataFrame =
    sameAsEdges(mentionUri, defaultAmbiguousSurfaces)

  /** Connected components via iterative min-label propagation with
    * pointer jumping.
    *
    * @param edges           (src, dst) string pairs
    * @param maxIter         hard round cap; with pointer jumping rounds
    *                        grow O(log diameter), so 20 covers ~2^20
    * @param checkpointDir   when set, per-round reliable `checkpoint` into
    *                        this directory (cluster-safe: survives executor
    *                        loss, unlike `localCheckpoint` whose truncated
    *                        lineage dies with its executors)
    * @param convergeEvery   run the convergence-count job only every k
    *                        rounds (each check is an extra Spark job; at
    *                        scale checking every round doubles job count)
    * @throws IllegalStateException if labels were still changing at
    *                        maxIter — silent unconverged output would
    *                        rewrite triples to non-canonical representatives
    * @return (node, component)
    */
  def connectedComponents(
      edges: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      convergeEvery: Int = 2): DataFrame = {
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def save(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    val bidir = save(
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())

    // seed with round 1 for free: every node starts at min(self, neighbors)
    // — one groupBy instead of the loop's join+union+groupBy (bidir is
    // symmetric, so every node appears on the src side)
    var labels = save(
      bidir.select(col("src").as("node"), col("dst").as("component"))
        .union(bidir.select(col("src").as("node"), col("src").as("component")))
        .groupBy("node").agg(min("component").as("component")))

    var converged = false
    var iter = 0
    var lastChecked = labels
    while (!converged && iter < maxIter) {
      val viaNeighbors = bidir
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("component"))
      // pointer jumping (path compression) off the previous round's labels
      // (safe self-join: labels is checkpointed, lineage already broken):
      // node n with label c adopts c's own label — O(log diameter) rounds
      // instead of O(diameter), the difference between ~40 and ~6 shuffle
      // rounds at web scale
      val jumped = labels
        .join(
          labels.select(col("node").as("component"), col("component").as("jump")),
          Seq("component"))
        .select(col("node"), col("jump").as("component"))
      labels = save(
        labels.select(col("node"), col("component"))
          .union(viaNeighbors)
          .union(jumped)
          .groupBy("node").agg(min("component").as("component")))
      iter += 1
      if (iter % convergeEvery == 0 || iter == maxIter) {
        val changed = labels
          .join(lastChecked.withColumnRenamed("component", "old"), "node")
          .filter(col("component") =!= col("old")).count()
        converged = changed == 0
        lastChecked = labels
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "raise maxIter (components would be silently split otherwise)")
    labels
  }

  /** Rewrite triple subj/obj URIs to their component representative.
    *
    * The mapping only contains aliased URIs, typically tiny next to the
    * triple table — but "typically" is not a plan: at 10^12-doc scale the
    * alias mapping itself can be huge, and an unconditional broadcast OOMs
    * the driver. The mapping is counted once (it is small relative to the
    * job) and broadcast only under `broadcastMaxRows`; above that it goes
    * through a plain shuffled join, where AQE handles skewed URIs.
    */
  def rewrite(
      triples: Dataset[Triple],
      mapping: DataFrame,
      broadcastMaxRows: Long = 1000000L): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val m0 = mapping.select(col("node"), col("component"))
    val m = if (m0.count() <= broadcastMaxRows) broadcast(m0) else m0
    triples.toDF()
      .join(m.withColumnRenamed("node", "subj").withColumnRenamed("component", "subj_canon"),
        Seq("subj"), "left")
      .join(m.withColumnRenamed("node", "obj").withColumnRenamed("component", "obj_canon"),
        Seq("obj"), "left")
      .select(
        col("docId"),
        coalesce(col("subj_canon"), col("subj")).as("subj"),
        col("subjIsUri"),
        col("frame"), col("role"), col("pred"),
        coalesce(col("obj_canon"), col("obj")).as("obj"),
        col("objIsUri"))
      .as[Triple]
  }

  /** Full pass: edges from mention/uri pairs, CC, rewrite, dedup.
    * `checkpointDir` selects the reliable (cluster-safe) per-round
    * checkpoint for the CC iterations; None = localCheckpoint
    * (single-JVM/test runs).
    */
  def canonicalize(
      triples: Dataset[Triple],
      mentionUri: DataFrame,
      ambiguousSurfaces: Set[String],
      checkpointDir: Option[String] = None): Dataset[Triple] = {
    val cc = connectedComponents(
      sameAsEdges(mentionUri, ambiguousSurfaces), checkpointDir = checkpointDir)
    rewrite(triples, cc).dropDuplicates("docId", "subj", "frame", "pred", "obj")
  }

  def canonicalize(triples: Dataset[Triple], mentionUri: DataFrame): Dataset[Triple] =
    canonicalize(triples, mentionUri, defaultAmbiguousSurfaces)
}
