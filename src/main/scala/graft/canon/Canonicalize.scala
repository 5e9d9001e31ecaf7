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
  * when no label changes. `localCheckpoint` every round truncates the
  * growing lineage (the standard GraphFrames-style pattern).
  */
object Canonicalize {

  /** sameAs edges from entity-link output: URIs sharing a mention surface.
    * Input columns: (mention, uri). Output: (src, dst) URI pairs.
    */
  def sameAsEdges(mentionUri: DataFrame): DataFrame = {
    val m = mentionUri
      .select(lower(col("mention")).as("m"), col("uri"))
      .filter(col("uri").startsWith("http"))
      .distinct()
    // per-mention min URI as hub → star edges, avoids quadratic pair blowup
    val hubs = m.groupBy("m").agg(min("uri").as("hub"))
    m.join(hubs, "m")
      .filter(col("uri") =!= col("hub"))
      .select(col("uri").as("src"), col("hub").as("dst"))
      .distinct()
  }

  /** Connected components via iterative min-label propagation.
    * edges: (src, dst) strings. Returns (node, component).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = bidir.select(col("src").as("node"))
      .union(bidir.select(col("dst").as("node")))
      .distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
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
      val next = labels.select(col("node"), col("component"))
        .union(viaNeighbors)
        .union(jumped)
        .groupBy("node").agg(min("component").as("component"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("component", "old"), "node")
        .filter(col("component") =!= col("old")).count()
      labels = next
      iter += 1
    }
    labels
  }

  /** Rewrite triple subj/obj URIs to their component representative.
    * Mapping is typically small relative to triples (it only contains
    * aliased URIs) → broadcast hash joins, no shuffle of the triple table.
    */
  def rewrite(triples: Dataset[Triple], mapping: DataFrame): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val m = broadcast(mapping.select(col("node"), col("component")))
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

  /** Full pass: edges from mention/uri pairs, CC, rewrite, dedup. */
  def canonicalize(triples: Dataset[Triple], mentionUri: DataFrame): Dataset[Triple] = {
    val cc = connectedComponents(sameAsEdges(mentionUri))
    rewrite(triples, cc).dropDuplicates("docId", "subj", "frame", "pred", "obj")
  }
}
