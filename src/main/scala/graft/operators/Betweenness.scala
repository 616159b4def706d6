package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampled-source Brandes betweenness centrality (SURVEY G4).
  *
  * Replaces the reference's GDS `betweenness.stream` call
  * (`analysis_queries.md:221-227`). Exact Brandes is O(V·E); the standard
  * scale approach samples k source vertices (Brandes/Pich) and scales.
  *
  * Implementation is fully relational and batched: ALL k sources run
  * simultaneously with shuffle keys (root, id) — one level-synchronous
  * forward BFS accumulating shortest-path counts (sigma), then a backward
  * per-level dependency accumulation. Each level is one join + one
  * aggregation, localCheckpointed so lineage stays O(1). k scales the
  * state linearly (k·V rows), never the number of supersteps — the same
  * plan shape a 1000-executor cluster would run.
  *
  * Determinism: sources are a seed-stable hash-ordered sample; sigma is
  * exact integer path counting; only the final double dependency sums are
  * subject to fp addition order (no oracle depends on them).
  */
object Betweenness {

  /** @param edges (src, dst) long ids; treated per `directed`
    * @param k number of sampled sources (all vertices if k >= |V|)
    * @return (id, betweenness, scaled) — `scaled` multiplies by |V|/k to
    *         estimate the full sum; directed-path convention (an
    *         undirected pair contributes from both endpoints when both are
    *         sampled). */
  def approx(
      edges: DataFrame,
      k: Int = 16,
      seed: Long = 42L,
      maxDepth: Int = 20,
      directed: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val e = (if (directed) e0
      else e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst"))))
      .distinct()
      .localCheckpoint()

    val vertices = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val nV = vertices.count()

    val sources = vertices
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(k)
      .select(col("id").as("root"))

    // ---- forward: level-synchronous BFS with path counting ----
    // visited: (root, id, depth, sigma); frontier: rows added at this level
    var visited = sources
      .select(col("root"), col("root").as("id"), lit(0).as("depth"),
        lit(1L).as("sigma"))
      .localCheckpoint()
    var frontier = visited
    var depth = 0
    var levels = List(0)
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = frontier
        .join(e, frontier("id") === e("src"))
        .groupBy(col("root"), e("dst").as("id"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(visited.select(col("root").as("vr"), col("id").as("vi")),
          col("root") === col("vr") && col("id") === col("vi"), "left_anti")
        .withColumn("depth", lit(depth))
        .select("root", "id", "depth", "sigma")
        .localCheckpoint()
      if (!next.isEmpty) {
        visited = visited.unionByName(next).localCheckpoint()
        frontier = next
        levels = depth :: levels
      } else frontier = next
    }

    // ---- backward: dependency accumulation, deepest level first ----
    // deltas holds (root, id, depth, sigma, delta), delta finalized once
    // every deeper level has pushed its contribution up
    var deltas = visited.withColumn("delta", lit(0.0)).localCheckpoint()
    levels.filter(_ > 0).foreach { d =>
      val w = deltas.filter(col("depth") === d)
        .select(col("root").as("wr"), col("id").as("wid"),
          col("sigma").as("wsigma"), col("delta").as("wdelta"))
      // contributions flow along edges v -> w with depth(v) = d-1
      val contrib = e
        .join(w, e("dst") === col("wid"))
        .select(col("wr").as("root"), e("src").as("id"),
          col("wsigma"), col("wdelta"))
        .join(deltas.filter(col("depth") === d - 1)
            .select(col("root").as("vr"), col("id").as("vi"),
              col("sigma").as("vsigma")),
          col("root") === col("vr") && col("id") === col("vi"))
        .groupBy(col("root"), col("id"))
        .agg(sum(col("vsigma").cast("double") / col("wsigma").cast("double") *
          (lit(1.0) + col("wdelta"))).as("contrib"))
      deltas = deltas
        .join(contrib.withColumnRenamed("root", "cr").withColumnRenamed("id", "ci"),
          col("root") === col("cr") && col("id") === col("ci"), "left_outer")
        .withColumn("delta", col("delta") + coalesce(col("contrib"), lit(0.0)))
        .drop("cr", "ci", "contrib")
        .localCheckpoint()
    }

    val bc = deltas
      .filter(col("depth") > 0) // exclude the source itself
      .groupBy(col("id"))
      .agg(sum(col("delta")).as("betweenness"))
    // vertices never reached as intermediates get 0
    vertices.join(bc, Seq("id"), "left_outer")
      .withColumn("betweenness", coalesce(col("betweenness"), lit(0.0)))
      .withColumn("scaled",
        col("betweenness") * lit(nV.toDouble / math.min(k, nV).toDouble))
  }
}
