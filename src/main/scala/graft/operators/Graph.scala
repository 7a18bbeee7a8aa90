package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property-graph-over-relational modeling (reference
  * `lecture-lab/graph_ddls.sql:7-33`): vertices(identifier, type,
  * properties) and edges(subject, object, edge_type, properties), with
  * the property bag serialized as a JSON string (the reference builds
  * it with `json_build_object`, `team_vertices.sql:8-14`; its own Spark
  * port uses a MAP — we keep JSON for cross-engine comparability).
  * All reference graph operations are relational; no GraphX needed.
  */
object Graph {

  /** Build a vertex table from any entity DataFrame. Property order is
    * preserved (JSON key order is deterministic).
    */
  def vertices(df: DataFrame, id: Column, vertexType: String,
      props: Seq[(String, Column)]): DataFrame =
    df.select(
      id.cast("string").as("identifier"),
      lit(vertexType).as("vertex_type"),
      to_json(struct(props.map { case (n, c) => c.as(n) }: _*))
        .as("properties"))

  /** Triangle census of an undirected graph given canonical edges
    * (u < v, one row per edge), as one summary row. "Wedges" here are
    * the ordered candidate paths a<b<c with both legs (a,b), (b,c)
    * present — exactly the triple set a triangle can close over, so
    * each triangle is generated and counted precisely once (this is
    * smaller than the graph-theoretic 2-path count, which centers any
    * vertex).
    *
    * Relational formulation: wedge = edges ⋈ edges on e1.v = e2.u
    * (the a<b<c ordering is free because every edge is stored small→
    * large), closed by checking a third edge copy for (a,c). At scale
    * the join keys are vertex ids — shuffle-partitioned both sides;
    * when the edge list is bounded (top-K edges, as in q64) the joins
    * broadcast instead.
    */
  def triangleCensus(edges: DataFrame): DataFrame = {
    val e1 = edges.select(col("u").as("a"), col("v").as("b"))
    val e2 = edges.select(col("u").as("b"), col("v").as("c"))
    val e3 = edges.select(col("u").as("a"), col("v").as("c"),
      lit(1).as("_closed"))
    val wedges = e1.join(e2, "b").select(col("a"), col("b"), col("c"))
    val closed = wedges.join(e3, Seq("a", "c"), "left")
      .agg(
        count(lit(1)).as("n_wedges"),
        count(col("_closed")).as("n_triangles"))
    edges.agg(count(lit(1)).as("n_edges")).crossJoin(closed)
  }

  /** Build an edge table between two identified endpoints. */
  def edges(df: DataFrame, subjectId: Column, subjectType: String,
      objectId: Column, objectType: String, edgeType: String,
      props: Seq[(String, Column)]): DataFrame =
    df.select(
      subjectId.cast("string").as("subject_identifier"),
      lit(subjectType).as("subject_type"),
      objectId.cast("string").as("object_identifier"),
      lit(objectType).as("object_type"),
      lit(edgeType).as("edge_type"),
      to_json(struct(props.map { case (n, c) => c.as(n) }: _*))
        .as("properties"))
}
