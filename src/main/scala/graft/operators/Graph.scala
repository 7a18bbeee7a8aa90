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
