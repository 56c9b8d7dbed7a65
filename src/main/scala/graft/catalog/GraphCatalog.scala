package graft.catalog

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Property-graph catalog: node/rel/adjacency-index registration.
  *
  * Mirrors the reference's `GraphSchema { version, nodes, relationships,
  * relationships_indexes }` (brahmand/src/graph_catalog/graph_schema.rs:7-80)
  * re-expressed as Scala case classes with JSON persistence. In the
  * reference this lives in a single-row ClickHouse ReplacingMergeTree table;
  * here it is a JSON document (file or string) plus in-memory state on the
  * Spark driver. DataFrames are resolved by table name through the session's
  * table registry (temp views / registered DataFrames).
  */
final case class NodeSchema(
    label: String,
    tableName: String,
    idColumn: String,
    primaryKeys: Seq[String],
    columns: Seq[String])

final case class RelSchema(
    label: String,
    tableName: String,
    fromLabel: String,
    toLabel: String,
    fromColumn: String,
    toColumn: String,
    columns: Seq[String],
    hasAdjIndex: Boolean)

/** Direction of a pre-aggregated adjacency index (reference:
  * `{Rel}_outgoing` / `{Rel}_incoming` tables, ddl_query.rs:290-311). */
final case class RelIndexSchema(
    baseRel: String,
    tableName: String,
    outgoing: Boolean)

final case class GraphCatalog(
    version: Long = 0L,
    nodes: Map[String, NodeSchema] = Map.empty,
    rels: Map[String, RelSchema] = Map.empty,
    relIndexes: Seq[RelIndexSchema] = Seq.empty) {

  def node(label: String): NodeSchema =
    nodes.getOrElse(label,
      throw new graft.cypher.GraftException(s"unknown node label: $label"))

  def rel(label: String): RelSchema =
    rels.getOrElse(label,
      throw new graft.cypher.GraftException(s"unknown relationship type: $label"))

  def withNode(n: NodeSchema): GraphCatalog =
    copy(version = version + 1, nodes = nodes + (n.label -> n))

  def withRel(r: RelSchema, indexes: Seq[RelIndexSchema] = Seq.empty): GraphCatalog =
    copy(version = version + 1, rels = rels + (r.label -> r),
      relIndexes = relIndexes ++ indexes)

  /** Relationship types connecting `from` -> `to` in schema orientation,
    * sorted by label for deterministic inference (the reference takes the
    * first catalog match — schema_inference.rs:375-391). */
  def relsBetween(from: String, to: String): Seq[RelSchema] =
    rels.values.filter(r => r.fromLabel == from && r.toLabel == to)
      .toSeq.sortBy(_.label)

  def toJson: String = {
    implicit val fmt: Formats = DefaultFormats
    Serialization.write(this)
  }
}

object GraphCatalog {
  def fromJson(json: String): GraphCatalog = {
    implicit val fmt: Formats = DefaultFormats
    JsonMethods.parse(json).extract[GraphCatalog]
  }
}
