package graft.core

import java.sql.Timestamp

/** Case-class models for the typed `Dataset[T]` surface (SURVEY S2 —
  * `DatasetApi.ipynb:77-153`'s Event/Device/EventWithDeviceInfo trio,
  * remapped onto the synthetic schema). `Option[_]` encodes
  * nullability: a NULL in a non-Option column fails at
  * deserialization, which is the typed contract the reference
  * demonstrates.
  */
object Models {

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Option[Long],
      event_type: String,
      value: Option[Double],
      props: Option[String])

  final case class Customer(
      c_custkey: Long,
      c_name: String,
      c_nationkey: Int,
      c_acctbal: Double,
      c_mktsegment: String)

  final case class Order(
      o_orderkey: Long,
      o_custkey: Long,
      o_orderstatus: String,
      o_totalprice: Double,
      o_orderdate: Timestamp,
      o_orderpriority: String)

  final case class OrderWithCustomer(
      o_orderkey: Long,
      o_totalprice: Double,
      customer_name: String,
      segment: String)
}
