package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` access to the analytical tables — case-class rows
  * with compile-time column safety for the operator code paths that want
  * it (SURVEY.md §1.1 "typed access via Dataset[CaseClass]").
  *
  * Encoders are Spark's product encoders: schema compatibility is checked
  * at `as[T]` analysis time, so a renamed/missing parquet column fails the
  * query at plan time rather than mid-job. Once a typed operation puts the
  * deserializer in the plan, the scan is pruned to the case-class fields
  * (TypedTablesSpec asserts the pruned ReadSchema).
  */
object TypedTables {

  final case class Region(r_regionkey: Int, r_name: String)
  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp)
  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_shipdate: java.sql.Timestamp)
  final case class Document(doc_id: Long, lang: String, text: String)
  final case class Embedding(vec_id: Long, embedding: Array[Float])

  def region(s: SparkSession, d: String): Dataset[Region] =
    { import s.implicits._; Tables.region(s, d).as[Region] }
  def nation(s: SparkSession, d: String): Dataset[Nation] =
    { import s.implicits._; Tables.nation(s, d).as[Nation] }
  def customer(s: SparkSession, d: String): Dataset[Customer] =
    { import s.implicits._; Tables.customer(s, d).as[Customer] }
  def supplier(s: SparkSession, d: String): Dataset[Supplier] =
    { import s.implicits._; Tables.supplier(s, d).as[Supplier] }
  def orders(s: SparkSession, d: String): Dataset[Order] =
    { import s.implicits._; Tables.orders(s, d).as[Order] }
  def lineitem(s: SparkSession, d: String): Dataset[Lineitem] =
    { import s.implicits._; Tables.lineitem(s, d).as[Lineitem] }
  def documents(s: SparkSession, d: String): Dataset[Document] =
    { import s.implicits._; Tables.documents(s, d).as[Document] }
  def embeddings(s: SparkSession, d: String): Dataset[Embedding] =
    { import s.implicits._; Tables.embeddings(s, d).as[Embedding] }
}
