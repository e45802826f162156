package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A5: producer-map topic routing (route81.go:1330-1351).
  *
  * First matching rule wins; a rule matches when its namespace is
  * empty, equal to, or a prefix of the message namespace; an optional
  * global prefix is prepended. Compiles to one CASE expression —
  * evaluated inside codegen, no lookup table or UDF, so routing a
  * trillion messages costs a string-compare chain per row.
  */
object Router {

  final case class ProducerMap(mongoNamespace: String, kafkaTopic: String)

  def topic(ns: Column, maps: Seq[ProducerMap], topicPrefix: String = ""): Column = {
    val routed = maps.foldLeft[Option[Column]](None) { (acc, m) =>
      val cond =
        if (m.mongoNamespace.isEmpty) lit(true)
        else ns === m.mongoNamespace || ns.startsWith(m.mongoNamespace)
      Some(acc match {
        case None      => when(cond, lit(m.kafkaTopic))
        case Some(c)   => c.when(cond, lit(m.kafkaTopic))
      })
    }
    val base = routed.map(_.otherwise(ns)).getOrElse(ns)
    if (topicPrefix.isEmpty) base else concat(lit(topicPrefix + "."), base)
  }
}
