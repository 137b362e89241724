package org.apache.spark.sql
package graftglue

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression conversion (the
  * supported classic-API path since Spark 4 hid Column's expression
  * constructor). Lives under org.apache.spark.sql so the private[sql]
  * members are visible; keeps ALL other graft code outside Spark packages.
  */
object GraftSqlGlue {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Spark's own Hive-style partition-path unescape (%XX for the chars its
    * writer escapes — NOT URL decoding). */
  def unescapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)
}
