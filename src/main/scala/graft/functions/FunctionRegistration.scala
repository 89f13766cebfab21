package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-level registration shared by every function family: one place
  * turns a (name, impl class, builder) description into a registry entry,
  * so the three families and [[graft.spark.GraftExtensions]] cannot drift
  * in how functions are exposed. Idempotent per session. */
object FunctionRegistration {
  def register(spark: SparkSession,
      descriptions: Seq[(String, Class[_], Seq[Expression] => Expression)]): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptions.foreach { case (name, clazz, builder) =>
      val ident = FunctionIdentifier(name)
      if (!reg.functionExists(ident))
        reg.registerFunction(ident, new ExpressionInfo(clazz.getName, name), builder)
    }
  }
}
