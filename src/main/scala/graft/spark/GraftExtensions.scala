package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ImageMetaFunctions, TextHashFunctions, VectorFunctions}

/** Session-extensions entry point: injects every graft codegen'd function
  * (vector similarity/LSH/IVF kernels, text-hash kernels, media header
  * parsers) into the session at build time, so a cluster operator enables
  * the whole surface with CONFIG ONLY — no code:
  *
  * {{{
  * spark.sql.extensions=graft.spark.GraftExtensions
  * }}}
  *
  * or programmatically `SparkSession.builder().withExtensions(new
  * GraftExtensions)`. After that, plain SQL works everywhere the session
  * reaches (thriftserver, notebooks, `spark.sql(...)`):
  *
  * {{{
  * SELECT doc_id FROM docs WHERE cosine_similarity(emb, array(...)) > 0.9
  * SELECT simhash64(text) FROM docs
  * }}}
  *
  * The per-object `register(spark)` helpers remain for session-scoped,
  * code-driven use; both routes share the same function descriptions, so
  * the surfaces cannot drift apart. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    val all = VectorFunctions.descriptions ++
      TextHashFunctions.descriptions ++
      ImageMetaFunctions.descriptions
    all.foreach { case (name, clazz, builder) =>
      extensions.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder))
    }
  }
}
