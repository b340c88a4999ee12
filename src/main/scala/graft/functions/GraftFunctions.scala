package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.{lit, sqrt}

/** Column-level API + SQL registration for the graft native
  * expressions. Use `withExtensions(new GraftExtensions)` at session
  * build, or `GraftFunctions.register(spark)` on an existing session.
  */
object GraftFunctions {
  // Spark 4: Column is a ColumnNode facade; the bridge exposes the
  // package-private converters to Catalyst Expressions.
  import org.apache.spark.sql.GraftColumnBridge.{column => c, expression => ex}

  def vectorDot(a: Column, b: Column): Column = c(VectorDot(ex(a), ex(b)))
  def vectorNorm(a: Column): Column = c(VectorNorm(ex(a)))

  /** cosine(a, b) = dot/(‖a‖·‖b‖) — composed from the two codegen'd
    * primitives so the numeric order matches the oracle formula. */
  def cosineSimilarity(a: Column, b: Column): Column =
    vectorDot(a, b) / (vectorNorm(a) * vectorNorm(b))

  def crc24q(bin: Column): Column = c(Crc24qExpr(ex(bin)))
  def rollingHash64(s: Column): Column = c(RollingHash64(ex(s)))
  def minhash64(shingles: Column): Column = c(MinHash64(ex(shingles)))

  private val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_dot" -> (es => VectorDot(es(0), es(1))),
    "vector_norm" -> (es => VectorNorm(es.head)),
    "crc24q" -> (es => Crc24qExpr(es.head)),
    "rolling_hash64" -> (es => RollingHash64(es.head)),
    "minhash64" -> (es => MinHash64(es.head)))

  /** Imperative registration (temp functions on this session). */
  def register(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Injection-based registration for
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) = new ExpressionInfo("graft.functions", name)
    ext.injectFunction((FunctionIdentifier("vector_dot"), info("vector_dot"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("vector_norm"), info("vector_norm"),
      (es: Seq[Expression]) => VectorNorm(es.head)))
    ext.injectFunction((FunctionIdentifier("crc24q"), info("crc24q"),
      (es: Seq[Expression]) => Crc24qExpr(es.head)))
    ext.injectFunction((FunctionIdentifier("rolling_hash64"), info("rolling_hash64"),
      (es: Seq[Expression]) => RollingHash64(es.head)))
  }
}
