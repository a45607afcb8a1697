package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** MinHash signature as a native declarative aggregate.
  *
  * `minhash_agg(shingle, k)` folds a group's shingles into a k-element
  * array of permutation minima — the MinHash signature — in ONE
  * aggregate buffer. Being a `DeclarativeAggregate` (pure Catalyst
  * expressions for init/update/merge), it:
  *
  *  - participates in hash aggregation with map-side partial merge, so
  *    the shuffle carries one k-long array per (partition, doc), not
  *    posting rows;
  *  - needs no UDAF object serialization and stays codegen-compatible;
  *  - uses the standard double-hashing construction
  *    h_i(s) = a(s) + i·b(s), with a,b < 2^31 so the arithmetic cannot
  *    overflow under ANSI mode (i ≤ k < 2^8 ⇒ h_i < 2^39).
  *
  * This is the aggregate-side counterpart of the scalar
  * [[RollingHash]] extension point (SURVEY §3: custom Catalyst
  * expressions only where `functions._` can't express the op — here,
  * an elementwise-min array fold as a first-class aggregate).
  */
final case class MinHashAgg(child: Expression, k: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  require(k >= 1 && k <= 4096, s"signature length k out of range: $k")

  private val arrType = ArrayType(LongType, containsNull = false)

  override def dataType: DataType = arrType
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  private lazy val minima =
    AttributeReference("minima", arrType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(minima)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Array.fill(k)(Long.MaxValue), arrType))

  /** a(s) + i·b(s) for i in [0, k). */
  private def permHashes: Expression = {
    // seed 42L is xxhash64's default seed in functions.xxhash64
    val a = Pmod(XxHash64(Seq(child), 42L), Literal(1L << 31))
    val b = Pmod(XxHash64(Seq(Literal(1), child), 42L), Literal(1L << 31))
    CreateArray((0 until k).map(i => Add(a, Multiply(Literal(i.toLong), b))))
  }

  private def zipMin(x: Expression, y: Expression): Expression = {
    val l = NamedLambdaVariable("l", LongType, nullable = false)
    val r = NamedLambdaVariable("r", LongType, nullable = false)
    ZipWith(x, y, LambdaFunction(Least(Seq(l, r)), Seq(l, r)))
  }

  override lazy val updateExpressions: Seq[Expression] =
    Seq(If(IsNull(child), minima, zipMin(minima, permHashes)))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(zipMin(minima.left, minima.right))

  override lazy val evaluateExpression: Expression = minima

  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Register `minhash_agg(str, k)` as a SQL aggregate on the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_agg",
      { args =>
        require(args.length == 2, "minhash_agg(str, k) takes 2 arguments")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
        }
        MinHashAgg(args.head, k)
      },
      "scala_udf")
}
