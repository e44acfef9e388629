package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stateless record operators: map / filter / flatMap / keyBy.
  *
  * Mirrors the reference's stateless operator set
  * (reference: taskmanager/operators/stateless.py:14-152) but expressed as
  * column transforms so Catalyst keeps them inside whole-stage codegen and
  * can push predicates/pruning into the scan. The reference applies opaque
  * Python closures one record at a time and *swallows* operator exceptions
  * (stateless.py:42-45); we are declarative and fail fast.
  */
object Stateless {

  /** MapOperator (reference: stateless.py:14-45): 1→1 transform.
    * Expressed as a projection; each (name, expr) pair becomes a column.
    */
  def mapRecords(df: DataFrame, exprs: (String, Column)*): DataFrame =
    df.select(exprs.map { case (n, c) => c.as(n) }: _*)

  /** FilterOperator (reference: stateless.py:48-79): keep iff predicate. */
  def filterRecords(df: DataFrame, predicate: Column): DataFrame =
    df.where(predicate)

  /** FlatMapOperator (reference: stateless.py:82-116): 1→N.
    * The reference's only production use is line→words in word count
    * (examples/word_count.py:19-21); the general form is a generator
    * expression over an array column.
    */
  def flatMap(df: DataFrame, arrayExpr: Column, outName: String): DataFrame =
    df.withColumn(outName, explode(arrayExpr))

  /** Tokenize a text column: lowercase, split on whitespace runs, drop
    * empties. The canonical reference flatMap
    * (examples/word_count.py:19-25: `line.split()` + `word.lower()`).
    * Single codegen'd kernel ([[graft.functions.Kernels.Tokens]]) with the
    * exact semantics of `filter(split(lower(text), "\\s+"), length(_) > 0)`
    * — the higher-order `filter` form can't codegen and would push every
    * text scan out of its WholeStageCodegen span.
    */
  def tokens(text: Column): Column =
    graft.functions.Kernels.graft_tokens(text)

  /** Typed closure forms of map/filter/flatMap — the reference's entire
    * user surface is arbitrary pickled Python callables (SURVEY §2.12);
    * on Datasets the same closures are Scala lambdas with no
    * serialization cliff. Prefer the Column forms above (codegen'd);
    * use these when the transform genuinely needs arbitrary code.
    */
  def mapTyped[T, U: org.apache.spark.sql.Encoder](ds: org.apache.spark.sql.Dataset[T])(f: T => U): org.apache.spark.sql.Dataset[U] =
    ds.map(f)

  def filterTyped[T](ds: org.apache.spark.sql.Dataset[T])(p: T => Boolean): org.apache.spark.sql.Dataset[T] =
    ds.filter(p)

  def flatMapTyped[T, U: org.apache.spark.sql.Encoder](ds: org.apache.spark.sql.Dataset[T])(f: T => IterableOnce[U]): org.apache.spark.sql.Dataset[U] =
    ds.flatMap(f)

  /** KeyByOperator (reference: stateless.py:119-152, SHUFFLE edge
    * job_graph.py:393-399): explicit hash repartition by key. In Spark the
    * shuffle is implicit in downstream groupBy/join; use this only to
    * pre-co-locate several same-key stages so they reuse one exchange.
    */
  def keyBy(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(keys: _*)
}
