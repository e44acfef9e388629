package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the similarity/dedup kernels.
  *
  * The composable higher-order-function formulations (transform/aggregate
  * lambdas) evaluate interpreted, one lambda frame per element — fine for
  * correctness, ~50x too slow for a corpus scan. These are the same kernels
  * as single expressions: one tight JVM loop per row, no per-element
  * allocation. They slot into whole-stage codegen via CodegenFallback (the
  * work is in the hash/FMA loop, not expression dispatch).
  *
  * Nothing comparable exists in the reference (its kernels are Python
  * closures); preference order per SURVEY §7.3: built-ins first, custom
  * Expression where built-ins can't express the op efficiently.
  */
object Kernels {

  private[functions] def requireStringArray(name: String, child: Expression)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name requires array<string> input, got $other")
    }

  /** k-wise MinHash signature of an Array[String]: sig[i] = min over
    * elements of xxh64(elem, seed=i). One pass over elements, k running
    * minima. Empty/missing arrays produce the degenerate all-MaxValue
    * signature (banding still works: such docs collide only with each
    * other).
    */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      Kernels.requireStringArray(prettyName, child)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          var k = 0
          while (k < numHashes) {
            val h = XXH64.hashUTF8String(s, k)
            if (h < mins(k)) mins(k) = h
            k += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  }

  /** Distinct word n-gram shingles of an Array[String]: element i is
    * tokens[i..i+n-1] joined with a single space; docs shorter than n
    * collapse to one shingle of all tokens. Insertion-ordered distinct.
    * One pass; the equivalent transform/slice/array_join lambda stack
    * evaluates interpreted at ~1.4 ms/doc.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      Kernels.requireStringArray(prettyName, child)

    private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

    override def nullSafeEval(input: Any): Any = {
      import org.apache.spark.unsafe.types.UTF8String
      val arr = input.asInstanceOf[ArrayData]
      val cnt = arr.numElements()
      val toks = new Array[UTF8String](cnt)
      var i = 0
      while (i < cnt) { toks(i) = arr.getUTF8String(i); i += 1 }
      val out = new java.util.LinkedHashSet[UTF8String]()
      if (cnt < n) {
        out.add(UTF8String.concatWs(space, toks: _*))
      } else {
        i = 0
        while (i <= cnt - n) {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = toks(i + j); j += 1 }
          out.add(UTF8String.concatWs(space, parts: _*))
          i += 1
        }
      }
      new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  }

  /** 64-bit SimHash of an Array[String] (Charikar '02): each element's
    * xxh64 votes +1/-1 on all 64 bit positions; sign of each sum forms the
    * fingerprint. One pass, 64 counters.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      Kernels.requireStringArray(prettyName, child)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = XXH64.hashUTF8String(arr.getUTF8String(i), 0L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** Random-hyperplane LSH signature of a numeric vector: bit p of the
    * result is the sign of the dot product with pseudo-random plane p,
    * whose components are derived deterministically from xxh64(p, d) —
    * reproducible with no RNG state shipped to executors. One pass per
    * plane over the vector.
    */
  case class HyperplaneSignature(child: Expression, planes: Int)
      extends UnaryExpression with CodegenFallback {
    require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_signature"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<float|double>, got $other")
      }

    private lazy val isDouble =
      child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

    /** plane component in [-0.5, 0.5), pure function of (plane, dim). */
    @inline private def comp(p: Int, d: Int): Double =
      XXH64.hashLong(p.toLong * 131071L + d, 11L).toDouble / (Long.MaxValue.toDouble * 2.0)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var sig = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0
        var d = 0
        while (d < n) {
          val x = if (isDouble) v.getDouble(d) else v.getFloat(d).toDouble
          proj += x * comp(p, d)
          d += 1
        }
        if (proj >= 0) sig |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(sig)
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneSignature = copy(child = c)
  }

  /** Rabin-Karp rolling-hash document fingerprint: polynomial hash of the
    * token stream in windows of `window` tokens, keeping the minimum
    * window hash (a winnowing-style representative). Output: one long per
    * document — equal fingerprints flag likely shared long runs. One pass,
    * O(tokens) via the rolling update h' = (h - out*B^(w-1))*B + in.
    */
  case class RollingFingerprint(child: Expression, window: Int)
      extends UnaryExpression with CodegenFallback {
    require(window >= 1, "window must be >= 1")
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_fingerprint"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      Kernels.requireStringArray(prettyName, child)

    private val B = 1000003L

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // token -> stable 64-bit value
      def tok(i: Int): Long = XXH64.hashUTF8String(arr.getUTF8String(i), 7L)
      if (n == 0) return java.lang.Long.valueOf(0L)
      val w = math.min(window, n)
      var bPow = 1L // B^(w-1)
      var j = 1
      while (j < w) { bPow *= B; j += 1 }
      var h = 0L
      var i = 0
      while (i < w) { h = h * B + tok(i); i += 1 }
      var minH = h
      while (i < n) {
        h = (h - tok(i - w) * bPow) * B + tok(i)
        if (h < minH) minH = h
        i += 1
      }
      java.lang.Long.valueOf(minH)
    }
    override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
  }

  /** Cosine similarity of two numeric arrays (float or double elements),
    * accumulated in double in index order — deterministic across runs and
    * engines. Returns 0.0 when either norm is zero; null on length
    * mismatch or null input.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    private def elemType(e: Expression) =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      val aDouble = elemType(left) == DoubleType
      val bDouble = elemType(right) == DoubleType
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
        val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
      else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
      copy(left = l, right = r)
  }

  // ---- Column wrappers (classic-session Column <-> Expression bridge) ----
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhash_signature(c: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(c), numHashes))
  def word_shingles(c: Column, n: Int): Column =
    column(WordShingles(expression(c), n))
  def rolling_fingerprint(c: Column, window: Int): Column =
    column(RollingFingerprint(expression(c), window))
  def hyperplane_signature(c: Column, planes: Int): Column =
    column(HyperplaneSignature(expression(c), planes))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
}
