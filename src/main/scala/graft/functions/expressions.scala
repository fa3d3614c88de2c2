package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, UnaryExpression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`)
  * evaluate their lambda bodies INTERPRETED — fine for occasional use,
  * but a dot product inside an O(n²) near-dup join, or a per-character
  * fold over every document, pays the interpreter per element. These
  * expressions generate a tight Java loop inside whole-stage codegen
  * (preference order per the brief: builtin > native Expression > UDF),
  * with interpreted eval kept bit-identical as the fallback.
  *
  * Numerical contract: both kernels fold STRICTLY left-to-right, matching
  * the `aggregate(zip_with(...))` forms they replace and DuckDB's
  * `list_reduce` — results stay bit-exact across engines, so the oracle
  * hash compare still holds.
  */

/** Σ aᵢ·bᵢ over two array<double> columns, left-to-right. Inputs must
  * already be array<double> (callers widen with toDoubleVec) — no
  * ExpectsInputTypes because AbstractDataType is private[sql] in Spark 4;
  * these are internal kernels with controlled call sites. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** 2-D HILBERT curve index of (x, y) on a 2^bits × 2^bits grid — the
  * space-filling layout key whose range-partitioned sorted write gives
  * better min/max pruning locality than the q39 Morton interleave
  * (Hilbert never makes the long diagonal jumps Z-order takes between
  * quadrants: consecutive indexes are always grid-neighbors, proven
  * exhaustively in LayoutKeysSpec). The classic xy2d bit descent
  * (Wikipedia "Hilbert curve", the n−1-flip variant so every
  * intermediate coordinate stays in [0, 2^bits) — which is what lets
  * the DuckDB oracle replay the descent with pure non-negative
  * arithmetic); inputs are masked to the low `bits` bits. A Column-
  * level unrolling would nest each level's x into the next's ~6 times
  * (≈6^bits tree nodes — the janino blowup q23_knn_lsh documents), so
  * the loop lives in ONE codegen'd kernel instead. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val n = 1L << bits
    var x = a.asInstanceOf[Long] & (n - 1)
    var y = b.asInstanceOf[Long] & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = 1L << bits
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & ${n - 1}L;
         |long $y = $b & ${n - 1}L;
         |long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

/** Rolling polynomial hash acc ← (acc·31 + codepoint) mod 1e9+7 over a
  * string — the document-fingerprint kernel (TextOps.q24_fingerprint),
  * previously an O(len²) `transform(sequence(...), substring)` fold. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $acc = ($acc * 31 + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingHash = copy(child = newChild)
}

/** HASHED-FEATURE LINEAR CLASSIFIER score over a text column — model
  * INFERENCE as a row-local codegen kernel (the fastText/Vowpal-Wabbit
  * hashing-trick shape): tokenize, hash each token into one of 256
  * weight buckets, sum the bucket weights. One pass over the string,
  * zero shuffles, zero per-token object allocation — the way a trained
  * quality/spam gate actually runs over 100 TB.
  *
  * The "trained" weights are a deterministic function of the bucket
  * (Knuth-mixed into [−1000, 1000]) so the DuckDB oracle can replay
  * scoring exactly; swapping in real weights means replacing one pure
  * function, the plan shape is the product. Token hash = the
  * [[RollingHash]] polynomial (oracle-portable ascii/codePoint fold);
  * token boundary = the ASCII whitespace class Spark's
  * `split(trim(text), '\\s+')` uses, empty tokens skipped. */
case class HashedLinearScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_linear_score"

  // token boundary = ASCII whitespace {9..13, 32}: exactly Java regex
  // \\s, the class `split(trim(text), '\\\\s+')` applies — stated
  // numerically so interpreted eval and generated Java share one
  // definition with no escape-sequence indirection
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= 9 && c <= 13)

  override protected def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var score = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      if (isWs(str.charAt(i))) {
        i += 1
      } else {
        var h = 0L
        var done = false
        while (i < n && !done) {
          if (isWs(str.charAt(i))) done = true
          else {
            val cp = str.codePointAt(i)
            h = (h * 31 + cp) % 1000000007L
            i += Character.charCount(cp)
          }
        }
        score += (h % 256L) * 2654435761L % 4294967296L % 2001L - 1000L
      }
    }
    score
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val score = ctx.freshName("score")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val cp = ctx.freshName("cp")
      val done = ctx.freshName("done")
      def ws(v: String) = s"($v == 32 || ($v >= 9 && $v <= 13))"
      s"""
         |java.lang.String $str = $c.toString();
         |long $score = 0L;
         |int $i = 0;
         |int $n = $str.length();
         |while ($i < $n) {
         |  if (${ws(s"$str.charAt($i)")}) { $i++; }
         |  else {
         |    long $h = 0L;
         |    boolean $done = false;
         |    while ($i < $n && !$done) {
         |      if (${ws(s"$str.charAt($i)")}) { $done = true; }
         |      else {
         |        int $cp = $str.codePointAt($i);
         |        $h = ($h * 31 + $cp) % 1000000007L;
         |        $i += java.lang.Character.charCount($cp);
         |      }
         |    }
         |    $score += ($h % 256L) * 2654435761L % 4294967296L % 2001L
         |      - 1000L;
         |  }
         |}
         |${ev.value} = $score;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HashedLinearScore = copy(child = newChild)
}

/** 64-bit FNV-1a over a string's UTF-16 code units — the internal shingle
  * hash (consistency is all that matters: every consumer of a shingle uses
  * the same function; a collision among ~10⁶ shingles has probability
  * ~10⁻⁷, immaterial next to exact-set verification). */
object Fnv64 {
  final val Offset = -3750763034362895579L // 0xcbf29ce484222325
  final val Prime = 1099511628211L
  def hash(s: String): Long = {
    var h = Offset
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * Prime; i += 1 }
    h
  }
}

/** text → array<long> of DISTINCT k-token-shingle hashes, in ONE row-local
  * pass: tokenize (trim + `\s+` split, same semantics as the SQL
  * `split(trim(text), '\\s+')` both engines use), slide a k-window,
  * FNV-hash each shingle, dedupe. Replaces a
  * posexplode → window-lead → concat → distinct pipeline (a full shuffle
  * by doc plus a sort) with zero shuffles.
  *
  * CodegenFallback is deliberate: the per-ROW work (hundreds of tokens)
  * amortizes one boxed call, unlike per-ELEMENT lambda interpretation —
  * and the loop body itself is plain compiled JVM code. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim
      .split("\\s+")
    if (toks.length < k) {
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.empty[Long])
    } else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(Fnv64.hash(sb.toString))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var n = 0
      while (it.hasNext) { out(n) = it.next(); n += 1 }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

/** array<long> of shingle hashes → array<long> MinHash signature
  * (nPerms permutations h_i(x) = (a_i·x + b_i) mod p over Z_p,
  * p = 2³¹−1, deterministic LCG coefficients), computed row-locally —
  * replaces a 128-aggregate-column groupBy (a full shuffle by doc) with
  * an nPerms × |shingles| register loop. Same CodegenFallback rationale
  * as ShingleHashes. */
case class MinHashSignature(child: Expression, nPerms: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private val p = 2147483647L // 2^31 - 1
  private lazy val coef: Array[(Long, Long)] = (0 until nPerms).map { i =>
    val a = 1103515245L * (i + 1) % p
    val b = 12345L * (i + 17) % p
    (if (a == 0) 1L else a, b)
  }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val sig = Array.fill(nPerms)(p) // empty set → sentinel p (> any hash)
    var j = 0
    while (j < m) {
      val h = ((arr.getLong(j) % p) + p) % p
      var i = 0
      while (i < nPerms) {
        val v = (coef(i)._1 * h + coef(i)._2) % p
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

/** text → 64-bit SimHash, row-locally: tokenize (trim + `\s+`), FNV-hash
  * each token, accumulate ±1 votes per bit, pack the vote signs.
  * Replaces an explode → 64-aggregate-column groupBy (a full shuffle of
  * every (doc, token) row) with zero shuffles. Same CodegenFallback
  * rationale as ShingleHashes. */
case class SimHash64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = Fnv64.hash(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

/** array<double> vector → array<int> of LSH band values from random-
  * hyperplane sign bits, all row-locally: nBits deterministic ±1
  * hyperplanes (entry (b,d) = splitmix64(b·dim+d) mapped to ±1 — a raw
  * LCG is NOT random enough here: bit 16 of a linear function of the
  * index carries lattice structure that correlates the planes and
  * measurably costs recall, 0.64 vs 0.87 at 16 bands on the fixture),
  * bandBits sign bits packed per band value (bit b contributes
  * 2^(b mod bandBits) to band b div bandBits).
  *
  * Exists because the same computation phrased as 64 CASE WHEN
  * graft_dot(v, <64-element literal>) branches produced a ~100 KB
  * expression tree (seconds of janino compilation per subtree) and the
  * aggregate-over-zip_with form costs ~24 ms/row interpreted; this is
  * one boxed call per row around a plain compiled loop (same
  * CodegenFallback rationale as ShingleHashes). */
case class HyperplaneBands(child: Expression, nBits: Int, bandBits: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(nBits > 0 && bandBits > 0 && nBits % bandBits == 0,
    s"nBits ($nBits) must be a positive multiple of bandBits ($bandBits)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  private def mix(i: Long): Long = {
    var z = i + 0x9e3779b97f4b7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // planes materialize lazily from the first row's dimensionality; one
  // instance serves one closed-over dim (vectors in a column share it)
  @transient private var planes: Array[Array[Double]] = _

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    if (planes == null || planes(0).length != dim) {
      planes = Array.tabulate(nBits, dim)((b, d) =>
        if ((mix(b.toLong * dim + d) & 1L) == 0L) 1.0 else -1.0)
    }
    val out = new Array[Int](nBits / bandBits)
    var b = 0
    while (b < nBits) {
      val pl = planes(b)
      var s = 0.0
      var d = 0
      while (d < dim) { s += v.getDouble(d) * pl(d); d += 1 }
      if (s > 0) out(b / bandBits) |= 1 << (b % bandBits)
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBands = copy(child = newChild)
}

/** array<long> micro-int vector → array<int> of m product-quantization
  * codes: per subspace s, the index j of the codebook entry minimizing
  * the exact integer L2 distance to the subvector (ties → lowest j,
  * matching argmin-first-occurrence and the oracle's
  * `row_number() OVER (ORDER BY dist, j)`).
  *
  * Codebook layout: flat, cb[(s·k + j)·sub + i] — it rides the
  * expression instance (m·k·sub longs ≈ 8 KB at 8×16×8), NOT the plan
  * as literals: the literal-tree form was 1024 Literal nodes × lambda
  * scaffolding per reference, and the `aggregate(zip_with(...))`
  * encode measured 3.6 s at sf0.1 where this kernel runs the same 1024
  * multiplies as one compiled loop (same CodegenFallback rationale as
  * ShingleHashes — one boxed call per ROW amortized over the loop). */
case class PqEncode(child: Expression, codebook: IndexedSeq[Long],
    m: Int, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(m > 0 && k > 0 && codebook.nonEmpty &&
    codebook.length % (m * k) == 0,
    s"codebook length ${codebook.length} must be a multiple of m*k=${m * k}")
  private val sub = codebook.length / (m * k)
  @transient private lazy val cb: Array[Long] = codebook.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == m * sub,
      s"graft_pq_encode(m=$m, sub=$sub) got a ${v.numElements()}-component" +
        " vector — reading past the buffer would yield silent garbage codes")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < k) {
        val base = (s * k + j) * sub
        var d = 0L
        var i = 0
        while (i < sub) {
          val diff = v.getLong(s * sub + i) - cb(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

/** array<long> micro-int QUERY vector → its m×k ADC distance table
  * (array<array<long>>): entry [s][j] is the exact integer L2 distance
  * from the query's subvector s to codebook entry j — the one table an
  * ADC scan needs to score any candidate with m lookups. Same flat
  * codebook layout/rationale as PqEncode. */
case class PqDistTable(child: Expression, codebook: IndexedSeq[Long],
    m: Int, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(m > 0 && k > 0 && codebook.nonEmpty &&
    codebook.length % (m * k) == 0,
    s"codebook length ${codebook.length} must be a multiple of m*k=${m * k}")
  private val sub = codebook.length / (m * k)
  @transient private lazy val cb: Array[Long] = codebook.toArray

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_dist_table"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val rows = new Array[ArrayData](m)
    require(v.numElements() == m * sub,
      s"graft_pq_dist_table(m=$m, sub=$sub) got a ${v.numElements()}-" +
        "component vector — reading past the buffer would yield a silent" +
        " garbage table")
    var s = 0
    while (s < m) {
      val row = new Array[Long](k)
      var j = 0
      while (j < k) {
        val base = (s * k + j) * sub
        var d = 0L
        var i = 0
        while (i < sub) {
          val diff = v.getLong(s * sub + i) - cb(base + i)
          d += diff * diff
          i += 1
        }
        row(j) = d
        j += 1
      }
      rows(s) = ArrayData.toArrayData(row)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqDistTable = copy(child = newChild)
}

/** Column-level entry points (no session registration required). */
/** Upper-triangle Gram-matrix AGGREGATE over an array<bigint> column —
  * the q23_gram kernel. The declarative form (nested transform → 2080
  * structs per row → explode → hash aggregate) materializes |rows|·2080
  * aggregation inputs; this TypedImperativeAggregate folds each vector
  * into a flat long[2081] buffer in a tight JVM loop (2080 multiply-adds
  * per row, zero allocation) and merges buffers element-wise — the
  * classic partial-aggregate shape with a dimension-scale buffer, so the
  * exchange carries ONE buffer per partition regardless of corpus size.
  * Emits array<struct<i,j,n,s_e8>> — the same cells, bit-identical, as
  * the declarative plan (integer arithmetic, order-independent). */
case class GramAggregate(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Long]] {

  private val cells = dim * (dim + 1) / 2
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("s_e8", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_gram_agg"

  // buffer layout: [0, cells) upper-triangle sums row-major, [cells] = n
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](cells + 1)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData].toLongArray()
      require(arr.length == dim,
        s"graft_gram_agg(dim=$dim) got a ${arr.length}-component vector")
      var idx = 0
      var i = 0
      while (i < dim) {
        val qi = arr(i)
        var j = i
        while (j < dim) { buf(idx) += qi * arr(j); j += 1; idx += 1 }
        i += 1
      }
      buf(cells) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k <= cells) { a(k) += b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(cells)
    val out = new Array[Any](cells)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(idx) = org.apache.spark.sql.catalyst.InternalRow(i, j, n, buf(idx))
        j += 1; idx += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate((cells + 1) * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](cells + 1)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): GramAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): GramAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAggregate =
    copy(child = newChildren.head)
}

/** MISRA-GRIES heavy-hitter sketch AGGREGATE over a string column — the
  * hot-key detector that feeds the q28 salted join: find the keys worth
  * salting WITHOUT a full groupBy when key cardinality is huge (the
  * full aggregate is itself the skew victim). At most k counters live
  * in the buffer; a miss against a full buffer decrements every counter
  * (dropping zeros) — the classic one-pass summary. Merge follows
  * Agarwal et al., "Mergeable Summaries" (PODS'12): sum counters, then
  * subtract the (k+1)-largest count and drop ≤0, restoring the k bound.
  *
  * Guarantees (any partitioning, any order): every counter is a LOWER
  * bound on the true count, short by at most n/(k+1) (n = rows seen);
  * every key with true count > n/(k+1) survives. When the column has
  * ≤ k distinct values no decrement ever fires, so the counts are
  * EXACT and partition-order independent — the q28b oracle case.
  * Emits array<struct<item, n>> sorted (n DESC, item). */
case class MisraGriesAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(k >= 1, s"graft_heavy_hitters needs k >= 1, got $k")
  private type Buf = scala.collection.mutable.HashMap[String, Long]
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf,
      input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None => // decrement-all; the arriving key cancels against one
          val dead = buf.iterator.collect {
            case (it, c) if c == 1L => it }.toList
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Sum, then cut back to k by the (k+1)-largest count. */
  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (it, c) =>
      a.update(it, a.getOrElse(it, 0L) + c) }
    if (a.size > k) {
      val cut = a.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val dead = a.iterator.collect {
        case (it, c) if c <= cut => it }.toList
      a.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val rows = buf.toArray.sortBy { case (it, c) => (-c, it) }
      .map { case (it, c) => org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(it), c) }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, c) =>
      val bytes = it.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAggregate =
    copy(child = newChildren.head)
}

/** COUNT-MIN SKETCH frequency aggregate over a LONG key column
  * (Cormode & Muthukrishnan '05) — the mergeable point-frequency
  * summary that complements [[MisraGriesAggregate]]: MG finds WHICH
  * keys are heavy; CMS answers "how often did key k occur" for ANY k
  * after the fact, in depth×width longs regardless of key cardinality.
  * Each of `depth` rows hashes the key into `width` buckets and
  * increments one counter; the estimate is the MIN over rows —
  * an overestimate by at most n·e/width with prob 1−e^−depth.
  *
  * Buffers merge by elementwise SUM, so the sketch is exact-associative:
  * any partitioning, any merge order, bit-identical counters — which is
  * why a plain SQL groupBy over the same hash can serve as the oracle.
  * The row hash is the Knuth multiplicative mix over (key + row·97),
  * matching q26's engine-portable convention; intermediates stay within
  * Long for keys < 3.4e9 (guarded), and DuckDB replays it verbatim
  * (no overflow-wrapping needed, unlike splitmix64).
  *
  * Emits the flat counter array row-major (array<long>, depth·width);
  * estimates are row-local `element_at` + `least` over it. */
case class CmsAggregate(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 2,
    s"graft_cms needs depth >= 1, width >= 2; got $depth x $width")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + CmsAggregate.bucket(key, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buf.map(Long.box).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](depth * width)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAggregate =
    copy(child = newChildren.head)
}

object CmsAggregate {
  /** Row-r bucket of `key`: ((key + r·97) · 2654435761) mod 2³² mod w.
    * Engine-portable (DuckDB states it verbatim — every intermediate
    * fits BIGINT for key < 3.4e9, asserted here so an overflow can't
    * silently diverge the two engines). */
  def bucket(key: Long, row: Int, width: Int): Int = {
    require(key >= 0 && key < 3465871437L,
      s"graft_cms key $key outside the engine-portable hash range")
    (java.lang.Math.floorMod((key + row * 97L) * 2654435761L,
      4294967296L) % width).toInt
  }
}

/** array<struct<ok:long, ln:int, pc:long, q:long>> (one part's collected
  * line items, ANY order) → struct<n_pairs:long, med2:double>: the
  * Theil–Sen pair count and doubled median slope. Every unordered row
  * pair with distinct (ok, ln) keys and distinct q contributes ONE
  * slope (pc_j−pc_i)/(q_j−q_i) — orientation-independent, so no input
  * sort is needed and collect_list's nondeterministic order cannot
  * perturb a bit; the median is sl[⌈n/2⌉−1]+sl[⌊n/2⌋] of the sorted
  * slope array. NULL when no pair qualifies. Replaces an interpreted
  * transform×filter×array_sort lambda chain (≈400 ns/pair) with one
  * compiled O(g²) loop + Arrays.sort per group — same CodegenFallback
  * rationale as ShingleHashes: the per-ROW work (hundreds of pairs)
  * amortizes one boxed call. */
case class TheilSenMed2(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pairs", LongType, nullable = false),
    StructField("med2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_theilsen_med2"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val ok = new Array[Long](n)
    val ln = new Array[Int](n)
    val pc = new Array[Long](n)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 4)
      ok(i) = r.getLong(0); ln(i) = r.getInt(1)
      pc(i) = r.getLong(2); q(i) = r.getLong(3)
      i += 1
    }
    val slopes = new Array[Double](n * (n - 1) / 2)
    var m = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (q(i) != q(j) && !(ok(i) == ok(j) && ln(i) == ln(j))) {
          slopes(m) = (pc(j) - pc(i)).toDouble / (q(j) - q(i)).toDouble
          m += 1
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) null
    else {
      java.util.Arrays.sort(slopes, 0, m)
      val med2 = slopes((m + 1) / 2 - 1) + slopes((m + 2) / 2 - 1)
      org.apache.spark.sql.catalyst.InternalRow(m.toLong, med2)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): TheilSenMed2 = copy(child = newChild)
}

object native {
  /** Theil–Sen pair count + doubled median slope (see [[TheilSenMed2]]):
    * one compiled pair loop per collected group. */
  def theilSenMed2(xs: Column): Column =
    GraftColumnBridge.column(TheilSenMed2(GraftColumnBridge.expression(xs)))

  /** Gram-matrix aggregate (see [[GramAggregate]]): one call per
    * grouping, result explodes to the (i, j, n, s_e8) cells. */
  def gramAgg(vec: Column, dim: Int): Column =
    GraftColumnBridge.column(
      GramAggregate(GraftColumnBridge.expression(vec), dim)
        .toAggregateExpression())

  /** Misra-Gries heavy-hitter aggregate (see [[MisraGriesAggregate]]):
    * one call per grouping, result explodes to (item, n) counters. */
  def heavyHitters(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAggregate(GraftColumnBridge.expression(c), k)
        .toAggregateExpression())

  /** Count-Min Sketch aggregate (see [[CmsAggregate]]): one call per
    * grouping, result is the flat depth×width counter array. */
  def cmsAgg(c: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CmsAggregate(GraftColumnBridge.expression(c), depth, width)
        .toAggregateExpression())

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def rollingHash(c: Column): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c)))

  /** 2-D Hilbert index on a 2^bits grid (see [[HilbertIndex]]). */
  def hilbert(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(HilbertIndex(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y),
      bits))

  /** Hashed-feature linear classifier score (see [[HashedLinearScore]]):
    * row-local model inference, one pass over the text. */
  def hashedLinearScore(c: Column): Column =
    GraftColumnBridge.column(
      HashedLinearScore(GraftColumnBridge.expression(c)))

  def shingleHashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(
      ShingleHashes(GraftColumnBridge.expression(text), k))

  def minhashSignature(shingles: Column, nPerms: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(shingles), nPerms))

  def simhash(text: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(text)))

  def hyperplaneBands(vec: Column, nBits: Int, bandBits: Int): Column =
    GraftColumnBridge.column(
      HyperplaneBands(GraftColumnBridge.expression(vec), nBits, bandBits))

  /** cb(s)(j) = the sub-dim codebook vector for subspace s, code j. */
  private def flatCb(cb: Seq[Seq[Seq[Long]]]): IndexedSeq[Long] =
    cb.flatten.flatten.toIndexedSeq

  def pqEncode(vec: Column, cb: Seq[Seq[Seq[Long]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec),
      flatCb(cb), cb.length, cb.head.length))

  def pqDistTable(vec: Column, cb: Seq[Seq[Seq[Long]]]): Column =
    GraftColumnBridge.column(PqDistTable(GraftColumnBridge.expression(vec),
      flatCb(cb), cb.length, cb.head.length))

  /** Bloom-filter build aggregate over a LONG column (Spark's own
    * sketch aggregate, the one InjectRuntimeFilter plants for runtime
    * row filters — we surface it for explicit use). Returns the
    * serialized filter as BINARY. */
  def bloomAgg(c: Column, estimatedItems: Long): Column =
    GraftColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(GraftColumnBridge.expression(c),
          estimatedItems).toAggregateExpression())

  /** Membership probe against a driver-built serialized Bloom filter.
    * Codegen'd (BloomFilterMightContain has doGenCode); the filter bytes
    * ride the plan as a literal, which broadcasts with the task binary. */
  def bloomMightContain(bloomBytes: Array[Byte], c: Column): Column =
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bloomBytes, BinaryType),
        GraftColumnBridge.expression(c)))
}

/** Session extension pack: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `.withExtensions`) exposes `graft_dot` / `graft_rolling_hash` to
  * `spark.sql(...)` users and installs the per-key TOP-K rewrite
  * (graft.plans.TopKPerKey: optimizer rule + planner strategy — the
  * declarative `row_number().over(...) <= k` form plans as a bounded-heap
  * operator instead of a full per-key sort). The DataFrame-level native
  * kernels above work without registration, and every query stays
  * correct (window plan) when the extension is absent. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_linear_score"),
      new ExpressionInfo(classOf[HashedLinearScore].getName,
        "graft_linear_score"),
      (children: Seq[Expression]) => HashedLinearScore(children.head)))
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
