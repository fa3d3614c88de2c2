package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Q23 family — similarity search over the `embeddings` table
  * (SURVEY.md §2.4 north star).
  *
  * Cosine is computed with a strict left-to-right fold over double-cast
  * elements, which both Spark (`aggregate`/`zip_with`) and DuckDB
  * (`list_reduce`/`list_transform`) evaluate identically — results are
  * bit-exact across engines, so even top-k rank order is oracle-safe.
  */
object SimilarityOps {

  /** array<float> → array<double> (element-wise IEEE-exact widening). */
  def toDoubleVec(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Left-to-right dot product as a native codegen'd Expression
    * (graft.functions.DotProduct): identical fold order to the
    * `aggregate(zip_with(...))` form it replaces (and to DuckDB's
    * `list_reduce`), but the loop compiles into whole-stage codegen
    * instead of paying the higher-order-lambda interpreter per element —
    * this sits inside O(n²) pair joins, so it's the hottest kernel in the
    * engine. */
  def dotExpr(a: Column, b: Column): Column = graft.functions.native.dot(a, b)

  /** ||v|| with the same fold order (Σx² ≡ dot(v, v) term-for-term). */
  def normExpr(v: Column): Column = sqrt(dotExpr(v, v))

  private def normalized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), toDoubleVec(col("embedding"))
        .as("v"))
      .withColumn("nrm", normExpr(col("v")))

  // ------------------------------------------------------------- brute
  /** Exact top-5 cosine neighbors for query vectors (vec_id < 10) via
    * broadcast of the query set against the partitioned candidate side —
    * the correctness baseline for ANN. At 100 TB the candidates stay
    * partitioned; only the (small) query set is replicated, and each
    * partition keeps a local top-k before the final k-way merge
    * (window over ≤ k×partitions rows). */
  def q23_knn_exact(s: SparkSession, dir: String): DataFrame = {
    val e = normalized(s, dir)
    val q = broadcast(e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("q_nrm")))
    val cand = e.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("nrm").as("c_nrm"))
    val scored = cand.join(q, col("cand_id") =!= col("q_id"))
      .withColumn("cos",
        dotExpr(col("qv"), col("cv")) / (col("q_nrm") * col("c_nrm")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("q_id", "rk", "cand_id", "cos")
      .orderBy("q_id", "rk")
  }

  val q23ExactSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v,
      |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm
      |  FROM e),
      |scored AS (SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
      |    list_reduce(list_transform(list_zip(q.v, c.v), p -> p[1]*p[2]),
      |      (x,y) -> x+y) / (q.nrm * c.nrm) AS cos
      |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
      |rk AS (SELECT q_id, cand_id, cos, ROW_NUMBER() OVER (
      |    PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rk
      |  FROM scored)
      |SELECT q_id, CAST(rk AS INT) AS rk, cand_id, cos
      |FROM rk WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // --------------------------------------------------------------- ivf
  /** IVF-style partitioned search: `label` plays the role of the coarse
    * quantizer cell; each query searches only its own cell. Exact within
    * the cell → still oracle-checkable. At scale, cells are the shuffle
    * partitioning, so each probe touches 1/|cells| of the data. */
  def q23_knn_ivf(s: SparkSession, dir: String): DataFrame = {
    val e = normalized(s, dir)
    val q = broadcast(e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("q_nrm")))
    val cand = e.select(col("vec_id").as("cand_id"), col("label"),
      col("v").as("cv"), col("nrm").as("c_nrm"))
    val scored = cand.join(q,
        col("label") === col("q_label") && col("cand_id") =!= col("q_id"))
      .withColumn("cos",
        dotExpr(col("qv"), col("cv")) / (col("q_nrm") * col("c_nrm")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "cand_id", "cos")
      .orderBy("q_id", "rk")
  }

  val q23IvfSql: String =
    """WITH e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm
      |  FROM e),
      |scored AS (SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
      |    list_reduce(list_transform(list_zip(q.v, c.v), p -> p[1]*p[2]),
      |      (x,y) -> x+y) / (q.nrm * c.nrm) AS cos
      |  FROM n q JOIN n c ON q.vec_id < 10 AND c.label = q.label
      |    AND c.vec_id != q.vec_id),
      |rk AS (SELECT q_id, cand_id, cos, ROW_NUMBER() OVER (
      |    PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rk
      |  FROM scored)
      |SELECT q_id, CAST(rk AS INT) AS rk, cand_id, cos
      |FROM rk WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  // --------------------------------------------------------------- lsh
  /** Random-hyperplane LSH: 16-bit sign signature per vector from
    * deterministic pseudo-random hyperplanes; candidates share a signature
    * in at least one of 4 4-bit bands; exact re-rank of candidates.
    * Approximate → rows-only driver check + ScalaTest recall bound.
    *
    * The 100 TB path: signatures are 4 shuffle rows per vector; the band
    * join replaces the all-pairs cross join entirely. */
  def q23_knn_lsh(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val nBits = 16
    // deterministic hyperplanes: h[b][d] = lcg(b*dim+d) mapped to ±1
    val planes: Seq[Seq[Double]] = (0 until nBits).map { bIdx =>
      (0 until dim).map { d =>
        val x = (1103515245L * (bIdx * dim + d + 1) + 12345L) & 0x7fffffffL
        if ((x >> 16) % 2 == 0) 1.0 else -1.0
      }
    }
    // Deliberately the interpreted aggregate-over-transform form: a
    // measured comparison against 16 native DotProduct calls (one per
    // plane, literal plane arrays) showed the native variant ~40% SLOWER
    // here — the per-plane work is small enough that literal-array
    // plumbing outweighs the lambda interpreter. Native kernels are for
    // measured hot loops (see DedupOps/q23 exact), not a default.
    val planesLit = typedLit(planes)
    val e = normalized(s, dir).withColumn("planes", planesLit)
      .withColumn("sig",
        expr("""aggregate(transform(planes, (pl, b) ->
                 CASE WHEN aggregate(zip_with(v, pl, (x, w) -> x*w), 0D,
                   (acc, t) -> acc + t) > 0
                 THEN shiftleft(1L, b) ELSE 0L END),
               0L, (acc, x) -> acc + x)"""))
      .drop("planes")
    val banded = e.select(col("*"), posexplode(
      expr("transform(sequence(0, 3), k -> (sig div shiftleft(1L, k*4)) % 16)"))
      .as(Seq("band", "band_val")))
    val q = banded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("q_nrm"), col("band"), col("band_val"))
    val cand = banded.select(col("vec_id").as("cand_id"),
      col("v").as("cv"), col("nrm").as("c_nrm"),
      col("band").as("band_c"), col("band_val").as("band_val_c"))
    val pairs = q.join(cand,
        col("band") === col("band_c") &&
        col("band_val") === col("band_val_c") &&
        col("cand_id") =!= col("q_id"))
      .select("q_id", "cand_id", "qv", "cv", "q_nrm", "c_nrm").distinct()
      .withColumn("cos",
        dotExpr(col("qv"), col("cv")) / (col("q_nrm") * col("c_nrm")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("cand_id"))
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("q_id", "rk", "cand_id", "cos")
      .orderBy("q_id", "rk")
  }

  // ----------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_knn_exact" -> (q23_knn_exact _),
    "q23_knn_ivf" -> (q23_knn_ivf _),
    "q23_knn_lsh" -> (q23_knn_lsh _))

  def oracles: Map[String, String] = Map(
    "q23_knn_exact" -> q23ExactSql,
    "q23_knn_ivf" -> q23IvfSql)
}
