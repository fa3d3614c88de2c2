package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native codegen kernels must be BIT-IDENTICAL to the interpreted
  * higher-order-function forms they replaced — that equivalence is what
  * keeps the DuckDB oracle hashes valid. Each test pins a kernel against
  * its reference expression on real corpus data plus synthetic edges.
  */
class NativeKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.load(spark, sfDir, "documents")
  private def embs = graft.Tables.load(spark, sfDir, "embeddings")

  test("DotProduct == left-to-right aggregate(zip_with) fold, bit-exact") {
    val e = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val both = pairs.select(
        native.dot(col("va"), col("vb")).as("native"),
        aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("folded"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    // IEEE-bit comparison — any fold-order difference would show here
    both.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(f), s"$n != $f")
    }
  }

  test("DotProduct handles empty and length-mismatched arrays") {
    val r = Seq((Array.empty[Double], Array.empty[Double]),
        (Array(1.0, 2.0, 3.0), Array(2.0, 3.0)))
      .toDF("a", "b")
      .select(native.dot(col("a"), col("b")).as("d"))
      .as[Double].collect()
    assert(r(0) == 0.0)
    assert(r(1) == 1.0 * 2 + 2 * 3) // min-length semantics
  }

  test("RollingHash == interpreted per-char fold over the corpus") {
    val mismatches = docs.withColumn("native",
        native.rollingHash(col("text")))
      .withColumn("folded", expr(
        """aggregate(transform(sequence(1, length(text)),
          |            i -> ascii(substring(text, i, 1))),
          |          0L, (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin))
      .filter(col("native") =!= col("folded"))
    assert(mismatches.isEmpty)
  }

  test("HashedLinearScore == single-machine tokenize-hash-weight " +
      "reference over the corpus (covers codegen AND interpreted)") {
    def reference(text: String): Long = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      toks.map { t =>
        var h = 0L
        var i = 0
        while (i < t.length) {
          val cp = t.codePointAt(i)
          h = (h * 31 + cp) % 1000000007L
          i += Character.charCount(cp)
        }
        (h % 256L) * 2654435761L % 4294967296L % 2001L - 1000L
      }.sum
    }
    val rows = docs.select(col("text"),
        native.hashedLinearScore(col("text")).as("score"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == reference(r.getString(0)),
        s"mismatch on: ${r.getString(0).take(60)}")
    }
  }

  test("HashedLinearScore edge shapes: empty, all-whitespace, single " +
      "token, tabs/newlines as separators") {
    val r = Seq("", "   ", "a", "a\tb\nc").toDF("t")
      .select(native.hashedLinearScore(col("t"))).as[Long].collect()
    def w(tok: String): Long = {
      val h = tok.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
      (h % 256L) * 2654435761L % 4294967296L % 2001L - 1000L
    }
    assert(r(0) == 0L && r(1) == 0L)
    assert(r(2) == w("a"))
    assert(r(3) == w("a") + w("b") + w("c"))
  }

  test("ShingleHashes == window-built distinct shingle sets (as sets)") {
    import org.apache.spark.sql.expressions.Window
    val nativeSets = docs.select(col("doc_id"),
        native.shingleHashes(col("text"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_native"))
    val tok = docs.select(col("doc_id"),
      posexplode(expr("split(trim(text), '\\\\s+')")).as(Seq("i", "t")))
    val w = Window.partitionBy("doc_id").orderBy("i")
    val refSets = tok.select(col("doc_id"), col("t"),
        lead("t", 1).over(w).as("t2"), lead("t", 2).over(w).as("t3"))
      .filter(col("t3").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("t"), col("t2"), col("t3")).as("g"))
      .groupBy("doc_id").agg(countDistinct("g").as("n_ref"))
    // distinct-set CARDINALITY per doc must agree (hash values differ by
    // design: FNV vs string identity); an FNV collision would shrink a set
    val joined = nativeSets.join(refSets, Seq("doc_id"), "full")
    assert(joined.filter(
      col("n_native") =!= col("n_ref") ||
      col("n_native").isNull || col("n_ref").isNull).isEmpty)
  }

  test("ShingleHashes: short docs yield empty sets, not errors") {
    val r = Seq((1L, ""), (2L, "one"), (3L, "one two"), (4L, "a b c"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        size(native.shingleHashes(col("text"), 3)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(r(1L) == 0 && r(2L) == 0 && r(3L) == 0)
    assert(r(4L) == 1)
  }

  test("MinHashSignature matches a per-perm min over the same hashes") {
    val sh = docs.limit(50).select(col("doc_id"),
      native.shingleHashes(col("text"), 3).as("shingles"))
    val p = 2147483647L
    // reference: explode and take min of (a*h+b) mod p for perms 0 and 127
    def perm(i: Int): (Long, Long) = {
      val a = 1103515245L * (i + 1) % p
      val b = 12345L * (i + 17) % p
      (if (a == 0) 1L else a, b)
    }
    val (a0, b0) = perm(0)
    val (a127, b127) = perm(127)
    val ref = sh.select(col("doc_id"), explode(col("shingles")).as("h0"))
      .withColumn("h", pmod(col("h0"), lit(p)))
      .groupBy("doc_id")
      .agg(min(pmod(col("h") * a0 + b0, lit(p))).as("m0"),
        min(pmod(col("h") * a127 + b127, lit(p))).as("m127"))
    val nat = sh.select(col("doc_id"),
      native.minhashSignature(col("shingles"), 128).as("sig"))
      .select(col("doc_id"), element_at(col("sig"), 1).as("n0"),
        element_at(col("sig"), 128).as("n127"))
    val joined = nat.join(ref, "doc_id")
    assert(joined.filter(
      col("n0") =!= col("m0") || col("n127") =!= col("m127")).isEmpty)
  }

  test("SimHash64 == independent explode-and-vote reference build") {
    // reference computed driver-side in plain Scala (ANSI mode forbids
    // the wrapping FNV multiply in SQL) — independent of the kernel's
    // loop structure, shares only Fnv64
    def refSimhash(text: String): Long = {
      val votes = new Array[Int](64)
      for (t <- text.trim.split("\\s+"); b <- 0 until 64)
        if (((Fnv64.hash(t) >>> b) & 1L) == 1L) votes(b) += 1
        else votes(b) -= 1
      (0 until 64).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }
    val rows = docs.limit(50)
      .select(col("doc_id"), col("text"),
        native.simhash(col("text")).as("nat_sim"))
      .as[(Long, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, text, nat) =>
      assert(nat == refSimhash(text), s"doc $id")
    }
  }

  test("PqEncode/PqDistTable == the interpreted subdistance expressions " +
      "they replaced, on the real corpus in micro-int space") {
    val m = 4; val k = 3; val sub = 16 // deliberately non-default shape
    val v = embs.select(col("vec_id"), expr(
      "transform(embedding, x -> " +
        "cast(floor(cast(x as double) * 1000000) as bigint) + 2000000)")
      .as("vm"))
    val cb: Seq[Seq[Seq[Long]]] = {
      val init = v.orderBy("vec_id").limit(k).select("vm").collect()
        .map(_.getSeq[Long](0).toIndexedSeq)
      (0 until m).map(sp => init.toSeq.map(_.slice(sp * sub, (sp + 1) * sub)))
    }
    def subdist(sp: Int, cv: Seq[Long]) =
      aggregate(zip_with(slice(col("vm"), sp * sub + 1, sub),
        array(cv.map(lit): _*), (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
    def distsCol(sp: Int) = array(cb(sp).map(cv => subdist(sp, cv)): _*)
    val refCodes = array((0 until m).map { sp =>
      val d = distsCol(sp)
      (array_position(d, array_min(d)) - 1).cast("int")
    }: _*)
    val refTab = array((0 until m).map(distsCol): _*)
    val rows = v.select(
        native.pqEncode(col("vm"), cb).as("nc"), refCodes.as("rc"),
        native.pqDistTable(col("vm"), cb).as("nt"), refTab.as("rt"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
      assert(r.getSeq[Seq[Long]](2) == r.getSeq[Seq[Long]](3))
    }
  }

  test("GramAggregate == the declarative nested-transform explode + " +
      "groupBy cells, bit-exact, at any partitioning") {
    val q = embs
      .select(expr("transform(embedding," +
        " x -> cast(floor(cast(x as double) * 10000) as bigint))").as("q"))
      .repartition(7) // force multi-buffer partial merges
    val kernel = q
      .agg(native.gramAgg(col("q"), 64).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.n").as("n"),
        col("c.s_e8").as("s"))
    val reference = q
      .select(explode(expr(
        "flatten(transform(q, (x, i) -> " +
          "transform(slice(q, i + 1, size(q) - i), " +
          "(y, j) -> struct(i AS i, i + j AS j, x * y AS p))))")).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("c.p")).as("s"))
    assert(kernel.count() === 64L * 65 / 2)
    assert(kernel.except(reference).isEmpty && reference.except(kernel).isEmpty)
  }

  test("TheilSenMed2 == brute-force pair median; orientation-free " +
      "(shuffled input), same-key pairs dropped, no-pair groups NULL") {
    val rows = Seq( // (ok, ln, pc, q)
      (1L, 1, 100L, 1L), (2L, 1, 300L, 2L), (3L, 1, 900L, 4L),
      (3L, 2, 900L, 4L), // distinct key, same point — pairs with others
      (4L, 1, 500L, 2L), (4L, 1, 777L, 9L)) // duplicate key clique
    def med2Of(xs: Seq[(Long, Int, Long, Long)]): Option[(Long, Double)] = {
      val sl = (for {
        i <- xs.indices; j <- (i + 1) until xs.size
        a = xs(i); b = xs(j)
        if a._4 != b._4 && (a._1, a._2) != (b._1, b._2)
      } yield (b._3 - a._3).toDouble / (b._4 - a._4).toDouble).sorted
      if (sl.isEmpty) None
      else Some((sl.size.toLong,
        sl((sl.size + 1) / 2 - 1) + sl((sl.size + 2) / 2 - 1)))
    }
    for (perm <- Seq(rows, rows.reverse, rows.sortBy(_._3))) {
      val df = Seq(perm).toDF("xs")
        .select(expr("transform(xs, t -> " +
          "struct(t._1 AS ok, t._2 AS ln, t._3 AS pc, t._4 AS q))")
          .as("xs"))
        .select(native.theilSenMed2(col("xs")).as("m"))
      val r = df.head()
      val got = if (r.isNullAt(0)) None else {
        val m = r.getStruct(0); Some((m.getLong(0), m.getDouble(1)))
      }
      assert(got == med2Of(perm), s"perm=$perm")
    }
    // a group that is ONLY a same-key clique with equal q: NULL result
    val lone = Seq(Seq((7L, 1, 10L, 5L), (7L, 1, 99L, 5L))).toDF("xs")
      .select(expr("transform(xs, t -> " +
        "struct(t._1 AS ok, t._2 AS ln, t._3 AS pc, t._4 AS q))").as("xs"))
      .select(native.theilSenMed2(col("xs")).as("m"))
    assert(lone.head().isNullAt(0))
  }

  test("SQL registration exposes graft_dot and graft_rolling_hash") {
    val ext = new GraftExtensions
    // the shared test session wasn't built with the extension — register
    // the functions the same way the injector would, then call via SQL
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "graft_rolling_hash('ab') AS h").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == (('a'.toLong * 31) + 'b'.toLong) % 1000000007L)
    assert(ext != null)
  }
}
