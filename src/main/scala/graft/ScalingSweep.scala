package graft

import org.apache.spark.sql.SparkSession

import graft.plans.ScalingAudit

/** Standalone sweep for the empirical scaling-exponent audit
  * ([[graft.plans.ScalingAudit]]): run the scaling-risk query list at
  * sf0.001 / sf0.01 / sf0.1 (a decade apart), fit each wall-time
  * exponent, and
  *
  *   - default mode: print one JSON line per query plus a summary,
  *     and write the table to `scaling_exponents.json` — the
  *     checked-in record ScalingTableSpec pins bounds against;
  *   - `--check`: re-measure and compare against the checked-in
  *     table, exit 1 when any exponent DRIFTED upward beyond
  *     tolerance (or a previously-unfit query now fits above its
  *     bound) — the regression gate for "the plans still scale the
  *     way round N measured".
  *
  * Env knobs mirror Bench: SPARK_GRAFT_SF_BASE (default
  * /root/testdata — must contain sf0.001/sf0.01/sf0.1),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_RUNS (samples per point, default 3),
  * SPARK_GRAFT_ONLY (comma subset of the risk list). */
object ScalingSweep {

  /** The queries whose 100 TB story rests on a growth argument —
    * prefix-family rewrites, iterative graph loops, dedup banding /
    * clustering, interval joins, recursive hierarchy — pinned
    * empirically instead of by review prose. */
  val riskList: Seq[String] = Seq(
    // two-level prefix family (PrefixSum / PrefixLead / PrefixCarry)
    "q14b_distribution", "q14g_pareto", "q24_zipf", "q26_mix",
    "q27_pack", "q27_shuffle", "q35d_mad", "q38b_interval_union",
    // iterative graph loops (rounds ~ log n of linear work)
    "q41_pagerank", "q41b_lpa", "q41c_components", "q41d_kcore",
    "q44_triangles", "q44b_clustering",
    // dedup banding, blocking, clustering
    "q22_dedup_minhash", "q22_dedup_ngram", "q22_dedup_simhash",
    "q22_dedup_snm", "q22_dedup_contain", "q22_dedup_cluster",
    "q22_dedup_keep_best",
    // similarity: the documented n^1.5 cluster bound + partition fans
    "q23_semdedup", "q23_knn_exact", "q23_kmeans",
    // interval / range / as-of joins
    "q11_join_range", "q11c_interval_join", "q38_overlap", "q12_asof",
    // other loops and pair machinery
    "q24_bpe_train", "q42b_triples", "q19j_theilsen", "q37_hierarchy",
    // blocked pair matching, per-entity sequence assembly, resampling,
    // deliberate-skew joins, quasi-identifier grouping, embedding
    // pair hunts, positional adjacency — growth risks of a different
    // shape than the families above
    "q17b_fuzzy", "q40_sessionize", "q29d_paths", "q19i_bootstrap",
    "q28_skew_join", "q36c_anonymity", "q22_dedup_embed", "q43c_phrase")

  /** Each risk query's PRIMARY input table — the one whose row count
    * sets its work scale. Fed to [[graft.plans.ScalingAudit.fitSized]]
    * as measured per-directory sizes, because the fixture's scale
    * steps are NOT uniform: the TPC-H tables and events grow 10× per
    * directory, but documents is 500 rows at both sf0.001 and sf0.01
    * (5000 at sf0.1) and embeddings 500/500/2000 — for those queries
    * the first "decade" is identical input, its first difference is
    * pure run noise, and a decade-assuming fit reports a confidently
    * wrong exponent. Queries reading several tables carry the
    * DOMINANT one (q42b's triple generation is basket-driven). */
  val primaryTable: Map[String, String] = Map(
    "q14b_distribution" -> "orders", "q14g_pareto" -> "orders",
    "q24_zipf" -> "documents", "q26_mix" -> "documents",
    "q27_pack" -> "documents", "q27_shuffle" -> "documents",
    "q35d_mad" -> "events", "q38b_interval_union" -> "events",
    "q41_pagerank" -> "orders", "q41b_lpa" -> "orders",
    "q41c_components" -> "lineitem", "q41d_kcore" -> "lineitem",
    "q44_triangles" -> "orders", "q44b_clustering" -> "orders",
    "q22_dedup_minhash" -> "documents", "q22_dedup_ngram" -> "documents",
    "q22_dedup_simhash" -> "documents", "q22_dedup_snm" -> "documents",
    "q22_dedup_contain" -> "documents", "q22_dedup_cluster" -> "documents",
    "q22_dedup_keep_best" -> "documents",
    "q23_semdedup" -> "embeddings", "q23_knn_exact" -> "embeddings",
    "q23_kmeans" -> "embeddings",
    "q11_join_range" -> "events", "q11c_interval_join" -> "events",
    "q38_overlap" -> "events", "q12_asof" -> "events",
    "q24_bpe_train" -> "documents", "q42b_triples" -> "lineitem",
    "q19j_theilsen" -> "part", "q37_hierarchy" -> "orders",
    "q17b_fuzzy" -> "part", "q40_sessionize" -> "events",
    "q29d_paths" -> "events", "q19i_bootstrap" -> "lineitem",
    "q28_skew_join" -> "lineitem", "q36c_anonymity" -> "customer",
    "q22_dedup_embed" -> "embeddings", "q43c_phrase" -> "documents")

  /** Per-query exponent bounds where the DESIGN is documented
    * super-linear; everything else is held to the default 1.6
    * (log-linear loops fit ≈ 1.0–1.3 over this range; quadratic reads
    * ≈ 2). */
  val bounds: Map[String, Double] = Map(
    // Σ|c|² ≈ n^1.5 cluster-bounded pair hunt (SimilarityOps scaladoc)
    "q23_semdedup" -> 1.7,
    // rarest-first one-sided prefix probe: candidate pairs grow with
    // duplicate mass; documented super-linear worst case, sub-
    // quadratic by the prefix bound
    "q22_dedup_contain" -> 1.8,
    // iterative peel over a support-thresholded co-purchase graph:
    // work = rounds x m where the EDGE count m itself grows
    // super-linearly in this SF range (more baskets push more pairs
    // over support 2) and peel depth grows 0 -> 3 -> 5 — measured
    // 1.29-1.49 run to run, mechanism documented in the q41d
    // scaladoc; per-round work stays O(m)
    "q41d_kcore" -> 1.75)

  def main(args: Array[String]): Unit = {
    val check = args.contains("--check")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_BASE", "/root/testdata")
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"$base/$s")
    dirs.foreach { d =>
      require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)),
        s"scale directory missing: $d (set SPARK_GRAFT_SF_BASE)")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    // 3 samples per point (vs the bench's 2): the fit differences tiny
    // minima, so each point's min is worth one extra sample of rigor
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // names outside the risk list are a LOUD error, not a silent empty
    // selection — SPARK_GRAFT_ONLY=q01_scan would otherwise select
    // nothing and (pre-merge) have clobbered the table with it
    only.foreach { names =>
      val stray = names.diff(riskList.toSet)
      require(stray.isEmpty,
        s"SPARK_GRAFT_ONLY names not on the scaling risk list: $stray")
    }
    val selected = only.fold(riskList)(names => riskList.filter(names))
    require(selected.nonEmpty, "empty selection")
    val unknown = selected.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"not in the inventory: $unknown")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    SparkEntry.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // measured per-directory row counts of every referenced primary
    // table (one cheap count each) — the fit's scale axis is DATA, not
    // a directory-name assumption
    val tableRows: Map[String, Seq[Long]] =
      selected.flatMap(primaryTable.get).distinct.sorted.map { t =>
        t -> dirs.map(d => spark.read.parquet(s"$d/$t.parquet").count())
      }.toMap
    def sizesOf(name: String): Seq[Long] =
      primaryTable.get(name).map(tableRows).getOrElse(Nil)
    val fits = selected.map { name =>
      val sizes = sizesOf(name)
      val f = ScalingAudit.fit(spark, name, SparkEntry.queries(name),
        dirs, runs, sizes = sizes)
      val eTxt = f.exponent.map(f3).getOrElse("null")
      val sizesTxt = sizes.mkString("[", ",", "]")
      println(s"""{"query":"$name","sizes":$sizesTxt,"wall":[${
        f.points.map(p => f3(p.wallSec)).mkString(",")}],"work":[${
        f.points.map(p => f3(p.workSec)).mkString(",")}],"exponent":$eTxt}""")
      f
    }
    val over = ScalingAudit.auditExponents(fits, bounds = bounds)
    val failed = ScalingAudit.auditMeasurementFailures(fits, dirs.size)
    (over ++ failed).foreach(f =>
      System.err.println(s"[scaling] [${f.kind}] ${f.detail}"))
    val unfit = fits.filter(_.exponent.isEmpty).map(_.name)
    println(s"""{"metric":"scaling","n_queries":${fits.size},""" +
      s""""n_fit":${fits.count(_.exponent.nonEmpty)},""" +
      s""""n_over_bound":${over.size},"n_failed":${failed.size},""" +
      s""""cpus":$cpus,""" +
      s""""unfit":${unfit.take(12).map("\"" + _ + "\"")
        .mkString("[", ",", "]")}}""")
    val path = java.nio.file.Paths.get("scaling_exponents.json")
    if (check) {
      require(java.nio.file.Files.exists(path),
        "--check needs a checked-in scaling_exponents.json (run the " +
          "sweep without --check first)")
      val recorded = readTable(
        new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
      // a query that stopped RUNNING must fail the gate too — its
      // exponent is None, which the drift rules alone would read as
      // the benign sank-into-overhead case
      val drift = ScalingAudit.driftFindings(recorded, fits,
        bounds = bounds) ++ over ++ failed
      drift.foreach(f =>
        System.err.println(s"[scaling] DRIFT [${f.kind}] ${f.detail}"))
      spark.stop()
      if (drift.nonEmpty) sys.exit(1)
    } else {
      // MERGE into the prior table, never clobber: a subset run
      // (SPARK_GRAFT_ONLY) updates only what it measured and carries
      // every other recorded entry forward — same rule as the bench
      // record (exponents are basis-robust by the work metric, so a
      // carried entry stays comparable). The header reflects THIS run.
      val freshEntries: Map[String, String] = fits.map { f =>
        f.name -> s"""{"table":"${
          primaryTable.getOrElse(f.name, "")}","sizes":${
          sizesOf(f.name).mkString("[", ",", "]")},"wall":[${
          f.points.map(p => f3(p.wallSec)).mkString(",")}],"work":[${
          f.points.map(p => f3(p.workSec)).mkString(",")}],"exponent":${
          f.exponent.map(f3).getOrElse("null")}}"""
      }.toMap
      val priorEntries: Map[String, String] =
        if (!java.nio.file.Files.exists(path)) Map.empty
        else readRawEntries(
          new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
      val qJson = (priorEntries ++ freshEntries).toSeq.sortBy(_._1)
        .map { case (name, body) => s""""$name":$body""" }
        .mkString("{", ",", "}")
      val body = s"""{"sf_base":"$base","cpus":$cpus,"runs":$runs,""" +
        s""""dirs":${dirs.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""queries":$qJson}""" + "\n"
      java.nio.file.Files.write(path, body.getBytes("UTF-8"))
      spark.stop()
    }
  }

  /** The prior table's per-query entries as compact-rendered raw JSON
    * (for the subset-run merge); empty on any parse failure. */
  def readRawEntries(json: String): Map[String, String] = {
    import org.json4s._
    try {
      (org.json4s.jackson.JsonMethods.parse(json) \ "queries") match {
        case JObject(fields) => fields.map { case (name, v) =>
          name -> org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(v))
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty }
  }

  /** Recorded per-query exponents out of `scaling_exponents.json`
    * (fitted entries only). */
  def readTable(json: String): Map[String, Double] = {
    import org.json4s._
    try {
      (org.json4s.jackson.JsonMethods.parse(json) \ "queries") match {
        case JObject(fields) => fields.collect {
          case (name, JObject(body)) =>
            body.collectFirst {
              case ("exponent", JDouble(e))  => name -> e
              case ("exponent", JInt(e))     => name -> e.toDouble
              case ("exponent", JDecimal(e)) => name -> e.toDouble
            }
        }.flatten.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty }
  }
}
