package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** cdc5 (snapshot apply) / cdc6 (SCD2 history) — the two canonical
  * consumer operations over the reference's change stream. Semantics are
  * oracle-checked by the driver; these tests pin the SCALE SHAPE of the
  * plans plus the edge semantics the oracle formulas can't isolate. */
class CdcConsumerOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cdc5 snapshot apply: latest event wins, a latest delete removes " +
      "the row, and the plan is a pure hash aggregate (no window, no sort " +
      "before the output ORDER BY)") {
    val snap = CdcOps.cdc5_apply(spark, sfDir)
    val rows = snap.collect()
    // k%4==3 keys end in a delete → absent from the snapshot
    assert(rows.forall(_.getLong(0) % 4 != 3))
    // k%4==1 keys are never updated → still rev 1 / NEW
    val neverUpdated = rows.filter(_.getLong(0) % 4 == 1)
    assert(neverUpdated.nonEmpty)
    assert(neverUpdated.forall(r => r.getString(1) == "NEW" && r.getLong(2) == 1L))
    // all others were updated → rev 2, real status
    val updated = rows.filter(r => r.getLong(0) % 4 != 1)
    assert(updated.nonEmpty && updated.forall(r => r.getLong(2) == 2L))
    // scale shape: snapshotting must be the max_by hash aggregate — a
    // row_number()-over-pk formulation would show a Window + per-key sort
    val plan = snap.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "cdc5 must not materialize the snapshot through a window")
  }

  test("cdc6 SCD2: versions chain [valid_from, valid_to), deletes close " +
      "but never appear, exactly one current version per live key") {
    val hist = CdcOps.cdc6_scd2(spark, sfDir)
    hist.persist()
    try {
      // chained bounds: rev1.valid_to == rev2.valid_from where both exist
      val broken = hist.groupBy("pk")
        .agg(count(lit(1)).as("n"),
          sum(col("is_current")).as("cur"),
          max(col("rev")).as("maxrev"))
      // live keys (k%4 != 3) carry exactly one open version; dead keys none
      assert(broken.filter(col("pk") % 4 =!= 3)
        .filter(col("cur") =!= 1).count() == 0)
      assert(broken.filter(col("pk") % 4 === 3)
        .filter(col("cur") =!= 0).count() == 0)
      // adjacency: the next version starts where the previous one ends
      val pairs = hist.alias("a").join(hist.alias("b"),
        col("a.pk") === col("b.pk") && col("a.rev") + 1 === col("b.rev"))
      assert(pairs.filter(col("a.valid_to") =!= col("b.valid_from"))
        .count() == 0)
    } finally { hist.unpersist(); () }
  }

  test("cdc9 incremental SCD2 merge over the interleaved fixture equals " +
      "the full rebuild, row for row") {
    import graft.cdc.JsonCdc
    val ev = JsonCdc.decode(CdcOps.interleavedHistory(spark, sfDir))
      .filter(col("kind").isin("insert", "update", "delete"))
      .select(col("pk").cast("long").as("pk"), col("seq"), col("kind"),
        get_json_object(col("item"), "$.rev").cast("long").as("rev"),
        get_json_object(col("item"), "$.status").as("status"))
    val full = CdcOps.scd2Chains(ev).orderBy("pk", "valid_from").collect()
    val merged = CdcOps.cdc9_scd2_merge(spark, sfDir).collect()
    assert(full.length == merged.length)
    assert(full.sameElements(merged))
  }

  test("cdc9 merge handles a planted batch: update closing an open " +
      "version, delete ending a chain, and a brand-new key arriving " +
      "only in the batch") {
    // existing table built from: k1 insert@1 (open);
    // k2 insert@2, update@3 (closed rev1 + open rev2); k3 insert@4 (open,
    // untouched by the batch — must pass through byte-identical)
    val baseEv = Seq(
      (1L, 1L, "insert", 1L, "NEW"),
      (2L, 2L, "insert", 1L, "NEW"),
      (2L, 3L, "update", 2L, "A"),
      (3L, 4L, "insert", 1L, "NEW"))
      .toDF("pk", "seq", "kind", "rev", "status")
    // batch: k1 updated twice (two new versions in ONE batch),
    // k2 deleted, k4 is a key the existing table has never seen
    val batchEv = Seq(
      (1L, 10L, "update", Option(2L), Option("B")),
      (1L, 11L, "update", Option(3L), Option("C")),
      (2L, 12L, "delete", Option.empty[Long], Option.empty[String]),
      (4L, 13L, "insert", Option(1L), Option("NEW")))
      .toDF("pk", "seq", "kind", "rev", "status")
    val existing = CdcOps.scd2Chains(baseEv)
    val merged = CdcOps.scd2Merge(existing, batchEv)
      .orderBy("pk", "valid_from")
    val full = CdcOps.scd2Chains(baseEv.unionByName(batchEv))
      .orderBy("pk", "valid_from")
    assert(merged.collect().sameElements(full.collect()))
    val rows = merged.collect()
    // k1: NEW closed at 10, B closed at 11, C open
    assert(rows.filter(_.getLong(0) == 1L).map(r =>
      (r.getString(2), Option(r.get(4)), r.getInt(5))).toSeq ==
      Seq(("NEW", Some(10L), 0), ("B", Some(11L), 0), ("C", None, 1)))
    // k2: both versions closed, none current (deleted)
    assert(rows.filter(_.getLong(0) == 2L).forall(_.getInt(5) == 0))
    // k3 untouched: still the single open version
    assert(rows.filter(_.getLong(0) == 3L).map(r =>
      (r.getString(2), r.getInt(5))).toSeq == Seq(("NEW", 1)))
    // k4 new in batch: one open version
    assert(rows.filter(_.getLong(0) == 4L).map(r =>
      (r.getString(2), r.getInt(5))).toSeq == Seq(("NEW", 1)))
  }

  test("property: scd2Merge equals the full rebuild on random " +
      "interleaved histories at random cut points — new keys, null " +
      "statuses, deletes, multi-event batches all land the same bytes") {
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 6) {
      val nKeys = 5 + rnd.nextInt(10)
      val remaining = scala.collection.mutable.Map[Long, List[String]]()
      (1L to nKeys).foreach { k =>
        remaining(k) = List("insert") ++
          List.fill(rnd.nextInt(4))("update") ++
          (if (rnd.nextBoolean()) List("delete") else Nil)
      }
      val alive = scala.collection.mutable.ArrayBuffer((1L to nKeys): _*)
      val revAt = scala.collection.mutable.Map[Long, Long]()
      val evs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, String, Option[Long], Option[String])]
      var seq = 0L
      while (alive.nonEmpty) {
        val i = rnd.nextInt(alive.size)
        val k = alive(i)
        val kind :: rest = remaining(k): @unchecked
        remaining(k) = rest
        if (rest.isEmpty) { alive.remove(i); () }
        seq += 1 + rnd.nextInt(3)
        if (kind == "delete") evs += ((k, seq, kind, None, None))
        else {
          val rev = revAt.getOrElse(k, 0L) + 1
          revAt(k) = rev
          // ~1 in 6 versions carries a genuinely NULL status
          val st = if (rnd.nextInt(6) == 0) None
            else Some(s"S${rnd.nextInt(3)}")
          evs += ((k, seq, kind, Some(rev), st))
        }
      }
      val all = evs.toSeq.toDF("pk", "seq", "kind", "rev", "status")
        .localCheckpoint()
      val cut = 1 + rnd.nextInt(seq.toInt.max(2) - 1)
      val merged = CdcOps.scd2Merge(
          CdcOps.scd2Chains(all.filter(col("seq") <= cut)),
          all.filter(col("seq") > cut))
        .orderBy("pk", "valid_from").collect()
      val full = CdcOps.scd2Chains(all)
        .orderBy("pk", "valid_from").collect()
      assert(merged.sameElements(full),
        s"merge != rebuild at cut=$cut over ${evs.size} events")
    }
  }

  test("cdc10 signedAttrDeltas: insert/update/delete book the signed " +
      "attribute pairs, NULL attrs carried faithfully") {
    // pk 1: insert(ck=5, st=A) → update(ck=5, st=B) → delete
    // pk 2: insert(ck=7, st=NULL) — null is a legitimate attr value
    val ev = Seq(
        (1L, 1L, "insert", Some(5L), Some("A")),
        (1L, 2L, "update", Some(5L), Some("B")),
        (1L, 3L, "delete", None, None),
        (2L, 1L, "insert", Some(7L), None))
      .toDF("pk", "seq", "kind", "ck", "st")
    val got = CdcOps.signedAttrDeltas(ev, Seq("ck", "st"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.getString(2)), r.getLong(3))).toSet
    assert(got == Set(
      (1L, Some(5L), Some("A"), 1L),   // insert +new
      (2L, Some(5L), Some("A"), -1L),  // update -prev
      (2L, Some(5L), Some("B"), 1L),   // update +new
      (3L, Some(5L), Some("B"), -1L),  // delete -prev
      (1L, Some(7L), None, 1L)))       // insert with null attr
  }

  test("property: cdc10 join-view maintenance equals the recompute at " +
      "EVERY cut of a random interleaved two-sided history") {
    // small planted domain: 6 customers moving between 3 nations with
    // deletes, 10 orders over 3 statuses with re-pointing custkeys —
    // update may change the JOIN KEY itself, the case the fixture
    // (custkey never changes) cannot reach
    val rnd = new scala.util.Random(17)
    val oEvs = scala.collection.mutable.ArrayBuffer[
      (Long, Long, String, Option[Long], Option[String])]()
    val cEvs = scala.collection.mutable.ArrayBuffer[
      (Long, Long, String, Option[Long], Option[Int])]()
    var seq = 0L
    val oAlive = scala.collection.mutable.Set[Long]()
    val cAlive = scala.collection.mutable.Set[Long]()
    for (_ <- 1 to 120) {
      seq += 1
      if (rnd.nextBoolean()) {
        val k = 1L + rnd.nextInt(10)
        if (!oAlive(k)) { oAlive += k
          oEvs += ((k, seq, "insert", Some(1L + rnd.nextInt(6)),
            Some(s"S${rnd.nextInt(3)}")))
        } else if (rnd.nextInt(4) == 0) { oAlive -= k
          oEvs += ((k, seq, "delete", None, None))
        } else oEvs += ((k, seq, "update", Some(1L + rnd.nextInt(6)),
          Some(s"S${rnd.nextInt(3)}")))
      } else {
        val k = 1L + rnd.nextInt(6)
        if (!cAlive(k)) { cAlive += k
          cEvs += ((k, seq, "insert", Some(k), Some(rnd.nextInt(3))))
        } else if (rnd.nextInt(5) == 0) { cAlive -= k
          cEvs += ((k, seq, "delete", None, None))
        } else cEvs += ((k, seq, "update", Some(k), Some(rnd.nextInt(3))))
      }
    }
    val dOrd = CdcOps.signedAttrDeltas(
        oEvs.toSeq.toDF("pk", "seq", "kind", "ck", "st"), Seq("ck", "st"))
      .localCheckpoint()
    val dCus = CdcOps.signedAttrDeltas(
        cEvs.toSeq.toDF("pk", "seq", "kind", "ck", "nat"), Seq("ck", "nat"))
      .localCheckpoint()
    def result(cut: Long) =
      CdcOps.ivmJoinMaintain(dOrd, dCus, cut)
        .orderBy("nat", "st").collect().toSeq
    // cut=0: everything is the batch; cut=seq+1: pure recompute of the
    // accumulated state — these two extremes bracket every mid-cut
    val want = result(seq + 1)
    assert(want.nonEmpty, "degenerate fixture: empty join view")
    for (cut <- Seq(0L, 1L, seq / 3, seq / 2, 2 * seq / 3, seq))
      assert(result(cut) == want, s"maintenance != recompute at cut=$cut")
  }

  test("property: cdc11 distinct-count maintenance equals the recompute " +
      "at every cut — support rising from 0, returning to 0, and " +
      "re-rising all cross correctly") {
    // orders churn over few (status, custkey) pairs so supports
    // repeatedly hit and leave zero — the non-linear edge the fixture's
    // one-pass history can't fully exercise
    val rnd = new scala.util.Random(29)
    val evs = scala.collection.mutable.ArrayBuffer[
      (Long, Long, String, Option[Long], Option[String])]()
    val alive = scala.collection.mutable.Set[Long]()
    var seq = 0L
    for (_ <- 1 to 200) {
      seq += 1
      val k = 1L + rnd.nextInt(15)
      if (!alive(k)) { alive += k
        evs += ((k, seq, "insert", Some(1L + rnd.nextInt(3)),
          Some(s"S${rnd.nextInt(2)}")))
      } else if (rnd.nextInt(3) == 0) { alive -= k
        evs += ((k, seq, "delete", None, None))
      } else evs += ((k, seq, "update", Some(1L + rnd.nextInt(3)),
        Some(s"S${rnd.nextInt(2)}")))
    }
    val deltas = CdcOps.signedAttrDeltas(
        evs.toSeq.toDF("pk", "seq", "kind", "ck", "st"), Seq("ck", "st"))
      .localCheckpoint()
    def result(cut: Long) =
      CdcOps.ivmDistinctMaintain(deltas, cut).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = result(seq + 1)
    assert(want.nonEmpty)
    // sanity vs an independent in-memory replay of final state
    val state = scala.collection.mutable.Map[Long, (Long, String)]()
    evs.foreach {
      case (k, _, "insert", Some(ck), Some(st)) => state(k) = (ck, st)
      case (k, _, "update", Some(ck), Some(st)) => state(k) = (ck, st)
      case (k, _, "delete", _, _) => state.remove(k)
      case _ =>
    }
    val exact = state.values.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet.size.toLong).toMap
    assert(want.toMap == exact, "maintenance != in-memory truth")
    for (cut <- Seq(0L, 1L, seq / 4, seq / 2, 3 * seq / 4, seq))
      assert(result(cut) == want, s"maintenance != recompute at cut=$cut")
  }
}
