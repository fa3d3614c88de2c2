package graft.cdc

import graft.SparkSpec

/** Mongo oplog normalizer semantics mirrored from the reference's live-DB
  * integration tests (/root/reference/test/mongo.test.js:129-324) and the
  * oplog listeners (/root/reference/src/mongo.js:125-286).
  */
class OplogDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (0L, """{"op": "i", "ns": "lapidus.users", "o": {"_id": 1, "name": "Hayden"}, "ts": 1700000001}"""),
    // update: o = operation doc (no _id), o2 = selector → pk falls back
    // to o2._id and item passes the SELECTOR through (mongo.js:194-198)
    (1L, """{"op": "u", "ns": "lapidus.users", "o": {"$set": {"name": "Aiden"}}, "o2": {"_id": 1}}"""),
    (2L, """{"op": "d", "ns": "lapidus.users", "o": {"_id": 1}}"""),
    // dotted collection name: split on the FIRST dot only
    (3L, """{"op": "i", "ns": "lapidus.audit.v2", "o": {"_id": 9}}"""),
    // non-DML entries (commands, noops) are dropped
    (4L, """{"op": "c", "ns": "lapidus.$cmd", "o": {"drop": "users"}}"""),
    (5L, """{"op": "n", "ns": "", "o": {"msg": "periodic noop"}}"""))

  private def decoded = OplogCdc.decode(fixture.toDF("seq", "line"))

  test("insert: pk = o._id, item = o") {
    val e = decoded.filter($"seq" === 0)
      .select("kind", "pk", "item").head()
    assert(e.getString(0) == "insert" && e.getString(1) == "1")
    assert(e.getString(2).contains("Hayden"))
  }

  test("update: pk falls back to o2._id; item is o2 (reference behavior)") {
    val e = decoded.filter($"seq" === 1)
      .select("kind", "pk", "item").head()
    assert(e.getString(0) == "update" && e.getString(1) == "1")
    // the reference passes the selector through as item (mongo.js:197:
    // item = o2 || o) — NOT the $set operation document. (from_json's
    // raw-subtree capture re-serializes compactly, hence no spaces.)
    assert(e.getString(2) == """{"_id":1}""")
  }

  test("delete: pk present, no item") {
    val e = decoded.filter($"seq" === 2)
      .select("kind", "pk", "item").head()
    assert(e.getString(0) == "delete" && e.getString(1) == "1")
    assert(e.isNullAt(2))
  }

  test("ns splits on the first dot; dotted collection names survive") {
    val e = decoded.filter($"seq" === 3)
      .select("ns", "db", "collection").head()
    assert(e.getString(0) == "lapidus.audit.v2")
    assert(e.getString(1) == "lapidus" && e.getString(2) == "audit.v2")
  }

  test("subject = ns.pk (nats.js:19-21)") {
    val e = decoded.filter($"seq" === 0).select("subject").head()
    assert(e.getString(0) == "lapidus.users.1")
  }

  test("non-DML oplog entries are dropped") {
    assert(decoded.count() == 4)
  }

  test("oplog ts rides the envelope for event-time ops; null when absent") {
    val withTs = decoded.filter($"seq" === 0).select("ts").head()
    assert(!withTs.isNullAt(0) && withTs.getLong(0) == 1700000001L)
    val withoutTs = decoded.filter($"seq" === 2).select("ts").head()
    assert(withoutTs.isNullAt(0))
  }
}
