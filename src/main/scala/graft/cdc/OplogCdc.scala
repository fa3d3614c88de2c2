package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decoder for MongoDB oplog documents, as serialized to JSON by an
  * external mongo-oplog-style capture process (reference:
  * /root/reference/src/mongo.js:125-286 — the Spark side consumes the
  * capture stream; oplog tailing stays external, per SURVEY §0).
  *
  * Wire shape (one JSON object per oplog entry):
  *   {"op":"i"|"u"|"d", "ns":"db.collection", "o":{...}, "o2":{...}}
  * `o` is the document (insert) / operation document (update) / id doc
  * (delete); `o2` is the update selector.
  *
  * Reference behaviors replicated:
  *   - pk = o._id || o2._id for every kind (mongo.js:139,194,237).
  *   - insert item = o (mongo.js:141); update item = o2 || o — the
  *     reference passes the SELECTOR through when present, not the
  *     operation document (mongo.js:197; replicated verbatim per the
  *     SURVEY risk register: mirror, don't fix); delete has no item
  *     (mongo.js:237-240).
  *   - ns stays one "db.collection" string on the envelope; db/collection
  *     split on the FIRST dot (collection names may contain dots).
  *   - routing subject = ns.pk (nats.js:19-21).
  */
object OplogCdc {

  private val entrySchema = StructType(Seq(
    StructField("op", StringType),
    StructField("ns", StringType),
    StructField("o", StringType),
    StructField("o2", StringType),
    StructField("ts", LongType)))

  /** Decode a frame with a string column `line` into canonical envelopes:
    * kind, ns, db, collection, pk, item, subject. Non-DML oplog entries
    * (noops, commands) are dropped, like the reference's
    * insert/update/delete-only listeners. */
  def decode(df: DataFrame, lineCol: String = "line"): DataFrame =
    df.withColumn("_p", from_json(col(lineCol), entrySchema))
      .withColumn("kind",
        when(col("_p.op") === "i", "insert")
          .when(col("_p.op") === "u", "update")
          .when(col("_p.op") === "d", "delete"))
      .filter(col("kind").isNotNull)
      .withColumn("ns", col("_p.ns"))
      .withColumn("db", substring_index(col("ns"), ".", 1))
      .withColumn("collection",
        expr("substring(ns, length(substring_index(ns, '.', 1)) + 2)"))
      .withColumn("pk",
        coalesce(get_json_object(col("_p.o"), "$._id"),
          get_json_object(col("_p.o2"), "$._id")))
      .withColumn("item",
        when(col("kind") === "insert", col("_p.o"))
          .when(col("kind") === "update",
            coalesce(col("_p.o2"), col("_p.o"))))
      .withColumn("subject", concat_ws(".", col("ns"), col("pk")))
      // oplog ordering metadata: the BSON Timestamp's seconds, as
      // serialized by the capture layer — the commit_ts analogue for
      // event-time windows over an oplog replay (null when the capture
      // stream omits it)
      .withColumn("ts", col("_p.ts"))
      .drop("_p")
}
