package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("applyChanges: insert, update, delete, passthrough") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B", "U"),  // update
      (3L, "",  "D"),  // delete
      (4L, "d", "I"),  // insert
    ).toDF("k", "v", "op")
    val out = Merge.applyChanges(snap, changes, "k", "op")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("applyChanges: empty change batch is identity") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq.empty[(Long, String, String)].toDF("k", "v", "op")
    assert(Merge.applyChanges(snap, changes, "k", "op")
      .as[(Long, String)].collect().toMap === Map(1L -> "a"))
  }

  test("applyChanges: upsert on a key absent from the snapshot inserts it") {
    val snap = Seq.empty[(Long, String)].toDF("k", "v")
    val changes = Seq((9L, "z", "U")).toDF("k", "v", "op")
    assert(Merge.applyChanges(snap, changes, "k", "op")
      .as[(Long, String)].collect().toMap === Map(9L -> "z"))
  }

  test("scd2Versions: chained validity, tie-broken, single current per key") {
    val log = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "c"), // tie at ts 20 → v order
      (2L, 5L, "x"),
    ).toDF("k", "ts", "v")
    val out = Merge.scd2Versions(log, "k", "ts", tieCols = Seq("v"))
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out((1L, "a")) === ((10L, Some(20L), false)))
    assert(out((1L, "b")) === ((20L, Some(20L), false)), "tie-break on v: b before c")
    assert(out((1L, "c")) === ((20L, None, true)))
    assert(out((2L, "x")) === ((5L, None, true)))
    val currents = out.collect { case ((k, _), (_, _, true)) => k }
    assert(currents.toSeq.sorted === Seq(1L, 2L), "exactly one current version per key")
  }

  test("snapshotDiff: added/removed/changed classified, unchanged dropped, NULL is a change") {
    val old = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)), (4L, Option.empty[Double]))
      .toDF("k", "v")
    val niu = Seq((1L, Some(10.0)),  // unchanged -> dropped
      (2L, Some(25.0)),              // changed
      (4L, Some(40.0)),              // NULL -> value IS a change
      (5L, Some(50.0)))              // added; 3 removed
      .toDF("k", "v")
    val out = Merge.snapshotDiff(old, niu, "k", Seq("v"))
      .select("k", "change", "old_v", "new_v")
      .as[(Long, String, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(
      2L -> (("changed", Some(20.0), Some(25.0))),
      3L -> (("removed", Some(30.0), None)),
      4L -> (("changed", None, Some(40.0))),
      5L -> (("added", None, Some(50.0)))))
  }
}
