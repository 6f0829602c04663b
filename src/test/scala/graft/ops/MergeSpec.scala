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
}
