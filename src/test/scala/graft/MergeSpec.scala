package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A1/A2/A3 golden tests mirroring the reference's
  * `tests/test_utils.py:24-33` (merge_dicts) and the `postprocess.py:28-54`
  * merge_entries semantics. */
class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("A1 multimap union golden (test_utils.py:24-33): values extend on clash") {
    // dict_a = {a:[1,2], b:[3]}; dict_b = {a:[3], c:[1,2,3]}
    val a = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("key", "v").withColumn("ord", lit(0))
    val b = Seq(("a", 3), ("c", 1), ("c", 2), ("c", 3)).toDF("key", "v").withColumn("ord", lit(1))
    val merged = a.unionByName(b)
      .groupBy($"key")
      .agg(transform(array_sort(collect_list(struct($"ord", $"v"))), s => s("v")).as("vs"))
      .as[(String, Seq[Int])].collect().toMap
    assert(merged === Map("a" -> Seq(1, 2, 3), "b" -> Seq(3), "c" -> Seq(1, 2, 3)))
  }

  test("A2/A3 mergeEntries golden: kept-first ordered widening, exclusions scalar") {
    val kept = Seq(
      ("u1", "C-1", "Title One", "/path/one.pdf"),
      ("u2", "C-2", "Title Two", "/path/two.pdf")) // u2 has no requests
      .toDF("url", "case_number", "title", "document_path")
    val requests = Seq(
      ("u1", "C-9", "Title Nine", 2L),
      ("u1", "C-5", "Title Five", 1L)) // arrival order: priority 1 then 2
      .toDF("url", "case_number", "title", "priority")
    val out = Merge.mergeEntries(kept, requests, "url",
      valueCols = Seq("case_number", "title"), arrival = Seq("priority"))
      .select($"url", $"case_numbers", $"titles", $"document_path", $"n_merged")
      .as[(String, Seq[String], Seq[String], String, Int)]
      .collect().map(r => r._1 -> r).toMap

    // kept value FIRST, then requests in arrival order (postprocess.py:45-51)
    assert(out("u1")._2 === Seq("C-1", "C-5", "C-9"))
    assert(out("u1")._3 === Seq("Title One", "Title Five", "Title Nine"))
    // excluded payload column stays scalar (postprocess.py:43)
    assert(out("u1")._4 === "/path/one.pdf")
    assert(out("u1")._5 === 3)
    // no requests → 1-element arrays (scalar promoted via as_list)
    assert(out("u2")._2 === Seq("C-2"))
    assert(out("u2")._3 === Seq("Title Two"))
    assert(out("u2")._5 === 1)
  }
}
