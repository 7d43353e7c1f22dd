package graft

import graft.functions.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize($"url").as("c")).as[String].collect().toSeq

  test("canonicalize strips the ID query param (preprocess.py:34-48)") {
    // the reference fixture shape: same doc URL, different session ID
    assert(canon(
      "https://dhcappl.nic.in/doc/PMS10102022SC1882022_124159.pdf?x=1&ID=1921559389_1",
      "https://dhcappl.nic.in/doc/PMS10102022SC1882022_124159.pdf?x=1&ID=other") ===
      Seq(
        "https://dhcappl.nic.in/doc/PMS10102022SC1882022_124159.pdf?x=1",
        "https://dhcappl.nic.in/doc/PMS10102022SC1882022_124159.pdf?x=1"))
  }

  test("canonicalize: ID-only query string drops the '?' entirely") {
    assert(canon("https://h/view?ID=abc") === Seq("https://h/view"))
  }

  test("canonicalize: ID param in the middle is removed, others kept in order") {
    assert(canon("https://h/v?a=1&ID=zz&b=2") === Seq("https://h/v?a=1&b=2"))
  }

  test("canonicalize: no query string unchanged; fragment stripped") {
    assert(canon("https://h/v", "https://h/v#frag") === Seq("https://h/v", "https://h/v"))
  }

  test("canonicalize: IDx param (prefix, not exact) is kept") {
    assert(canon("https://h/v?IDx=1&case=2") === Seq("https://h/v?IDx=1&case=2"))
  }

  test("host extraction") {
    val got = Seq("https://courts-dhc.example.org/view?case=1", "http://A.B.c:8080/x")
      .toDF("url").select(Urls.host($"url").as("h")).as[String].collect().toSeq
    assert(got === Seq("courts-dhc.example.org", "a.b.c"))
  }

  test("urlHash is stable and distinct across canonical urls") {
    val df = Seq("https://h/a", "https://h/b").toDF("url")
      .select(Urls.urlHash($"url").as("h")).as[Long].collect().toSeq
    assert(df.distinct.size === 2)
  }
}
