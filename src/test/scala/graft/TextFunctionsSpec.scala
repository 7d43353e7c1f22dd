package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("tokenCountFast equals token array size on single-spaced text") {
    val df = Seq("a b c", "", "hello", "x y z w").toDF("t")
      .select(TF.tokenCountFast($"t").as("fast"), size(TF.tokens($"t")).as("exact"))
    df.collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("shingles: k-grams in order; short text yields empty") {
    val got = Seq("a b c d").toDF("t").select(TF.shingles($"t", 2).as("s"))
      .as[Seq[String]].head()
    assert(got === Seq("a b", "b c", "c d"))
    val short = Seq("a").toDF("t").select(TF.shingles($"t", 2).as("s"))
      .as[Seq[String]].head()
    assert(short === Seq.empty)
  }

  test("minhash: identical texts → identical signatures; estimate tracks exact jaccard") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 54).map(i => s"w$i").mkString(" ") + " x1 x2 x3 x4 x5 x6"
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val df = Seq(("a", base), ("b", base), ("c", near), ("d", far)).toDF("id", "t")
      .select($"id", TF.minhashSignature($"t", 3, 64).as("sig"))
    val sigs = df.as[(String, Seq[Long])].collect().toMap
    assert(sigs("a") === sigs("b"))
    val estNear = sigs("a").zip(sigs("c")).count { case (x, y) => x == y } / 64.0
    val estFar = sigs("a").zip(sigs("d")).count { case (x, y) => x == y } / 64.0
    assert(estNear > 0.5, s"near estimate $estNear")
    assert(estFar < 0.1, s"far estimate $estFar")
  }

  test("ngramJaccard: identical → 1.0, disjoint → 0.0") {
    val df = Seq(("a b c d e", "a b c d e", "p q r s t")).toDF("x", "y", "z")
      .select(TF.ngramJaccard($"x", $"y", 2).as("same"),
        TF.ngramJaccard($"x", $"z", 2).as("diff"))
    val r = df.collect().head
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("simhash: identical texts equal; near texts low hamming; far texts high") {
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val near = (1 to 78).map(i => s"tok$i").mkString(" ") + " zz yy"
    val far = (1 to 80).map(i => s"other$i").mkString(" ")
    val df = Seq(("a", base), ("b", base), ("c", near), ("d", far)).toDF("id", "t")
      .select($"id", TF.simhash64($"t").as("h"))
    val hs = df.as[(String, Long)].collect().toMap
    assert(hs("a") === hs("b"))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(hs("a"), hs("c")) < 12, s"near hamming ${ham(hs("a"), hs("c"))}")
    assert(ham(hs("a"), hs("d")) > 16, s"far hamming ${ham(hs("a"), hs("d"))}")
  }

  test("hamming64 column matches JVM bitCount") {
    val df = Seq((0x0FL, 0xF0L), (123456789L, 123456789L)).toDF("a", "b")
      .select(TF.hamming64($"a", $"b").as("h"))
    assert(df.as[Int].collect().toSeq === Seq(8, 0))
  }

  test("fingerprint: deterministic, order-invariant size") {
    val df = Seq("one two three four five six seven eight nine ten").toDF("t")
      .select(TF.fingerprint($"t", 2, 4).as("fp"))
    val fp1 = df.as[Seq[Long]].head()
    val fp2 = df.as[Seq[Long]].head()
    assert(fp1 === fp2)
    assert(fp1.size === 4)
    assert(fp1 === fp1.sorted)
  }

  test("langId picks the marker language; und when no markers") {
    val df = Seq(
      ("the cat and the dog is in that house with food", "en"),
      ("der hund und die katze ist nicht mit ein haus", "de"),
      ("le chat et la maison est dans une ville pour toi", "fr"),
      ("el gato es en la casa que una vez por dia", "es"),
      ("qqq www zzz", "und")).toDF("t", "expected")
      .select(TF.langId($"t").as("got"), $"expected")
    df.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("quality components and keep gate") {
    val good = ("the quick brown fox jumps over the lazy dog and runs far away " * 3).trim
    val digits = "1 2 3 4 5 6 7 8 9 0 11 22 33 44 55 66 77 88 99 00 111 222"
    val df = Seq(("g", good), ("d", digits)).toDF("id", "t")
      .select($"id", TF.qualityKeep($"t").as("keep"))
    val m = df.as[(String, Boolean)].collect().toMap
    assert(m("g") === true)
    assert(m("d") === false)
  }

  test("cosineSimilarity: orthogonal 0, parallel 1") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f), Array(2f, 0f))).toDF("a", "b", "c")
      .select(TF.cosineSimilarity($"a", $"b").as("ab"),
        TF.cosineSimilarity($"a", $"c").as("ac"))
    val r = df.collect().head
    assert(math.abs(r.getDouble(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }

  test("srpBucket: deterministic; identical vectors share buckets") {
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val w = Array.tabulate(8)(i => -(i + 1).toFloat)
    val df = Seq(("a", v), ("b", v), ("c", w)).toDF("id", "e")
      .select($"id", TF.srpBucket($"e", 6, 8).as("bkt"))
    val m = df.as[(String, Long)].collect().toMap
    assert(m("a") === m("b"))
    // opposite vector flips every plane sign → complementary bucket
    assert(m("c") === ((~m("a")) & ((1L << 6) - 1)))
  }
}
