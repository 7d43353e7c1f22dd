package graft

import graft.functions.Hashing
import graft.model.{Doc, Span}
import graft.operators.{Dedup, Segregate}
import graft.sources.{Synth, SynthConfig}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the typed (plain-Scala) kernels to their Catalyst twins: same
  * hashes, same rendering strings, same filter decisions. The crawler runs
  * the typed path (array HOFs are interpreted CodegenFallback in Spark —
  * measured ~10 ms/doc); the Column path is the query-surface API. */
class HashingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("Hashing.xxhash64Str equals the xxhash64 column function") {
    val vals = Seq("", "a", "hello world", "IN THE HIGH COURT", "ü¶€ unicode")
    val fromCol = vals.toDF("s").select(xxhash64($"s").as("h")).as[Long].collect()
    val fromScala = vals.map(s => Hashing.xxhash64Str(s))
    assert(fromCol.toSeq === fromScala)
  }

  test("typed renderings equal Column renderings on synth docs") {
    val cfg = SynthConfig()
    val docs = (0L until 30L).map(i => Doc(s"d$i", Synth.spansOf(cfg, i)))
    val byId = docs.toDS.toDF.select(
      $"doc_id",
      Segregate.renderPlain($"spans").as("p"),
      Segregate.renderNoDigits($"spans").as("n"),
      Segregate.renderMarked($"spans").as("m"))
      .as[(String, String, String, String)].collect()
      .map { case (id, p, n, m) => id -> ((p, n, m)) }.toMap
    docs.foreach { d =>
      val (p, n, m) = (byId(d.doc_id)._1, byId(d.doc_id)._2, byId(d.doc_id)._3)
      assert(p === Segregate.renderPlainStr(d.spans), s"plain ${d.doc_id}")
      assert(n === Segregate.renderNoDigitsStr(d.spans), s"nodigits ${d.doc_id}")
      assert(m === Segregate.renderMarkedStr(d.spans), s"marked ${d.doc_id}")
    }
  }

  test("typed sentKeepStr equals the Column sentCountFilter") {
    val paras = Seq(
      "One. Two. Three.",
      "Short. Text.",
      ("word " * 31).trim + ".",
      "the a of and to in on for with by",
      "",
      "1. 2. 3!? mixed punctuation here",
      ("content " * 40).trim)
    val df = paras.zipWithIndex.map { case (c, i) => (i, c) }.toDF("id", "content")
    val keptCol = Segregate.sentCountFilter(df).select($"id").as[Int].collect().toSet
    val keptScala = paras.zipWithIndex.collect {
      case (c, i) if Segregate.sentKeepStr(c) => i
    }.toSet
    assert(keptCol === keptScala)
  }

  test("Wire.docHashesStreaming equals Dedup.docHashes(decodeSpans) bit-for-bit") {
    val cfg = SynthConfig()
    val synthDocs = (0L until 40L).map(i => Doc(s"d$i", Synth.spansOf(cfg, i)))
    // adversarial shapes: unicode (2/3-byte UTF-8), supplementary-plane code
    // points (4-byte → surrogate pairs), unicode numerals/spaces in starter
    // position, null text, null media_ref, empty doc
    val weird = Seq(
      Doc("w0", Seq(Span("text", "ü¶€ 12. düö", null, 0), Span("image", null, "m0", 1))),
      Doc("w1", Seq(Span("text", " ١٢. arabic-indic starter", null, 0))),
      Doc("w2", Seq(Span("text", "𐄇 supplementary 𐄇 pair", null, 0),
        Span("heading", "H𝟙", null, 1), Span("text", "1. after ünïcode", null, 2))),
      Doc("w3", Seq(Span("text", null, null, 0), Span("table", "t", null, 1))),
      Doc("w4", Seq.empty),
      Doc("w5", Seq(Span("heading", null, null, 0), Span("text", " 2 . dotted", null, 1))))
    (synthDocs ++ weird).foreach { d =>
      val payload = graft.sources.Wire.encode(Nil, Some(d))
      val streamed = graft.sources.Wire.docHashesStreaming(7L, "c", payload)
      val objects = Dedup.docHashes(d.doc_id, 7L, "c",
        graft.sources.Wire.decodeSpans(payload))
      assert(streamed === objects, s"streaming hash mismatch for ${d.doc_id}")
    }
  }

  test("Wire.paragraphsFilteredStreaming equals segregateDoc+sentKeepStr on objects") {
    val cfg = SynthConfig()
    val synthDocs = (0L until 40L).map(i => Doc(s"d$i", Synth.spansOf(cfg, i)))
    val weird = Seq(
      Doc("w0", Seq(Span("text", "1. ü¶€ starter. Two. Three sentences here.", null, 0),
        Span("text", "continuation text", null, 1), Span("text", "2. next", null, 2))),
      Doc("w1", Seq(Span("text", " ١٢. arabic-indic starter. A. B. C.", null, 0),
        Span("text", "3. close", null, 1))),
      Doc("w2", Seq(Span("text", "𐄇 supplementary", null, 0), Span("heading", "H", null, 1),
        Span("text", "1. after heading. X. Y. Z.", null, 2), Span("text", "2. tail", null, 3))),
      Doc("w3", Seq(Span("text", null, null, 0), Span("table", "t", null, 1))),
      Doc("w4", Seq.empty),
      Doc("w5", Seq(Span("text", "1 . 2. chained ref. Sent. Sent. Sent.", null, 0),
        Span("image", null, "m", 1), Span("text", "9. end", null, 2))),
      // reference-scan adversaries: multi-repetition chain, incomplete
      // trailing repetition (digits with no dot — must roll back), NBSP as
      // \p{Z} inside the chain, supplementary-plane \p{N} (U+10107) in the
      // reference itself
      Doc("w6", Seq(Span("text", "1.2. 3. triple chain. A one. B two. C three.", null, 0))),
      Doc("w7", Seq(Span("text", "12. 34 not a second rep. One. Two. Three.", null, 0))),
      Doc("w8", Seq(Span("text", "5 . nbsp ref. One. Two. Three.", null, 0))),
      Doc("w9", Seq(Span("text", "𐄇. aegean ref. One. Two. Three.", null, 0))))
    (synthDocs ++ weird).foreach { d =>
      val payload = graft.sources.Wire.encode(Nil, Some(d))
      val streamed = graft.sources.Wire.paragraphsFilteredStreaming(payload, "plain")
      val objects = Segregate.segregateDoc(d.doc_id, "plain", d.spans)
        .filter(p => Segregate.sentKeepStr(p.content))
      assert(streamed === objects, s"streaming paragraph mismatch for ${d.doc_id}")
    }
  }

  test("Wire.paragraphsArrayData CONTENT equals the object path (no scratch aliasing)") {
    // Regression (round 4): the Catalyst sink wrapped the reusable fold
    // scratch zero-copy (UTF8String.fromBytes aliases the array), so every
    // row read back as the LAST paragraph's bytes once the fold moved on —
    // counts matched, content was garbage. This pins the actual strings of
    // the wireParagraphs column against paragraphsFilteredStreaming.
    val cfg = SynthConfig()
    (0L until 25L).foreach { i =>
      val d = Doc(s"d$i", Synth.spansOf(cfg, i))
      val payload = graft.sources.Wire.encode(Nil, Some(d))
      val obj = graft.sources.Wire.paragraphsFilteredStreaming(payload, "plain")
      val arr = graft.sources.Wire.paragraphsArrayData(payload, "plain", 3, 30)
      assert(arr != null, s"null array for d$i")
      val viaExpr = (0 until arr.numElements()).map { k =>
        val r = arr.getStruct(k, 4)
        (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString,
          if (r.isNullAt(3)) null else r.getUTF8String(3).toString)
      }
      val viaObj = obj.map(p => (p.page, p.paragraph_number, p.content, p.reference))
      assert(viaExpr === viaObj, s"wireParagraphs content mismatch for d$i")
    }
  }

  test("Wire round-trip: encode → decodeDiscovered/decodeDoc is identity") {
    val ds = Seq(
      Synth.Discovered("https://a.example.org/x?y=1", "c", "q", 2, 1, 99L, "CN/1", "Tü", "2022-01-01", 3),
      Synth.Discovered("https://b.example.org/", null, null, -1, 2, -1L, null, null, null, -1))
    val doc = Doc("D/1", Seq(Span("text", "body ünïcode 𐄇", null, 0), Span("image", null, "ref", 1)))
    val p1 = graft.sources.Wire.encode(ds, Some(doc))
    assert(graft.sources.Wire.decodeDiscovered(p1) === ds)
    assert(graft.sources.Wire.decodeDoc(p1) === Some(doc))
    val p2 = graft.sources.Wire.encode(ds, None)
    assert(graft.sources.Wire.decodeDiscovered(p2) === ds)
    assert(graft.sources.Wire.decodeDoc(p2) === None)
    assert(graft.sources.Wire.encode(Nil, None) === null)
    assert(graft.sources.Wire.decodeDiscovered(null) === Nil)
    assert(graft.sources.Wire.decodeDoc(null) === None)
  }

  test("fetchEncoded equals fetch+encode on every URL kind, bit-for-bit") {
    // The crawl hot loop streams pdf payloads byte-direct
    // (Synth.writePdfPayload into a Wire.PayloadWriter); this pins it to the
    // Span/String object path across pdf / listing / docpage / failure URLs,
    // including a failRate config so the fail branch is exercised.
    for (cfg <- Seq(SynthConfig(), SynthConfig(failRate = 0.3, seed = 7L))) {
      val urls =
        (0L until 40L).map(fid => Synth.pdfUrl(cfg, (fid % cfg.courts).toInt, fid * 64 + (fid % cfg.courts))) ++
        // every page: exercises the no-next-page tail and ~64-bit junk IDs
        // (negative longs → the unsigned-digits writer) in the byte-direct
        // listing encoder
        (0 until cfg.courts).flatMap(c => (0 until 2).flatMap(q =>
          (1 to cfg.pagesPerQuery).map(page => Synth.listingUrl(c, q, page)))) ++
        // enough docpages to hit the 1/8 mirror-host branch of the pdf-url writer
        (0 until cfg.courts).flatMap(c => (0 until 12).map(rank =>
          Synth.docPageHref(cfg, c, Synth.caseIdOf(cfg, c, 1, 2, rank), 5L))) ++
        Seq("https://nowhere.example.org/unknown")
      for (url <- urls; attempt <- Seq(0, 1, 2)) {
        val out = Synth.fetch(cfg, url, attempt)
        val enc = Synth.fetchEncoded(cfg, url, attempt)
        assert(enc.status === out.status, url)
        assert(enc.kind === out.kind, url)
        assert(enc.docId === out.doc.map(_.doc_id).orNull, url)
        assert(enc.bytes === out.bytes, url)
        assert(enc.latencyMicros === out.latencyMicros, url)
        val expected = graft.sources.Wire.encode(out.discovered, out.doc)
        assert(java.util.Arrays.equals(enc.payload, expected), s"payload bytes differ for $url attempt $attempt")
      }
    }
  }

  test("synth doc text is BMP-only (q_rendering_dedup oracle contract)") {
    // The q_rendering_dedup DuckDB oracle counts CODE POINTS
    // (length(s.text)) where the engine's sz counts UTF-16 units, and its
    // \p{N} strip covers supplementary-plane numerals where the engine's
    // isNumberChar is BMP-only by design (Dedup.scala). The two agree
    // precisely BECAUSE the synthetic corpus never leaves the BMP — this
    // test pins that generator invariant so a vocab change cannot silently
    // diverge engine and oracle (ADVICE r3).
    val cfg = SynthConfig()
    (0L until 200L).foreach { i =>
      Synth.spansOf(cfg, i).foreach { sp =>
        Seq(sp.text, sp.media_ref).filter(_ != null).foreach { s =>
          assert(s.codePoints().allMatch(cp => cp <= 0xFFFF),
            s"supplementary-plane char in synth doc $i: '$s'")
        }
      }
    }
  }

  test("starterFind scan equals the StarterRegex") {
    val pat = Segregate.StarterRegex.r.pattern
    val cases = Seq(
      "1. para", " 12 . x", " 1.", "a 1. b", ". dot first", "", " ",
      "١٢. arabic", "Ⅻ. roman numeral", "①. circled", "12",
      "12.", "  .", "1 2.", "𐄇. aegean number", " 1. ")
    cases.foreach { s =>
      assert(Segregate.starterFind(s) === pat.matcher(s).find(), s"mismatch on '$s'")
    }
  }

  test("docHashes is deterministic and discriminates content") {
    val cfg = SynthConfig()
    val a = Dedup.docHashes("x", 1L, "c", Synth.spansOf(cfg, 1L))
    val a2 = Dedup.docHashes("x", 1L, "c", Synth.spansOf(cfg, 1L))
    val b = Dedup.docHashes("x", 1L, "c", Synth.spansOf(cfg, 2L))
    assert(a === a2)
    assert(a.content_hash !== b.content_hash)
    // D3 plant: two contents sharing a baseId collide under nodigits only
    val contentA = Synth.spansOf(cfg, 10L)
    val base = Synth.baseIdOf(cfg, 10L)
    val partner = (0L until cfg.contentSpace).find(c2 =>
      c2 != 10L && Synth.baseIdOf(cfg, c2) == base)
    partner.foreach { c2 =>
      val hA = Dedup.docHashes("a", 1L, "c", contentA)
      val hB = Dedup.docHashes("b", 1L, "c", Synth.spansOf(cfg, c2))
      assert(hA.render_hash_nodigits === hB.render_hash_nodigits)
      assert(hA.content_hash !== hB.content_hash)
    }
  }
}
