package graft

import graft.embed.HashEmbedder
import graft.ingest.{IngestPipeline, PdfText}

/** The real-PDF extraction gate (reference O2/O3): the pure-JVM extractor
  * must produce non-blank, recognizable text from the reference's own
  * corpus, end-to-end through ingestBinaryDir.
  */
class PdfTextSpec extends SparkSpec {

  private val corpus = "/root/reference/pdf_datasets"
  private def pdf(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$corpus/$name"))

  test("extracts real text from every classic-xref PDF in the reference corpus") {
    val files = new java.io.File(corpus).listFiles().map(_.getName)
      .filter(_.endsWith(".pdf")).sorted
    assert(files.length == 8)
    files.foreach { f =>
      val text = PdfText.extract(pdf(f))
      info(f"$f%-60s -> ${text.length}%7d chars")
      assert(text.trim.nonEmpty, s"$f extracted blank")
      // real words, not glyph garbage: vowels present in ASCII letters
      val letters = text.count(_.isLetter)
      assert(letters > 100, s"$f produced too few letters (${letters})")
    }
  }

  test("extracted text is searchable English (the reference smoke-query terms)") {
    val faq = PdfText.extract(pdf("Airline_FAQ_generic.pdf")).toLowerCase
    assert(faq.contains("refund") || faq.contains("baggage") || faq.contains("flight"),
      s"FAQ text lacks domain terms: ${faq.take(300)}")
  }

  test("non-PDF and corrupt bytes yield empty string (exception->blank contract)") {
    assert(PdfText.extract(null) == "")
    assert(PdfText.extract(Array[Byte]()) == "")
    assert(PdfText.extract("plain text, not a pdf".getBytes) == "")
    val broken = pdf("Airline_FAQ_generic.pdf").take(5000).toArray
    PdfText.extract(broken) // must not throw; any output acceptable
  }

  test("fuzz: truncations and random mutations never throw") {
    val base = pdf("Skyline_Airways_policy_doc.pdf")
    // truncation at structural boundaries and arbitrary points
    Seq(16, 1024, base.length / 4, base.length / 2, base.length - 37).foreach { cut =>
      PdfText.extract(base.take(cut).toArray)
    }
    // seeded random byte flips (keeps the %PDF- header so parsing engages)
    val rng = new scala.util.Random(20260812L)
    (1 to 10).foreach { _ =>
      val mutated = base.clone()
      (1 to 200).foreach { _ =>
        mutated(8 + rng.nextInt(mutated.length - 8)) = rng.nextInt(256).toByte
      }
      PdfText.extract(mutated) // exception->"" contract: must never throw
    }
    // pure random garbage with a PDF header
    (1 to 5).foreach { _ =>
      val junk = new Array[Byte](50000)
      rng.nextBytes(junk)
      System.arraycopy("%PDF-1.7\n".getBytes, 0, junk, 0, 9)
      PdfText.extract(junk)
    }
  }

  test("end-to-end: real PDFs -> binaryFile scan -> extract -> chunk -> embed") {
    val out = IngestPipeline.ingestBinaryDir(spark, corpus, HashEmbedder(dim = 16))
    val perFile = out.groupBy("filename").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    info(s"chunks per file: $perFile")
    assert(perFile.size == 8, s"expected all 8 PDFs to yield chunks, got ${perFile.keys}")
    assert(perFile.values.forall(_ > 0))
    // chunk contract holds on real extracted text
    val sample = out.select("chunk").limit(200).collect().map(_.getString(0))
    assert(sample.forall(_.length <= 600))
  }
}
