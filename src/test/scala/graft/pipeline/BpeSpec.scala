package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fixture merge table IS the trainer's output on the sf0.001 corpus — no drift") {
    // the t26/t27 gates (and their DuckDB oracles) replay
    // Bpe.fixtureMerges; this pin proves the fixture's provenance:
    // re-training deterministically reproduces it, so the fixture can
    // never silently diverge from the trainer
    val docs = graft.catalog.Tables.load(spark, sf, "documents")
    val trained = Bpe.train(docs, "text", numMerges = 24)
    assert(trained == Bpe.fixtureMerges,
      s"trained=$trained\nfixture=${Bpe.fixtureMerges}")
  }

  test("no merge token contains a space — the word/whole-text equivalence invariant") {
    // spaces must stay inert singleton tokens, or the oracle's
    // whole-text replay could merge across word boundaries where the
    // Spark side (per-word) cannot
    assert(Bpe.fixtureMerges.forall { case (a, b) =>
      !a.contains(" ") && !b.contains(" ") })
  }

  test("encodeWord: rank-order sweeps, left-to-right non-overlapping") {
    // chain through ranks: t+h, th+e
    val m = Vector(("t", "h"), ("th", "e"))
    assert(Bpe.encodeWord("the", m).toSeq == Seq("the"))
    assert(Bpe.encodeWord("thethe", m).toSeq == Seq("the", "the"))
    // non-overlap: aaa with (a,a) merges the FIRST pair only
    assert(Bpe.encodeWord("aaa", Vector(("a", "a"))).toSeq == Seq("aa", "a"))
    // a later-rank merge cannot resurrect an earlier pair
    assert(Bpe.encodeWord("ab", Vector(("b", "c"), ("a", "b"))).toSeq ==
      Seq("ab"))
    // fixture sanity on corpus words
    assert(Bpe.encodeWord("window", Bpe.fixtureMerges).toSeq == Seq("window"))
    assert(Bpe.encodeWord("sort", Bpe.fixtureMerges).toSeq == Seq("sort"))
    assert(Bpe.encodeWord("x", Bpe.fixtureMerges).toSeq == Seq("x"))
    assert(Bpe.encodeWord("", Bpe.fixtureMerges).isEmpty)
  }

  test("vocab + encodeIds: code-point-ordered base ids, merge outputs at base_count + rank, OOV = -1") {
    val docs = Seq((1L, "cab bad")).toDF("doc_id", "text")
    val m = Vector(("a", "b"))
    val v = Bpe.vocab(docs, "text", m)
      .as[(String, Long)].collect().toMap
    // alphabet {a,b,c,d} sorted → 0..3; merge output "ab" at 4
    assert(v == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "ab" -> 4L))
    assert(Bpe.encodeIds("cab", m, v).toSeq == Seq(2L, 4L))
    assert(Bpe.encodeIds("bad", m, v).toSeq == Seq(1L, 0L, 3L))
    // out-of-alphabet symbol surfaces as -1, never silently dropped
    assert(Bpe.encodeIds("ax", m, v).toSeq == Seq(0L, -1L))
  }

  test("save/load round-trip: a later session tokenizes identically without retraining") {
    val root = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/tok"
    Bpe.save(spark, Bpe.fixtureMerges, root)
    assert(Bpe.load(spark, root) == Bpe.fixtureMerges)
    // re-save (re-train) flips atomically; readers see the new table
    val v2 = Bpe.fixtureMerges.take(5)
    Bpe.save(spark, v2, root)
    assert(Bpe.load(spark, root) == v2)
    // the loaded table drives tokenCounts exactly like the original
    val docs = Seq((1L, "the window sort")).toDF("doc_id", "text")
    def counts(m: Vector[(String, String)]) =
      Bpe.tokenCounts(docs, "doc_id", "text", m)
        .as[(Long, Long, Long)].collect().toSeq
    assert(counts(Bpe.load(spark, root)) == counts(v2))
  }

  test("tokenCounts: n_bpe = per-word subwords + inter-word spaces; compresses vs chars") {
    val docs = Seq(
      (1L, "the window sort"),   // window+sort are single fixture tokens
      (2L, "  spaced   out  "),  // normalization collapses whitespace
      (3L, "zzz")                // no fixture merge applies → 3 chars
    ).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", Bpe.fixtureMerges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc 1: norm "the window sort" = 15 chars; words → [t,h,e] (no
    // t+h merge in the fixture... check) — compute expected via
    // encodeWord to stay honest
    def exp(text: String): (Long, Long) = {
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      val words = if (norm.isEmpty) Array.empty[String] else norm.split(" ")
      val n = words.map(w => Bpe.encodeWord(w, Bpe.fixtureMerges).length).sum +
        math.max(0, words.length - 1)
      (norm.length.toLong, n.toLong)
    }
    assert(got == Seq(1L, 2L, 3L).zip(
      Seq("the window sort", "  spaced   out  ", "zzz").map(exp))
      .map { case (id, (c, n)) => (id, c, n) })
    // subword counts actually compress: "window" is 1 token, not 6
    val w = got.find(_._1 == 1L).get
    assert(w._3 < w._2, s"BPE must compress doc 1: $w")
  }
}
