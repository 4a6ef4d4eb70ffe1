package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("train learns the hand-computed merge sequence with pinned ties") {
    // vocab: aaab ×2, aab ×1.
    // round 1: (a,a)=5 (2 per aaab ×2 + 1), (a,b)=3 → merge (a,a).
    //   aaab → (aa)(a)(b)  [greedy left-to-right], aab → (aa)(b)
    // round 2: (aa,a)=2, (a,b)=2, (aa,b)=1 → tie broken to lexicographically
    //   smallest pair: (a,b).
    // round 3: aaab → (aa)(ab); pairs: (aa,ab)=2, (aa,b)=1 → (aa,ab).
    val docs = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", merges = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("tokenCounts applies merges greedily left-to-right") {
    val docs = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val out = Bpe.tokenCounts(docs, "text", merges)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // aaab → (aaab): 1 token, ×2 words; aab → (aa)(b): 2 tokens.
    assert(out(1L) == ((2, 2)))
    assert(out(2L) == ((1, 2)))
  }

  test("train stops early when no pair remains") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // Only 2 possible merges exist: (a,b) then nothing ((ab) is one symbol).
    val merges = Bpe.train(docs, "text", merges = 5)
    assert(merges == Seq(("a", "b")))
  }

  test("trainBatched merges symbol-disjoint pairs in one round") {
    // round 1 pairs: (a,b)=3, (c,d)=2 — disjoint symbols, both selected,
    // in rank order. Round 2: single-symbol words, no pairs → stop.
    val docs = Seq((1L, "ab ab ab"), (2L, "cd cd")).toDF("doc_id", "text")
    val merges = Bpe.trainBatched(docs, "text", rounds = 5, window = 8, batchCap = 8)
    assert(merges == Seq(("a", "b"), ("c", "d")))
  }

  test("trainBatched defers pairs sharing a symbol with a higher rank") {
    // round 1: (a,b)=3 outranks (b,c)=2 and claims 'b' → (b,c) deferred.
    // round 2: vocab (ab), (b)(c) → only (b,c) remains.
    val docs = Seq((1L, "ab ab ab"), (2L, "bc bc")).toDF("doc_id", "text")
    val merges = Bpe.trainBatched(docs, "text", rounds = 5, window = 8, batchCap = 8)
    assert(merges == Seq(("a", "b"), ("b", "c")))
  }

  test("tokenStreams emits ordered per-doc token strings") {
    // Merges (a,b) then (ab,c): "abc abx" -> "abc|abx"... verify exact
    // boundaries: "abc" -> (ab)(c) -> (abc) one token; "abx" -> (ab)(x)
    // two tokens; punctuation collapses to a word break.
    val docs = Seq((1L, "Abc, abx!"), (2L, "zq"), (3L, "123 ...")).toDF("doc_id", "text")
    val out = Bpe.tokenStreams(docs, "text", Seq(("a", "b"), ("ab", "c")))
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2, 3, "abc ab|x")))
    assert(out(2L) == ((2L, 1, 2, "z|q")))
    assert(!out.contains(3L)) // no alphabetic words -> dropped
  }

  test("tokenStreams doc-level fold equals per-word tokenCounts") {
    val docs = Seq((1L, "the cat and the hat"), (2L, "band bandana ban")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", merges = 6)
    val streams = Bpe.tokenStreams(docs, "text", merges)
      .select("doc_id", "n_words", "n_bpe").as[(Long, Int, Int)].collect().toSet
    val counts = Bpe.tokenCounts(docs, "text", merges)
      .as[(Long, Int, Int)].collect().toSet
    assert(streams == counts)
  }

  test("vocab-join tokenCounts equals the per-occurrence fold path") {
    val docs = Seq((1L, "the cat and the hat sat"),
      (2L, "band bandana ban banana"), (3L, "Mixed CASE, with 123 digits!"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", merges = 8)
    val join = Bpe.tokenCounts(docs, "text", merges)
      .as[(Long, Int, Int)].collect().toSet
    val fold = Bpe.tokenCountsFold(docs, "text", merges)
      .as[(Long, Int, Int)].collect().toSet
    assert(join == fold)
  }

  test("chunked merge application equals the single-fold path across chunk boundaries") {
    // A merge table far past the chunk size: the real trained merges are
    // padded with inert pairs (symbols absent from the corpus — their
    // replaces are no-ops but still deepen the fold), so the chunked path
    // runs several localCheckpoint stages. Chunk sizes straddling the
    // table length (including chunk=1, every merge its own stage) must all
    // reproduce the plain fold bit-for-bit — the order of application is
    // the BPE semantics, and a chunk boundary must never reorder it.
    val docs = Seq((1L, "the cat and the hat sat"),
      (2L, "band bandana ban banana")).toDF("doc_id", "text")
    val real = Bpe.train(docs, "text", merges = 6)
    val padded = real ++ (0 until 40).map { i =>
      val t = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
      (s"zq$t", s"xj$t") // letter-only inert symbols, absent from the corpus
    }
    val fold = Bpe.tokenCountsFold(docs, "text", padded)
      .as[(Long, Int, Int)].collect().toSet
    for (chunk <- Seq(1, 7, 40, 1000)) {
      val chunked = Bpe.tokenCounts(docs, "text", padded, chunk = chunk)
        .as[(Long, Int, Int)].collect().toSet
      assert(chunked == fold, s"chunk=$chunk diverged")
    }
  }

  test("vocab-join tokenStreams equals the doc-level fold path exactly") {
    val docs = Seq((1L, "the cat and the hat sat on a mat"),
      (2L, "band bandana ban banana"), (3L, "... 42 ..."),
      (4L, "Repeat repeat REPEAT")).toDF("doc_id", "text")
    val merges = Bpe.trainBatched(docs, "text", rounds = 4, window = 16, batchCap = 6)
    val join = Bpe.tokenStreams(docs, "text", merges)
      .as[(Long, Int, Int, String)].collect().toSet
    val fold = Bpe.tokenStreamsFold(docs, "text", merges)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(join == fold)
  }

  test("trainBatched with batchCap=1 reduces to sequential train") {
    val docs = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val seq = Bpe.train(docs, "text", merges = 3)
    val bat = Bpe.trainBatched(docs, "text", rounds = 3, window = 8, batchCap = 1)
    assert(bat == seq)
  }
}
