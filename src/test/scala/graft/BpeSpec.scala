package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Bpe

/** BPE trainer/encoder invariants. The cross-engine gate
  * (bpe1_pair_counts) pins the corpus-scale phase; these specs pin
  * the driver-side merge loop against a HAND-DERIVED run of the
  * published example and the encoder against the trainer's own
  * segmentations.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  // Sennrich et al. 2016's worked dictionary. Hand derivation:
  //  round 1 pair totals: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7
  //    (n,e)=6 (e,w)=6 ... -> tie at 9, (e,s) < (s,t) -> merge (e,s)
  //  round 2: (es,t)=9 wins -> merge (es,t)
  //  round 3: (l,o)=7 ties (o,w)=7 -> (l,o) wins
  //  round 4: (lo,w)=7 wins
  private val classicDict = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("classic example: first four merges match the hand derivation") {
    val (merges, segs) = Bpe.train(classicDict, 4)
    assert(merges == Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"got $merges")
    assert(segs("low") == Vector("low"))
    assert(segs("lower") == Vector("low", "e", "r"))
    assert(segs("newest") == Vector("n", "e", "w", "est"))
    assert(segs("widest") == Vector("w", "i", "d", "est"))
  }

  test("training exhausts gracefully when no pairs remain") {
    val (merges, segs) = Bpe.train(Seq(("ab", 3L)), 10)
    assert(merges == Vector(("a", "b")))
    assert(segs("ab") == Vector("ab"))
  }

  test("applyMerge is left-to-right non-overlapping: aaa -> [aa, a]") {
    assert(Bpe.applyMerge(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(Bpe.applyMerge(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa"))
  }

  test("rank-priority encode reproduces the trainer's segmentations " +
    "(corpus dict, 50 merges)") {
    val dict = Bpe.dictFromCorpus(spark, sf)
    assert(dict.nonEmpty && dict.size <= Bpe.DictSize)
    assert(dict.forall(_._1.length >= Bpe.MinWordLen))
    val (merges, segs) = Bpe.train(dict, 50)
    assert(merges.length == 50, s"corpus exhausted at ${merges.length}")
    val ranks = merges.zipWithIndex.toMap
    dict.foreach { case (w, _) =>
      val enc = Bpe.encode(w, ranks)
      assert(enc == segs(w), s"'$w': encode $enc != train ${segs(w)}")
      // lossless: tokens concatenate back to the word
      assert(enc.mkString == w)
    }
    // merges can only reference symbols built by EARLIER merges —
    // the creation-order invariant the encoder's correctness rests on
    val built = collection.mutable.Set.empty[String]
    merges.foreach { case (a, b) =>
      def atomic(s: String) = s.length == 1 || built.contains(s)
      assert(atomic(a) && atomic(b), s"merge ($a,$b) uses unbuilt symbol")
      built += a + b
    }
  }

  test("supplementary-plane chars are single symbols (code points, " +
    "not UTF-16 units)") {
    // U+1F600 is a surrogate PAIR in UTF-16; the trainer must treat it
    // as one symbol like Spark's substring/length and DuckDB's
    // substr/len do, or trainer-round-1 diverges from the bpe1 gate
    // and encode emits unpaired-surrogate tokens
    val emoji = new String(Character.toChars(0x1F600))
    assert(Bpe.symbols(s"a${emoji}b") == Vector("a", emoji, "b"))
    // round-1 pair stats on an astral word match the code-point
    // 2-gram enumeration the gate uses
    val (merges, segs) = Bpe.train(Seq((s"a${emoji}b", 3L)), 1)
    assert(merges.head == ("a", emoji) || merges.head == (emoji, "b"))
    // the published tie-break is (count DESC, left, right): both pairs
    // have count 3, and "a" < emoji lexicographically
    assert(merges.head == ("a", emoji))
    assert(segs(s"a${emoji}b") == Vector(s"a$emoji", "b"))
    // encode round-trips losslessly through real code points
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encode(s"a${emoji}b", ranks).mkString == s"a${emoji}b")
  }

  test("gate rank-1 pair equals the trainer's first merge") {
    val top = SparkEntry.queries("bpe1_pair_counts")(spark, sf)
      .orderBy("rnk").collect()
    assert(top.length > 0 && top.head.getLong(0) == 1L)
    val gatePair = top.head.getString(1)
    val (merges, _) = Bpe.train(Bpe.dictFromCorpus(spark, sf), 1)
    val (a, b) = merges.head
    assert(a.length == 1 && b.length == 1,
      "first merge must be a char pair")
    assert(a + b == gatePair,
      s"trainer first merge $a+$b != gate rank-1 '$gatePair'")
    // weights strictly ordered by the declared (weight DESC, pair) key
    top.sliding(2).foreach { w =>
      if (w.length == 2) {
        val (w1, p1) = (w(0).getLong(2), w(0).getString(1))
        val (w2, p2) = (w(1).getLong(2), w(1).getString(1))
        assert(w1 > w2 || (w1 == w2 && p1 < p2), "rank order violated")
      }
    }
  }

  test("map-side corpus encoding equals a driver-side recomputation") {
    val dict = Bpe.dictFromCorpus(spark, sf)
    val ranks = Bpe.train(dict, 50)._1.zipWithIndex.toMap
    val got = Bpe.encodeCorpus(spark, sf, ranks).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = graft.engine.Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == raw.keySet)
    raw.foreach { case (id, text) =>
      val expect = text.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => Bpe.encode(w, ranks).length.toLong).sum
      assert(got(id) == expect, s"doc $id: ${got(id)} != $expect")
      // compression sanity: BPE tokens never exceed char count
      assert(got(id) <= text.length)
    }
  }
}
