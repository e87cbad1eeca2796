package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** BPE tokenizer TRAINING and ENCODING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"; the
  * word-dict formulation every production trainer uses — HF
  * tokenizers' BpeTrainer operates on exactly this bounded
  * word-frequency dictionary, not the raw corpus).
  *
  * Spark-first split of the algorithm:
  *  - the corpus-scale part is ONE bounded-output shuffle: word
  *    counts → top-[[DictSize]] dict by (count DESC, word). Zipf's
  *    law makes the bounded dict cover the overwhelming token mass,
  *    and determinism of the tie order makes training reproducible
  *    on any cluster;
  *  - the merge LOOP is driver-side over the ≤[[DictSize]]-row dict —
  *    O(dict · merges) on metadata, never on the corpus (io11's
  *    driver-stats contract);
  *  - corpus ENCODING is map-side with the learned ranks broadcast
  *    ([[encodeCorpus]]); the merge-until-fixpoint loop has no
  *    Catalyst expression equivalent, so this is a declared
  *    mapPartitions kernel like the media codecs.
  *
  * Round 1 of training is additionally CROSS-ENGINE gated as
  * `bpe1_pair_counts` (TextAnalysis): the first merge's pair
  * statistics are plain SQL over 2-char substrings, and the spec pins
  * trainer-round-1 == gate-rank-1.
  */
object Bpe {

  /** Bounded training dictionary size. */
  val DictSize = 4096

  /** Words shorter than 2 chars carry no pairs; they are excluded
    * BEFORE the top-K cut so they never occupy dict slots (the gate
    * and the trainer must apply the same rule or their dicts drift —
    * spec-pinned). */
  val MinWordLen = 2

  /** Corpus-scale phase: the bounded word-frequency dict, ordered
    * deterministically by (count DESC, word). */
  def dictFromCorpus(spark: SparkSession, sfDir: String): Seq[(String, Long)] =
    Tables.load(spark, sfDir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) >= MinWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(DictSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Initial symbol split: CODE POINTS, not UTF-16 code units —
    * Spark's substring/length and DuckDB's substr/len (the bpe1 gate's
    * pair enumeration) both count code points, so a supplementary-
    * plane character (an emoji) must be ONE trainer symbol or the
    * spec-pinned trainer-round-1 == gate-rank-1 equivalence breaks,
    * and a code-unit split would emit unpaired-surrogate "tokens"
    * (r12 review finding). */
  private[graft] def symbols(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One left-to-right merge pass: every non-overlapping occurrence
    * of (a, b) becomes a+b. Left-to-right non-overlap is the
    * published semantics ("aaa" under (a,a) → ["aa", "a"]). */
  private[graft] def applyMerge(syms: Vector[String],
                                a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `nMerges` merges on a word-frequency dict. Each round
    * counts adjacent symbol pairs weighted by word frequency and
    * merges the argmax, ties broken by (left, right) — fully
    * deterministic. Returns the ordered merge list and the final
    * per-word segmentations (the training-time tokenization, used by
    * the spec to pin encode ≡ train). */
  def train(dict: Seq[(String, Long)], nMerges: Int)
      : (Vector[(String, String)], Map[String, Vector[String]]) = {
    var words: Vector[(String, Vector[String], Long)] = dict.toVector
      .map { case (w, n) => (w, symbols(w), n) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (_, syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), _) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b))
        words = words.map { case (w, syms, n) => (w, applyMerge(syms, a, b), n) }
        round += 1
      }
    }
    (merges.result(), words.map { case (w, syms, _) => w -> syms }.toMap)
  }

  /** Encode one word with a learned merge list: repeatedly apply the
    * LOWEST-RANK applicable merge until none applies (the standard
    * rank-priority encoder). For any word — in the dict or not — this
    * reproduces the segmentation training itself would have produced,
    * because merges are replayed in exactly training order. */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = symbols(word)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val (a, b) = (syms(bi), syms(bi + 1))
        syms = applyMerge(syms, a, b)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Map-side corpus encoding: per-doc BPE token count under the
    * learned merges (ranks broadcast; the per-word loop is the
    * declared mapPartitions kernel). 1-char words count 1 token. */
  def encodeCorpus(spark: SparkSession, sfDir: String,
                   ranks: Map[(String, String), Int]): DataFrame = {
    val bc = spark.sparkContext.broadcast(ranks)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    import spark.implicits._
    docs.as[(Long, String)].mapPartitions { it =>
      val r = bc.value
      it.map { case (id, text) =>
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
        val n = words.map(w => encode(w, r).length.toLong).sum
        (id, n)
      }
    }.toDF("doc_id", "n_bpe_tokens")
  }
}
