package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope

/** Byte-pair-encoding subword tokenization (Sennrich/Haddow/Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016 — the tokenizer family behind GPT-2/LLaMA vocabularies), built
  * Spark-first:
  *
  *   - TRAINING runs on the WORD-FREQUENCY table, not the corpus: the
  *     distinct whitespace pretokens with counts (the standard
  *     Sennrich formulation). Per merge round that is one explode +
  *     one aggregation over the vocab frame — O(vocab), which for a
  *     100 TB web corpus is millions of rows against billions, and
  *     the corpus itself is read exactly once.
  *   - APPLICATION is one `mapPartitions` pass with the merge ranks
  *     broadcast — no shuffle at all; the merge table (a few 10k
  *     entries in real vocabularies) is the only state.
  *
  * Merges apply in RANK ORDER, each as one left-to-right
  * non-overlapping sweep. For a table produced by [[train]] this is
  * equivalent to the per-word lowest-rank-first iteration (a rank-r
  * pair's constituents exist before any rank>r merge runs, and a
  * merge output `a+b` is strictly longer than `a`, so a later sweep
  * never reintroduces an earlier pair) — and it is EXACTLY the
  * semantics of a chain of string `replace` calls over the
  * boundary-marked sequence form, which is what lets a plain-SQL
  * oracle replay tokenization (gate t26).
  */
object Bpe {

  /** The pinned merge table for the t26/t27 gates: [[train]] over the
    * sf0.001 documents corpus, 24 merges, minCount 2 — regenerated and
    * asserted equal by BpeSpec, so the fixture cannot drift from the
    * trainer. Pinning a trained table (rather than re-training per
    * gate run) keeps the gate SF-independent: the Spark side applies
    * THIS table and the DuckDB oracle replays THIS table, at any
    * scale factor. */
  val fixtureMerges: Vector[(String, String)] = Vector(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"))

  /** One training round's pair statistics need adjacent pairs; this
    * explodes (a, b) token pairs weighted by word frequency. */
  private def pairStats(vocab: DataFrame): DataFrame = {
    val idx = when(size(col("toks")) >= 2,
      sequence(lit(0), size(col("toks")) - 2))
      .otherwise(array().cast("array<int>"))
    vocab.select(col("freq"), explode(transform(idx, i =>
        struct(element_at(col("toks"), i + 1).as("a"),
          element_at(col("toks"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Merge (a, b) → a+b inside a token array, left-to-right
    * non-overlapping, as a codegen-friendly aggregate fold: the
    * accumulator's last element merges with the current token when
    * they spell the pair. (A merged token `a+b` can never equal `a`,
    * so a fold result never re-matches within the same pass —
    * identical semantics to the scan in [[encodeWord]].) */
  private def applyMerge(toks: Column, a: String, b: String): Column =
    aggregate(toks, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train a BPE merge table on a corpus: `numMerges` rounds of
    * most-frequent-adjacent-pair (ties broken lexicographically on
    * (a, b) — full determinism, any partitioning), stopping early
    * when the best pair's weighted count falls below `minCount`.
    * Returns merges in rank order. Each round collects exactly ONE
    * row (the winning pair) — the vocab itself never leaves the
    * executors; per-round `localCheckpoint` truncates the lineage the
    * same way dupClusters does (the fold expression would otherwise
    * nest once per round). */
  def train(docs: DataFrame, text: String, numMerges: Int,
            minCount: Long = 2): Vector[(String, String)] = {
    var vocab = docs
      .select(explode(TextAnalysis.tokensWs(
        TextAnalysis.normalize(col(text)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(filter(split(col("w"), ""), x => x =!= "").as("toks"),
        col("freq"))
      .localCheckpoint(true)
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = pairStats(vocab)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
        .collect()
      top.headOption.filter(_.getLong(2) >= minCount) match {
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val prev = vocab
          vocab = vocab.select(applyMerge(col("toks"), a, b).as("toks"),
            col("freq")).localCheckpoint(true)
          CacheScope.freeCheckpointBlocks(prev)
        case None => done = true
      }
      round += 1
    }
    CacheScope.freeCheckpointBlocks(vocab)
    merges.result()
  }

  /** Apply a merge table to one word (rank-order sweeps). Base tokens
    * are CODE POINTS, not UTF-16 chars — Java's empty-regex split
    * (the trainer's `split(w, "")`) and DuckDB's
    * `regexp_split_to_array(s, '')` both split at code-point
    * boundaries, so a per-char split would break surrogate pairs and
    * diverge on non-BMP text. */
  def encodeWord(word: String,
                 merges: Seq[(String, String)]): Array[String] = {
    var toks: Array[String] = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    merges.foreach { case (a, b) =>
      if (toks.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        }
        if (out.length < toks.length) toks = out.toArray
      }
    }
    toks
  }

  /** Distributed tokenization: `(id, n_chars_norm, n_bpe)` per doc —
    * `n_bpe` counts the merged subword tokens of every word PLUS the
    * single normalized spaces between words (spaces are inert
    * singleton tokens: no trained merge can contain one, which is the
    * invariant that keeps word-level application equal to whole-text
    * application). One broadcast + one mapPartitions pass, zero
    * shuffles; the pre-tokenization (normalize + whitespace split)
    * runs as Catalyst expressions so engine parity is exact. */
  def tokenCounts(docs: DataFrame, id: String, text: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(merges.toVector)
    // NULL text degrades to 0 tokens (coalesce) instead of a null Seq
    // that would NPE inside mapPartitions and fail the whole job —
    // matching the NULL-propagating pure-column gates' spirit of one
    // bad row never killing a 100 TB pass
    val txt = coalesce(col(text), lit(""))
    docs.select(col(id).cast("long"),
        length(TextAnalysis.normalize(txt)).cast("long"),
        TextAnalysis.tokensWs(TextAnalysis.normalize(txt)))
      .as[(Long, Long, Seq[String])]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (docId, nChars, words) =>
          val sub = words.iterator.map(w => encodeWord(w, m).length.toLong).sum
          val spaces = math.max(0, words.size - 1).toLong
          (docId, nChars, sub + spaces)
        }
      }
      .toDF(id, "n_chars_norm", "n_bpe")
  }

  /** VOCABULARY induced by a merge table over a corpus — the
    * `(token, id)` table a training pipeline feeds its embedding
    * layer: base symbols are the distinct CODE POINTS of the
    * normalized corpus words (space excluded — it is the inert
    * pretoken separator, never a symbol), ids assigned in code-point
    * sort order; each merge's output symbol follows at
    * `base_count + rank`. Fully deterministic given (corpus, merges),
    * on any partitioning. The global sort is ALPHABET-bounded (code
    * points, not words — thousands at the most even for a 100 TB
    * multilingual corpus), so the single-partition window is safe by
    * construction; ids are symbol ids, positional per merge rank (two
    * merges may alias textually in a hand-built table; a TRAINED
    * table's outputs are distinct). */
  def vocab(docs: DataFrame, text: String,
            merges: Seq[(String, String)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val base = docs
      .select(explode(TextAnalysis.tokensWs(
        TextAnalysis.normalize(col(text)))).as("w"))
      .select(explode(filter(split(col("w"), ""), x => x =!= ""))
        .as("token"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.orderBy("token")
    val baseIds = base
      .withColumn("id", row_number().over(w).cast("long") - 1)
    val nBase = base.count() // alphabet-bounded
    val mergeIds = merges.zipWithIndex
      .map { case ((a, b), r) => (a + b, nBase + r) }.toDF("token", "id")
    baseIds.unionByName(mergeIds)
  }

  /** Encode one word to vocabulary ids: [[encodeWord]] then the
    * broadcastable token→id map from [[vocab]]. Unknown symbols
    * (a token outside the training alphabet) map to -1 — surface
    * them rather than silently dropping, so the caller chooses its
    * own OOV policy (byte fallback, UNK id, filter). */
  def encodeIds(word: String, merges: Seq[(String, String)],
                vocabIds: Map[String, Long]): Array[Long] =
    encodeWord(word, merges).map(t => vocabIds.getOrElse(t, -1L))

  /** Persist a merge table so later sessions tokenize WITHOUT
    * retraining — training reads the corpus once, ever; the artifact
    * is a tiny `(rank, a, b)` parquet under a fresh `snap_*` with an
    * atomic `_latest` flip ([[IndexIo]] — the same single-writer /
    * many-readers copy-on-write contract as the ANN indexes, so a
    * re-train never breaks in-flight tokenizer readers). */
  def save(spark: org.apache.spark.sql.SparkSession,
           merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    val snap = IndexIo.newSnap()
    val dir = s"$path/$snap"
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    IndexIo.writeMeta(spark, dir, Seq(
      "kind" -> "bpe", "n_merges" -> merges.size.toString))
    IndexIo.flip(spark, path, snap)
  }

  /** Load the current merge table (rank order). The collect is
    * bounded by the merge-table size — a few 10k rows in real
    * vocabularies, broadcast to executors by [[tokenCounts]] anyway. */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): Vector[(String, String)] = {
    val snap = IndexIo.currentSnap(spark, path).getOrElse(
      throw new IllegalStateException(s"no _latest pointer under $path"))
    spark.read.parquet(s"$path/$snap/merges")
      .orderBy("rank").select("a", "b")
      .collect().map(r => (r.getString(0), r.getString(1))).toVector
  }

  /** The DuckDB replay of [[tokenCounts]] for a FIXED merge table —
    * the oracle side of gate t26. Representation: every token is
    * boundary-marked `\x01 token \x02`, so (1) a merge pattern
    * `\x01a\x02\x01b\x02` can only match whole adjacent tokens (never
    * a token suffix/prefix), and (2) adjacent matches share no
    * characters, so ONE `replace` pass merges all non-overlapping
    * occurrences left-to-right — exactly [[encodeWord]]'s sweep. The
    * final token count is the number of `\x01` markers. Precondition:
    * the corpus text must not contain the marker bytes \x01/\x02
    * themselves (the harness corpus is printable ASCII; the Spark
    * side is marker-free, so only the ORACLE needs this). */
  def oracleTokenCountSql(normExpr: String,
                          merges: Seq[(String, String)]): String = {
    // merge tokens are interpolated into SQL literals: escape quotes,
    // and refuse marker bytes outright (a merge containing \x01/\x02
    // would break the boundary-marked representation itself)
    // ... and refuse spaces: a space is the INERT separator the
    // per-word (Spark) / whole-text (oracle) equivalence depends on --
    // a hand-built merge containing one would merge across word
    // boundaries here while encodeWord never sees a space, a silent
    // engine divergence (trained tables can't contain one: the
    // trainer's pretokens are whitespace-split)
    require(merges.forall { case (a, b) =>
      !s"$a$b".exists(c => c == '\u0001' || c == '\u0002' || c == ' ') },
      "merge tokens must not contain spaces or the \\x01/\\x02 boundary markers")
    def tok(t: String) = s"chr(1)||'${t.replace("'", "''")}'||chr(2)"
    val seq0 = "array_to_string(list_transform(" +
      s"regexp_split_to_array($normExpr, ''), x -> chr(1)||x||chr(2)), '')"
    val replayed = merges.foldLeft(seq0) { case (acc, (a, b)) =>
      s"replace($acc, ${tok(a)}||${tok(b)}, ${tok(a + b)})"
    }
    // empty-norm guard: regexp_split_to_array('', '') returns ['']
    // (one spurious empty token) where tokenCounts counts 0
    s"CAST(CASE WHEN $normExpr = '' THEN 0 ELSE " +
      s"length($replayed) - length(replace($replayed, chr(1), '')) " +
      "END AS BIGINT)"
  }
}
