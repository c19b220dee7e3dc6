package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is pure `Column` expressions (whole-stage-codegen
  * friendly, no UDFs): at 100 TB these run inside the scan projection
  * with zero extra shuffles.
  */
object TextAnalysis {

  /** Whitespace tokens (empty input → empty array, not [""]). */
  def tokensWs(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def nTokensWs(c: Column): Column = size(tokensWs(c))

  /** BPE-ish pre-tokenization: letter runs, digit runs, single
    * punctuation marks — the shape GPT-style byte-pair encoders split
    * on before merges. */
  val finePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def tokensFine(c: Column): Column = regexp_extract_all(c, lit(finePattern), lit(0))
  def nTokensFine(c: Column): Column = size(tokensFine(c))

  /** Count of tokens present in a fixed wordset (lower-cased). */
  def wordsetHits(c: Column, words: Seq[String]): Column =
    size(filter(tokensWs(lower(c)), t => t.isin(words.map(lit(_)): _*)))

  val stopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "by")
  val stopwordsDe = Seq("der", "die", "das", "und", "oder", "zu", "in",
    "ist", "mit", "auf", "von", "ein", "eine")
  val stopwordsFr = Seq("le", "la", "les", "et", "ou", "de", "un", "une",
    "est", "dans", "pour", "sur", "avec")
  val stopwordsEs = Seq("el", "la", "los", "las", "y", "o", "de", "un",
    "una", "es", "en", "para", "con")

  /** Quality features per document — length / punctuation / stopword
    * ratios (the classic Gopher/C4-style filters). All ratios are
    * double divisions of exact integer counts. */
  def qualityFeatures(df: DataFrame, text: String): DataFrame = {
    val c = col(text)
    val nChars = length(c)
    val nTok = nTokensWs(c)
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        when(nTok > 0, (nChars - (nTok - 1)).cast("double") / nTok).otherwise(0.0))
      .withColumn("punct_ratio",
        when(nChars > 0, size(regexp_extract_all(c, lit("[^a-zA-Z0-9\\s]"), lit(0)))
          .cast("double") / nChars).otherwise(0.0))
      .withColumn("digit_ratio",
        when(nChars > 0, size(regexp_extract_all(c, lit("[0-9]"), lit(0)))
          .cast("double") / nChars).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nTok > 0, wordsetHits(c, stopwordsEn).cast("double") / nTok)
          .otherwise(0.0))
  }

  /** Scalar quality score in [0, 1]: penalize too-short/too-long docs,
    * punctuation soup, and stopword-free (= unnatural) text. */
  def qualityScore(df: DataFrame, text: String): DataFrame =
    qualityFeatures(df, text).withColumn("quality_score",
      (when(col("n_tokens").between(5, 100000), 0.4).otherwise(0.0)
        + when(col("punct_ratio") < 0.2, 0.3).otherwise(0.0)
        + when(col("stopword_ratio") > 0.01, 0.3).otherwise(0.0)))

  /** N-gram-heuristic language ID by stopword votes; ties broken by
    * the fixed precedence en > de > es > fr (strict > comparisons in
    * that order). */
  def langId(c: Column): Column = {
    val en = wordsetHits(c, stopwordsEn)
    val de = wordsetHits(c, stopwordsDe)
    val es = wordsetHits(c, stopwordsEs)
    val fr = wordsetHits(c, stopwordsFr)
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Corpus vocabulary statistics: per term, total occurrences (tf)
    * and document frequency (df) — the inputs to stopword discovery,
    * idf weighting, and tokenizer-vocabulary decisions. One explode +
    * one hash agg; at 100 TB this is the canonical word-count shape. */
  def vocabulary(df: DataFrame, id: String, text: String): DataFrame =
    graft.ops.Kernels.ensureParallelism(df)
      .select(col(id), explode(tokensWs(normalize(col(text)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), count_distinct(col(id)).as("df"))

  /** Canonical text form for fingerprint/dedup: lower-case, collapse
    * whitespace runs, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text — the dedup key
    * (hash-groupBy shuffles 16 bytes per doc instead of the text). */
  def fingerprintMd5(c: Column): Column = md5(normalize(c))

  /** Inverted term index: one `(term, doc, tf)` posting per distinct
    * doc-term — the scale-out generalization of the reference's ILIKE
    * substring search (`users.js:50-53`, gate p5): at 100 TB an ILIKE
    * is a full corpus scan per query; a term index answers from
    * postings proportional to the RESULT. Partition/bucket by term in
    * a real deployment so a query term is one partition probe. */
  def termIndex(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), explode(tokensWs(normalize(col(text)))).as("term"))
      .groupBy(col("term"), col(id))
      .agg(count(lit(1)).as("tf"))

  /** POSITIONAL inverted index: [[termIndex]] plus the sorted 0-based
    * token offsets of each term in its doc — the posting shape phrase
    * queries need ([[searchPhrase]]); Lucene's positions option, as a
    * DataFrame. Same build shape as [[termIndex]] (one tokenize pass,
    * one groupBy on (term, doc)); postings grow by one int per
    * occurrence, which is why positions are OPT-IN on the stored
    * index ([[saveTermIndex]]'s `withPositions`) rather than always
    * paid. */
  def termIndexPositional(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id),
        posexplode(tokensWs(normalize(col(text)))).as(Seq("pos", "term")))
      .groupBy(col("term"), col(id))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** Conjunctive (all-terms) search over a term index: docs containing
    * EVERY query term, ranked by total term frequency (sum tf desc, id
    * asc). The classic posting-intersection: filter the index to the
    * query terms (`isin` — partition-prunable), require a full match
    * count per doc, rank. Query cost scales with the query terms'
    * posting lists, never the corpus. */
  def searchAllTerms(index: DataFrame, id: String,
                     terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty)
    val q = terms.map(_.toLowerCase).distinct
    graft.ops.Kernels.topKPerKeyAgg(
      index.filter(col("term").isin(q: _*))
        .groupBy(col(id))
        .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("score"))
        .filter(col("n_terms") === q.length)
        .withColumn("__k", lit(1)),
      Seq("__k"), Seq(col("score"), -col(id)), k)
      .drop("__k")
  }

  /** Per-doc token length over the SAME normalization as
    * [[termIndex]] — the `dl` side of [[searchBm25]]. */
  def docLengths(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id),
      nTokensWs(normalize(col(text))).cast("long").as("dl"))

  /** BM25-ranked disjunctive search over a term index — the standard
    * relevance ranking on top of [[termIndex]] (Robertson–Spärck
    * Jones, the Lucene-default non-negative idf form):
    *
    *   score(d) = Σ_t ln(1 + (N − df_t + ½)/(df_t + ½)) ·
    *              tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Docs containing ANY query term are scored; global top-k by
    * (score desc, id asc).
    *
    * Scale shape: postings filtered to the query terms
    * (partition-prunable isin), per-term df a |terms|-row broadcast,
    * corpus stats (N, avgdl) a 1-row broadcast; the only big-side
    * work is one hash join from query-term postings to `docLengths`.
    * Parity/exactness: per-term scores round to 8 decimals then sum
    * in exact DECIMAL, so the per-doc total — and therefore the
    * RANKING — is shuffle-order-independent (the repo's float-gate
    * convention); constants are combined in-engine (`k1 + 1`) so both
    * engines evaluate the identical IEEE expression tree. */
  def searchBm25(index: DataFrame, docLengths: DataFrame, id: String,
                 terms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val q = terms.map(_.toLowerCase).distinct
    val postings = index.filter(col("term").isin(q: _*))
    val stats = docLengths.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("dl").cast("double")).as("__avgdl"))
    // one posting per (term, doc) ⇒ count ≡ document frequency
    val dfs = postings.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfc = col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("__avgdl")))
    val scored = postings
      .join(broadcast(dfs), "term")
      .join(docLengths, Seq(id))
      .crossJoin(broadcast(stats))
      .withColumn("__s", round(idf * tfc, 8).cast("decimal(28,8)"))
    graft.ops.Kernels.topKPerKeyAgg(
      scored.groupBy(col(id))
        .agg(count(lit(1)).as("n_terms"), sum(col("__s")).as("__sum"))
        .withColumn("__k", lit(1)),
      Seq("__k"), Seq(col("__sum"), -col(id)), k)
      .withColumn("score", round(col("__sum").cast("double"), 6))
      .drop("__k", "__sum")
  }

  /** EXACT-PHRASE search over a POSITIONAL index
    * ([[termIndexPositional]] / [[saveTermIndex]] with
    * `withPositions = true`): docs containing the words of `phrase`
    * consecutively, ranked by occurrence count (n_matches desc, id
    * asc, top k). The scale generalization of the degenerate 1-term
    * ILIKE page (reference `users.js:51`, gate p5) to multi-word
    * exact phrases — the corpus-forensics query next to d9's span
    * detection.
    *
    * Position-adjacency intersection, fully relational: ordinal i of
    * the phrase joins its term's postings (the ordinal table is a
    * |phrase|-row broadcast), every occurrence position p contributes
    * candidate start p − i, and a start position held by ALL
    * |phrase| ordinals is a match (`countDistinct(ord)` — repeated
    * words carry distinct ordinals, so "window window" needs two
    * DISTINCT shifted hits, not one posting counted twice).
    * Overlapping occurrences each count (every valid start is its
    * own row).
    *
    * Scale shape: postings are pre-filtered to the phrase's terms —
    * through [[loadTermPostings]] that is ≤ |distinct terms| bucket
    * directories (partition pruning, PlanQualitySpec pin) — so the
    * intersection's input ∝ the phrase terms' position lists, never
    * the corpus; the heavy op is one hash aggregate on
    * (doc, start). */
  def searchPhrase(index: DataFrame, id: String,
                   phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty)
    val spark = index.sparkSession
    import spark.implicits._
    val words = phrase.map(_.toLowerCase)
    val ords = words.zipWithIndex.toDF("term", "__ord")
    val starts = index.join(broadcast(ords), "term")
      .select(col(id), col("__ord"), explode(col("positions")).as("__pos"))
      .withColumn("__start", col("__pos") - col("__ord"))
      .filter(col("__start") >= 0)
    val matches = starts.groupBy(col(id), col("__start"))
      .agg(countDistinct(col("__ord")).as("__n"))
      .filter(col("__n") === words.length)
    graft.ops.Kernels.topKPerKeyAgg(
      matches.groupBy(col(id))
        .agg(count(lit(1)).as("n_matches"))
        .withColumn("__k", lit(1)),
      Seq("__k"), Seq(col("n_matches"), -col(id)), k)
      .drop("__k")
  }

  /** Persist a [[termIndex]] (plus the [[docLengths]] BM25 needs)
    * BUCKETED BY TERM, under an [[IndexIo]] `_latest` snapshot:
    *
    *   - postings land in `term_bucket=H/` directories
    *     (`pmod(xxhash64(term), nBuckets)` — bounded directory count
    *     at any vocabulary size, the [[graft.catalog.Layout]]
    *     discipline), sorted by (term, id) within files so one term's
    *     postings are contiguous and row-group stats prune within the
    *     bucket;
    *   - a query for K terms reads AT MOST K bucket directories
    *     (Catalyst partition pruning on the `term_bucket` filter
    *     [[loadTermPostings]] derives — `PartitionFilters` in the
    *     plan, pinned by PlanQualitySpec), postings ∝ the query
    *     terms' lists, never the corpus;
    *   - the snapshot flip makes refresh atomic: readers of the
    *     previous index version are never broken mid-rebuild.
    *
    * SINGLE WRITER, many readers — the IndexIo contract. */
  def saveTermIndex(docs: DataFrame, id: String, text: String,
                    root: String, nBuckets: Int = 64,
                    withPositions: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val snap = IndexIo.newSnap()
    val dir = s"$root/$snap"
    val idx = if (withPositions) termIndexPositional(docs, id, text)
              else termIndex(docs, id, text)
    idx
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(nBuckets)))
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"), col(id))
      .write.partitionBy("term_bucket").parquet(s"$dir/postings")
    docLengths(docs, id, text).write.parquet(s"$dir/doclen")
    IndexIo.writeMeta(spark, dir,
      Seq("kind" -> "terms", "nBuckets" -> nBuckets.toString, "id" -> id,
        "positions" -> withPositions.toString))
    IndexIo.flip(spark, root, snap)
  }

  /** True when `root` holds a committed term-index snapshot. */
  def termIndexExists(spark: org.apache.spark.sql.SparkSession,
                      root: String): Boolean =
    IndexIo.currentSnap(spark, root).isDefined

  /** INCREMENTAL INDEX APPEND — fold a batch of NEW documents into a
    * [[saveTermIndex]] index in O(batch): the batch is tokenized and
    * written as its own chain link (a snapshot directory holding only
    * the batch's bucketed postings + doc lengths, with a `prev`
    * pointer to the superseded snapshot), then the `_latest` flip
    * publishes it atomically — the corpus is never re-tokenized, and
    * readers of the previous version are never broken. Queries walk
    * the chain and union the per-link partition-pruned reads, so a
    * K-term search still opens ≤ K bucket dirs PER LINK; BM25's
    * corpus stats (N, avgdl, df) recompute over the union, so
    * rankings are exactly the from-scratch index's. Run
    * [[compactTermIndex]] when the chain grows long (it bounds the
    * per-query link factor), and [[vacuumTermIndex]] — never
    * IndexIo's generic vacuum, which would sever the chain — to
    * reclaim superseded snapshots. Appends are NEW docs only (dedup
    * upstream — the d12 admission loop); re-appending an id double
    * counts it, same contract as [[graft.pipeline.LshIndex.append]]. */
  def appendTermIndex(docs: DataFrame, id: String, text: String,
                      root: String): Unit = {
    val spark = docs.sparkSession
    val prev = IndexIo.currentSnap(spark, root).getOrElse(
      throw new IllegalStateException(
        s"appendTermIndex: no index at $root; saveTermIndex first"))
    val meta = IndexIo.readMeta(spark, s"$root/$prev")
    require(meta.get("kind").contains("terms"), s"not a term index: $root")
    require(meta("id") == id,
      s"appendTermIndex: index id column is ${meta("id")}, got $id")
    val n = meta("nBuckets").toInt
    // the batch link must match the chain's posting schema — a
    // positional index stays positional across appends
    val withPos = meta.get("positions").contains("true")
    val snap = IndexIo.newSnap()
    val dir = s"$root/$snap"
    val idx = if (withPos) termIndexPositional(docs, id, text)
              else termIndex(docs, id, text)
    idx
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(n)))
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"), col(id))
      .write.partitionBy("term_bucket").parquet(s"$dir/postings")
    docLengths(docs, id, text).write.parquet(s"$dir/doclen")
    IndexIo.writeMeta(spark, dir,
      Seq("kind" -> "terms", "nBuckets" -> n.toString, "id" -> id,
        "positions" -> withPos.toString, "prev" -> prev))
    IndexIo.flip(spark, root, snap)
  }

  /** The live snapshot chain, newest first — one link per
    * [[appendTermIndex]] since the last [[saveTermIndex]] /
    * [[compactTermIndex]]. */
  private def termChain(spark: org.apache.spark.sql.SparkSession,
                        root: String): Seq[String] = {
    val head = IndexIo.currentSnap(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(s"$root/_latest"))
    Iterator.iterate(Option(head))(s =>
        s.flatMap(x => IndexIo.readMeta(spark, s"$root/$x").get("prev")))
      .takeWhile(_.isDefined).map(_.get).toSeq
  }

  /** Fold the snapshot CHAIN into one full snapshot (no `prev`) and
    * flip — one pass over the INDEX rows (tf longs, never the corpus
    * text), restoring the one-link read path after a run of nightly
    * appends. Readers on the old chain finish undisturbed;
    * [[vacuumTermIndex]] reclaims it after the grace period. Returns
    * the number of links folded. */
  def compactTermIndex(spark: org.apache.spark.sql.SparkSession,
                       root: String): Int = {
    val links = termChain(spark, root)
    if (links.size <= 1) return 0
    val meta = IndexIo.readMeta(spark, s"$root/${links.head}")
    val n = meta("nBuckets").toInt
    val id = meta("id")
    val snap = IndexIo.newSnap()
    val dir = s"$root/$snap"
    links.map(l => spark.read
        .option("basePath", s"$root/$l/postings")
        .parquet(s"$root/$l/postings"))
      .reduce(_ unionByName _)
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"), col(id))
      .write.partitionBy("term_bucket").parquet(s"$dir/postings")
    links.map(l => spark.read.parquet(s"$root/$l/doclen"))
      .reduce(_ unionByName _)
      .write.parquet(s"$dir/doclen")
    IndexIo.writeMeta(spark, dir,
      Seq("kind" -> "terms", "nBuckets" -> n.toString, "id" -> id,
        "positions" -> meta.getOrElse("positions", "false")))
    IndexIo.flip(spark, root, snap)
    links.size
  }

  /** Reclaim snapshots not reachable from the live chain — the
    * chain-aware replacement for IndexIo's generic vacuum (which
    * keeps only the current snapshot and would sever `prev` links).
    * Writer-side, after the reader grace period. */
  def vacuumTermIndex(spark: org.apache.spark.sql.SparkSession,
                      root: String): Int = {
    val keep = termChain(spark, root).toSet
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count { st =>
      val name = st.getPath.getName
      val stale = st.isDirectory && name.startsWith("snap_") &&
        !keep.contains(name)
      if (stale) fs.delete(st.getPath, true)
      stale
    }
  }

  /** Query-term postings from a [[saveTermIndex]] index: the scan is
    * pruned to the ≤ |terms| bucket directories the query terms hash
    * into BEFORE any file is listed (partition pruning), then to the
    * exact terms. Feed the result straight to [[searchAllTerms]] /
    * [[searchBm25]]. */
  def loadTermPostings(spark: org.apache.spark.sql.SparkSession,
                       root: String, terms: Seq[String]): DataFrame = {
    val links = termChain(spark, root)
    val meta = IndexIo.readMeta(spark, s"$root/${links.head}")
    val n = meta("nBuckets").toInt
    val q = terms.map(_.toLowerCase).distinct
    // the terms' bucket ids, via the engine's own xxhash64 (one
    // driver-local job over |terms| rows — planning-time metadata)
    import spark.implicits._
    val buckets = q.toDS()
      .select(pmod(xxhash64(col("value")), lit(n)))
      .collect().map(_.getLong(0)).distinct.toSeq
    // one pruned read per chain link (≤ K bucket dirs each), unioned —
    // partition pruning applies per relation; compactTermIndex bounds
    // the link count
    links.map(l => spark.read
        .option("basePath", s"$root/$l/postings")
        .parquet(s"$root/$l/postings")
        .filter(col("term_bucket").isin(buckets: _*) &&
          col("term").isin(q: _*)))
      .reduce(_ unionByName _)
  }

  /** The stored [[docLengths]] side of a [[saveTermIndex]] index —
    * the whole chain's union. */
  def loadDocLengths(spark: org.apache.spark.sql.SparkSession,
                     root: String): DataFrame =
    termChain(spark, root)
      .map(l => spark.read.parquet(s"$root/$l/doclen"))
      .reduce(_ unionByName _)

  /** TF-IDF weights per (term, doc) posting — [[searchBm25]]'s classic
    * sibling, the feature-weighting primitive (document vectors,
    * keyword extraction, stop-term discovery): idf = ln(N/df) (raw
    * form; df ≥ 1 on a real index so always finite), weight = tf·idf.
    *
    * Scale shape: per-term df is one agg over the postings, the
    * corpus size a 1-row broadcast; output cost ∝ index size, all
    * joins equi on `term`. Emits (term, id, tf, df, tfidf). */
  def tfIdf(df: DataFrame, id: String, text: String): DataFrame = {
    val idx = termIndex(df, id, text)
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    val dfs = idx.groupBy(col("term")).agg(count(lit(1)).as("df"))
    idx.join(dfs, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf").cast("double") * log(col("__n") / col("df")))
      .drop("__n")
  }

  /** Deterministic train/val/test assignment by md5 prefix of the
    * (salted) id: reproducible across engines, runs, and cluster
    * layouts, and STABLE UNDER CORPUS GROWTH — a doc's split never
    * changes when other docs are added/removed, unlike
    * `randomSplit`/`sample` whose assignment depends on partitioning.
    * Pure projection: no shuffle, no RNG state, codegen'd md5.
    *
    * Fractions map to 16-bit thresholds on the first 4 hex chars
    * (lexicographic compare ≡ numeric on the prefix; granularity
    * 1/65536). The LAST entry absorbs the remainder, so fractions
    * should sum to ~1. Change `salt` to re-roll every assignment. */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                fracs: Seq[(String, Double)]): DataFrame = {
    require(fracs.nonEmpty && fracs.forall(_._2 >= 0))
    val h = substring(md5(concat(lit(salt + "|"),
      col(idCol).cast("string"))), 1, 4)
    val thresholds = splitThresholds(fracs.map(_._2))
    val split = fracs.init.zip(thresholds)
      .foldRight(lit(fracs.last._1)) { case (((name, _), th), rest) =>
        when(h < lit(th), name).otherwise(rest)
      }
    df.withColumn("split", split)
  }

  /** Hex thresholds for [[hashSplit]]'s oracle mirror. */
  private[graft] def splitThresholds(fracs: Seq[Double]): Seq[String] =
    fracs.scanLeft(0.0)(_ + _).tail.init.map(f =>
      f"${math.min(65535, math.floor(f * 65536).toLong)}%04x")

  /** EXACT-QUOTA stratified selection — keep at most `quota` rows per
    * stratum ("no more than N docs from any one domain/source"), the
    * hard-cap complement of [[weightedMix]]'s fractional mixing.
    * Deterministic where `df.stat.sampleBy` is probabilistic and
    * quota-less: rows rank within their stratum by the salted md5 of
    * their id ([[hashSplit]]'s engine-portable ordering device; ties
    * broken by the id itself, so the order is total) and the first
    * `quota` survive. Same salt + same corpus ⇒ the same selection on
    * any engine, any cluster layout, any run.
    *
    * Scale shape: one shuffle on the stratum key + a per-stratum sort
    * ([[graft.ops.Kernels.topKPerKey]]) — no global sort, no driver
    * state; a pathologically hot stratum is one sorted partition, the
    * same bound every per-key window in the engine carries. */
  def stratifiedSample(df: DataFrame, stratum: String, idCol: String,
                       salt: String, quota: Int): DataFrame = {
    require(quota >= 1, "stratifiedSample: quota must be >= 1")
    val h = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    graft.ops.Kernels.topKPerKeyAgg(
        df.withColumn("__rank_h", h), Seq(stratum),
        Seq(col("__rank_h"), col(idCol)), quota)
      .drop("__rank_h")
  }

  /** WEIGHTED sampling without replacement (Efraimidis & Spirakis,
    * IPL 2006 — the A-Res order-statistic form): each row draws
    * u ∈ [0,1) deterministically from its integer id via TWO
    * independent Knuth multiplicative hashes mod distinct primes,
    * composed positionally (h₁·m₂ + h₂ over m₁·m₂ ≈ 10¹²) — pure
    * BIGINT arithmetic, engine-portable, no RNG state, mod-first so
    * no product overflows at any id scale, and every intermediate
    * below 2⁵³ so the double conversion is EXACT on any engine. A
    * single small-prime draw has only ~10⁶ distinct u values — at
    * corpus scale, ids congruent mod the prime share a u and the
    * equal-weight ties among them resolve by id order, a systematic
    * bias; the composed draw collides only for ids congruent mod
    * BOTH primes (~10¹² period). Scores u^(1/w); the k HIGHEST
    * scores are a weighted random sample without replacement, each
    * row's inclusion probability proportional to its weight. The
    * quality-weighted selection shape ("sample docs ∝ quality
    * score") that [[stratifiedSample]]'s uniform per-stratum quota
    * can't express.
    *
    * One scan + one global top-k (TakeOrderedAndProject — k rows per
    * partition then k at the driver, never a full sort); rows with
    * non-positive weight are excluded by definition. Ties broken by
    * id, so the selection is total-ordered and reproducible on any
    * engine and any cluster layout. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: Long = 0L): DataFrame = {
    require(k >= 1, "weightedSample: k must be >= 1")
    val (m1, m2) = (1000003L, 999983L) // distinct primes
    def h(m: Long, mult: Long): Column = // ((id%m)*mult)%m == (id*mult)%m
      pmod(pmod(col(idCol).cast("long") + salt, lit(m)) * mult, lit(m))
    val u = (h(m1, 2654435761L) * m2 + h(m2, 2246822519L)).cast("double") /
      (m1 * m2).toDouble
    val score = pow(u, lit(1.0) / col(weightCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__ws", score)
      .orderBy(col("__ws").desc, col(idCol))
      .limit(k)
      .drop("__ws")
  }

  /** Intra-document repetition metrics (Gopher/RefinedWeb-style
    * filters): token bigrams and how many are duplicates of an earlier
    * bigram in the SAME document. Pure per-row array expressions — no
    * explode, no shuffle; the corpus never leaves its scan partitions.
    * Counts are exact integers (callers derive ratios; emitting the
    * raw counts avoids cross-engine rounding traps on terminating
    * fractions). */
  def bigrams(c: Column): Column = {
    val t = tokensWs(normalize(c))
    // greatest(0, …) guards token-less docs (slice rejects length -1)
    val len = greatest(lit(0), size(t) - 1)
    zip_with(slice(t, lit(1), len), slice(t, lit(2), len),
      (a, b) => concat(a, lit(" "), b))
  }

  /** (n_bigrams, n_dup_bigrams) as two columns via a struct. */
  def repetitionCounts(c: Column): Column = {
    val g = bigrams(c)
    struct(size(g).as("n_bigrams"),
      (size(g) - size(array_distinct(g))).as("n_dup_bigrams"))
  }

  /** Corpus-trained bigram language-model score — the perplexity
    * quality filter every large-scale pipeline runs (CCNet/Gopher
    * style: docs whose token transitions are unlikely under a model
    * of the corpus itself are boilerplate/garbled/outliers). Trains
    * add-k smoothed bigram probabilities ON the corpus in the same
    * plan and scores each doc:
    *
    *   nll(d) = Σ_{(w1,w2) ∈ d} −ln (c(w1 w2) + k) / (c(w1 ·) + k·V)
    *
    * Output: (id, n_bigrams, nll) — callers derive perplexity as
    * exp(nll / n_bigrams); docs with no bigram drop out (no defined
    * score). Filter by nll/n_bigrams percentile to cut the tail.
    *
    * Scale shape: the classic LM-training job — two distributed count
    * aggs (bigram and context, both map-side combined), hash joins
    * from the exploded corpus back to its counts on those keys, a
    * 1-row broadcast for V, one per-doc reduce. No driver state at
    * any corpus size. Parity: ln is libm-dependent (JVM vs DuckDB can
    * differ by an ulp), so each term is quantized to 6 decimals before
    * the exact DECIMAL sum (measured: an 8-decimal grid caught one ln
    * boundary hit in 1.25M evals at sf0.1; 6 decimals gives 100× the
    * margin). The total surfaces as a plain DECIMAL→DOUBLE cast — a
    * further double-domain round would sit exactly ON the quantized
    * sum's half-grid and re-diverge (measured, 3 of 5000 docs). */
  def lmScore(df: DataFrame, id: String, text: String,
              k: Double = 0.5): DataFrame = {
    require(k > 0, "add-k smoothing requires k > 0")
    val bg = df.select(col(id), explode(bigrams(col(text))).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val cBg = bg.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val cCtx = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = df.select(
        explode(tokensWs(normalize(col(text)))).as("__tok"))
      .agg(countDistinct(col("__tok")).cast("double").as("__v"))
    bg.join(cBg, "bg").join(cCtx, "w1").crossJoin(broadcast(vocab))
      .withColumn("__s", round(-log((col("c12") + lit(k)) /
        (col("c1") + lit(k) * col("__v"))), 6).cast("decimal(28,6)"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__s")).cast("double").as("nll"))
  }

  /** Weighted source mixing for training-data composition: keep each
    * row with its source's probability, decided by the same salted
    * md5-prefix draw as [[hashSplit]] — deterministic, engine-portable,
    * stable under corpus growth, and a pure filter (no shuffle, no RNG
    * state). Sources absent from `weights` are dropped (weight 0);
    * weight ≥ 1 keeps everything. */
  def mixSources(df: DataFrame, idCol: String, sourceCol: String,
                 salt: String, weights: Seq[(String, Double)]): DataFrame = {
    require(weights.forall(_._2 >= 0))
    val h = substring(md5(concat(lit(salt + "|"),
      col(idCol).cast("string"))), 1, 4)
    val keep = weights.foldRight(lit(false)) { case ((src, w), rest) =>
      when(col(sourceCol) === src,
        if (w >= 1.0) lit(true)
        else h < lit(f"${math.floor(w * 65536).toLong}%04x")).otherwise(rest)
    }
    df.filter(keep)
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\d{3}[-. ]\\d{3}[-. ]\\d{4}"

  /** PII scrubbing: replace email addresses and NANP-style phone
    * numbers with typed placeholder tokens. Patterns stay in the
    * regex subset Java and RE2 interpret identically (character
    * classes + bounded repetition — no backreferences, no lookaround)
    * so the behavior is portable across engines. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, emailRe, "[EMAIL]"),
      phoneRe, "[PHONE]")

  /** Count of email matches (pre-redaction audit metric). */
  def nEmails(c: Column): Column =
    size(regexp_extract_all(c, lit(emailRe), lit(0)))

  /** Karp-Rabin rolling hash over the normalized characters —
    * polynomial accumulate mod 1e9+7, exact in integer arithmetic. */
  def rollingHash(c: Column): Column =
    aggregate(
      transform(split(normalize(c), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  /** GPT-style sequence packing: documents concatenated in `idCol`
    * order and chunked into fixed `budget`-token packs — each doc's
    * pack is `floor(exclusive-prefix-tokens / budget)` (a doc
    * straddling a boundary spans packs, as concat-then-chunk training
    * pipelines do). Adds `offset` (global exclusive token prefix) and
    * `pack_id`.
    *
    * The global prefix sum is a DISTRIBUTED two-level scan, never a
    * single-partition window over the corpus: docs shard by
    * `idCol div shardSpan`; the in-shard exclusive cumsum is a window
    * per shard; shard base offsets come from one tiny window over the
    * per-shard totals (idRange/shardSpan rows — one small task) and
    * broadcast-join back. Pick shardSpan so shard count stays ≪ corpus
    * (e.g. 10⁶ shards of 10⁵ docs at 10¹¹ docs) and in-shard rows fit
    * a task — both bounds are loose.
    *
    * Requires NON-NEGATIVE ids (and ids/offsets < 2⁵³, far beyond any
    * real corpus): the floor-division shard/pack expressions match
    * DuckDB's `//` on that domain. */
  // Column ops, not a string-spliced expr(): survives column names
  // needing backticks, and floor(/) gives floor semantics explicitly
  // (`div` truncates toward zero — same thing only for ids ≥ 0).
  private def floorDiv(c: Column, d: Long): Column =
    floor(c.cast("long") / lit(d.toDouble)).cast("long")

  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
                    budget: Long, shardSpan: Long = 100000L,
                    extraKeys: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && shardSpan > 0)
    // `extraKeys` makes each key group (e.g. a train/val/test split)
    // its own independent token stream, still in ONE pass: the in-
    // shard window partitions on (keys, shard), the bases window on
    // the keys alone — shard count per key group stays the tiny side.
    val keyCols = extraKeys.map(col)
    val sharded = df.withColumn("__shard", floorDiv(col(idCol), shardSpan))
    val wIn = Window.partitionBy((keyCols :+ col("__shard")): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sharded.withColumn("__local",
      coalesce(sum(col(nTokCol)).over(wIn), lit(0L)))
    val wBase = Window.partitionBy(keyCols: _*).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = sharded.groupBy((keyCols :+ col("__shard")): _*)
      .agg(sum(col(nTokCol)).as("__tot"))
      .withColumn("__base", coalesce(sum(col("__tot")).over(wBase), lit(0L)))
      .select((keyCols :+ col("__shard") :+ col("__base")): _*)
    local.join(broadcast(bases), extraKeys :+ "__shard")
      .withColumn("offset", col("__base") + col("__local"))
      .withColumn("pack_id", floorDiv(col("offset"), budget))
      .drop("__shard", "__local", "__base")
  }

  /** Straddle-SPLIT packing — what a concat-then-chunk training
    * pipeline actually emits: one row per (doc, pack) SLICE with
    * `pack_id`, `slice_start` (token offset WITHIN the doc), and
    * `slice_len`. A doc fully inside one pack yields its single
    * full-length slice; a doc straddling k boundaries yields k+1
    * slices that tile it exactly (Σ slice_len = n_tok per doc, every
    * pack's slices sum to `budget` except the corpus tail). Zero-token
    * docs keep one empty slice so no doc vanishes from the output.
    * [[packSequences]] remains the whole-doc assignment
    * (pack = floor(offset/budget)).
    *
    * Scale shape: [[packSequences]]'s distributed two-level scan plus
    * one explode — ≤ 1 + n_tok/budget rows per doc, proportional to
    * the output itself; a pure projection, no extra shuffle. */
  def packSequencesSliced(df: DataFrame, idCol: String, nTokCol: String,
                          budget: Long, shardSpan: Long = 100000L,
                          extraKeys: Seq[String] = Nil): DataFrame = {
    val base = packSequences(df, idCol, nTokCol, budget, shardSpan, extraKeys)
      .drop("pack_id")
    val n = col(nTokCol).cast("long")
    val b = lit(budget)
    // packs touched: floor(offset/budget) .. floor((offset+n-1)/budget);
    // greatest(n,1) keeps the sequence non-empty for zero-token docs
    val lastTok = col("offset") + greatest(n, lit(1L)) - lit(1L)
    base
      .withColumn("pack_id", explode(sequence(
        floorDiv(col("offset"), budget), floorDiv(lastTok, budget))))
      .withColumn("slice_start",
        greatest(lit(0L), col("pack_id") * b - col("offset")))
      .withColumn("slice_len",
        least(col("offset") + n, (col("pack_id") + lit(1L)) * b) -
          greatest(col("offset"), col("pack_id") * b))
  }

  /** OVERLAPPING CHUNKING — the RAG/embedding emission shape: each doc
    * becomes windows of `chunkTokens` whitespace tokens advancing by
    * `chunkTokens − overlapTokens` (so consecutive chunks share
    * `overlapTokens`). One projection + one explode, rows ∝ output —
    * like [[packSequencesSliced]] it never shuffles, so at 100 TB it
    * runs inside the scan stage and the only cost is the output
    * itself. Zero-token docs emit nothing; starts stop at
    * `n − overlap`, so the final (possibly short) chunk always covers
    * the tail and a chunk fully contained in its predecessor is never
    * emitted. Output: (id, chunk_idx, n_chunk_tokens, chunk_text),
    * chunk_idx dense from 0. */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
                   chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 &&
      overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunk, got chunk=$chunkTokens overlap=$overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = tokensWs(col(textCol))
    df.withColumn("__toks", toks)
      .filter(size(col("__toks")) > 0)
      .withColumn("__start", explode(sequence(
        lit(0),
        greatest(size(col("__toks")) - overlapTokens - 1, lit(0)),
        lit(stride))))
      .select(col(idCol),
        (col("__start") / stride).cast("long").as("chunk_idx"),
        least(lit(chunkTokens), size(col("__toks")) - col("__start"))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1,
          lit(chunkTokens)), " ").as("chunk_text"))
  }
}
