package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the `documents` table — the pieces a
  * large-scale training-data pipeline runs before dedup/filtering:
  * token statistics, quality scoring, language ID, fingerprinting.
  *
  * All operators are embarrassingly parallel per-document projections
  * (no shuffle except the final presentation ORDER BY, which exists only
  * for the oracle hash-compare; a production pipeline would write
  * unordered). Everything stays inside whole-stage codegen — regex and
  * string built-ins only, no UDFs.
  *
  * The reference has no text surface (SURVEY.md §2.9: zero UDFs), so this
  * tier is net-new capability mandated by the build plan (SURVEY.md §7.2
  * step 9).
  */
object TextQueries {

  /** Word tokens: ASCII alnum runs — the same regex class evaluates
    * identically under Java regex (Spark) and RE2 (DuckDB). */
  private val TokenPattern = "[A-Za-z0-9]+"

  // ---------------------------------------------------------------- t01
  /** Per-document token statistics: token count (regex word runs),
    * whitespace-split count, distinct tokens, type-token ratio, mean token
    * length. Pure projection — at 100 TB this is a single map stage.
    */
  def t01DocStats(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("toks", expr(s"regexp_extract_all(text, '$TokenPattern', 0)"))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .withColumn("n_ws_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_distinct_tokens", size(array_distinct(col("toks"))).cast(LongType))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_ws_tokens"),
        col("n_distinct_tokens"),
        // floor(x*1e4 + 0.5)/1e4 instead of round(): Spark rounds via the
        // decimal string (HALF_UP) while DuckDB scales in binary, so exact
        // .5 boundaries can disagree by 1 ulp of the last digit; the
        // explicit floor formula is the same IEEE op sequence in both
        (floor(col("n_distinct_tokens").cast(DoubleType) / nullif(col("n_tokens"), lit(0L)) * 10000.0 + 0.5) / 10000.0).as("ttr"),
        (floor(length(col("text")).cast(DoubleType) / nullif(col("n_tokens"), lit(0L)) * 10000.0 + 0.5) / 10000.0).as("chars_per_token"))
      .orderBy(col("doc_id"))

  val t01Sql: String =
    s"""SELECT doc_id, n_tokens, n_ws_tokens, n_distinct_tokens,
       |  FLOOR(CAST(n_distinct_tokens AS DOUBLE) / NULLIF(n_tokens, 0) * 10000.0 + 0.5) / 10000.0 AS ttr,
       |  FLOOR(CAST(n_chars2 AS DOUBLE) / NULLIF(n_tokens, 0) * 10000.0 + 0.5) / 10000.0 AS chars_per_token
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '$TokenPattern')) AS BIGINT) AS n_tokens,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |    CAST(len(list_distinct(regexp_extract_all(text, '$TokenPattern'))) AS BIGINT) AS n_distinct_tokens,
       |    LENGTH(text) AS n_chars2
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t02
  /** Heuristic language ID: count stopword markers per candidate language,
    * argmax with a fixed precedence for ties. Deterministic; emitted as a
    * (predicted, labeled) confusion matrix. On real corpora the marker sets
    * widen to n-gram profiles — the plan shape (pure projection + tiny agg)
    * is unchanged.
    */
  private val markers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|of|and|to|a|in)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "fr" -> "\\b(le|la|et|les|est)\\b",
    "es" -> "\\b(el|los|las|y|es)\\b")

  def t02LangId(s: SparkSession, dir: String): DataFrame = {
    val df0 = Tables.spread(Tables.documents(s, dir))
    // Spark SQL string literals interpret backslash escapes ('\b' would be a
    // backspace), DuckDB's do not — double them for the Spark side only.
    val withHits = markers.foldLeft(df0) { case (df, (langName, pat)) =>
      val sparkPat = pat.replace("\\", "\\\\")
      df.withColumn(s"hits_$langName", expr(s"size(regexp_extract_all(lower(text), '$sparkPat', 0))"))
    }
    val best = markers.map { case (l, _) => col(s"hits_$l") }
    val anyHit = best.reduce(_ + _) > 0
    val predicted = when(!anyHit, lit("unknown"))
      .otherwise(
        markers.foldRight(lit("unknown"): Column) { case ((l, _), acc) =>
          when(markers.filter(_._1 != l).map(o => col(s"hits_$l") >= col(s"hits_${o._1}"))
            .reduce(_ && _), lit(l)).otherwise(acc)
        })
    withHits
      .withColumn("predicted_lang", predicted)
      .groupBy(col("predicted_lang"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("predicted_lang"), col("lang"))
  }

  val t02Sql: String = {
    val hitCols = markers.map { case (l, pat) =>
      s"len(regexp_extract_all(lower(text), '$pat')) AS hits_$l"
    }.mkString(",\n    ")
    val caseArms = markers.map { case (l, _) =>
      val conds = markers.filter(_._1 != l).map(o => s"hits_$l >= hits_${o._1}").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n      ")
    s"""WITH h AS (
       |  SELECT lang,
       |    $hitCols
       |  FROM documents),
       |p AS (
       |  SELECT lang,
       |    CASE WHEN hits_en + hits_de + hits_fr + hits_es = 0 THEN 'unknown'
       |      $caseArms
       |      ELSE 'unknown' END AS predicted_lang
       |  FROM h)
       |SELECT predicted_lang, lang, COUNT(*) AS n
       |FROM p GROUP BY predicted_lang, lang ORDER BY predicted_lang, lang""".stripMargin
  }

  // ---------------------------------------------------------------- t03
  /** Quality scoring: length score, stopword ratio, chars-per-token band —
    * the standard cheap filters before expensive dedup. Fixed double-op
    * sequence so both engines produce identical bits; per-doc output (no
    * double-sum aggregation).
    */
  def t03QualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("n_tokens", expr(s"size(regexp_extract_all(text, '$TokenPattern', 0))").cast(DoubleType))
      .withColumn("n_stop", expr("size(regexp_extract_all(lower(text), '\\\\b(the|of|and|to|a|in|is)\\\\b', 0))").cast(DoubleType))
      .withColumn("len_score", least(lit(1.0), length(col("text")).cast(DoubleType) / lit(500.0)))
      .withColumn("stop_ratio", col("n_stop") / nullif(col("n_tokens"), lit(0.0)))
      .withColumn("cpt", length(col("text")).cast(DoubleType) / nullif(col("n_tokens"), lit(0.0)))
      // NOTE: no ROUND here — both engines compute this identical IEEE op
      // sequence on identical inputs, so raw doubles are bit-equal, while
      // ROUND at a half-way boundary (e.g. 0.78175) disagrees between
      // Spark (decimal-string HALF_UP) and DuckDB (binary scaling).
      .withColumn("quality",
        col("len_score") * 0.5 +
          least(lit(1.0), col("stop_ratio") * 5.0) * 0.3 +
          when(col("cpt") >= 3.0 && col("cpt") <= 12.0, lit(1.0)).otherwise(lit(0.0)) * 0.2)
      .select(col("doc_id"), col("quality"), col("stop_ratio"), col("len_score"))
      .orderBy(col("doc_id"))

  val t03Sql: String =
    s"""SELECT doc_id, len_score * 0.5 + LEAST(1.0, stop_ratio * 5.0) * 0.3 +
       |    (CASE WHEN cpt >= 3.0 AND cpt <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2 AS quality,
       |  stop_ratio,
       |  len_score
       |FROM (
       |  SELECT doc_id,
       |    LEAST(1.0, CAST(LENGTH(text) AS DOUBLE) / 500.0) AS len_score,
       |    CAST(len(regexp_extract_all(lower(text), '\\b(the|of|and|to|a|in|is)\\b')) AS DOUBLE)
       |      / NULLIF(CAST(len(regexp_extract_all(text, '$TokenPattern')) AS DOUBLE), 0.0) AS stop_ratio,
       |    CAST(LENGTH(text) AS DOUBLE)
       |      / NULLIF(CAST(len(regexp_extract_all(text, '$TokenPattern')) AS DOUBLE), 0.0) AS cpt
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t04
  /** Document fingerprinting: canonical form (lowercase, punctuation
    * stripped, whitespace collapsed) hashed to a compact hex id — content-
    * addressable dedup key, join-able across snapshots. md5 keeps the
    * oracle cross-engine; production would use xxhash64 (cheaper, see
    * [[DedupQueries]]).
    */
  def t04Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("canon",
        Tables.canonText(col("text")))
      .select(
        col("doc_id"),
        substring(md5(col("canon")), 1, 16).as("fingerprint"),
        length(col("canon")).as("canon_len"))
      .orderBy(col("doc_id"))

  val t04Sql: String =
    """SELECT doc_id, SUBSTRING(md5(canon), 1, 16) AS fingerprint,
      |  CAST(LENGTH(canon) AS INT) AS canon_len
      |FROM (
      |  SELECT doc_id,
      |    TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS canon
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t05
  /** BPE-style pre-tokenization count: the GPT-2-ish splitter pattern
    * (contractions, space-prefixed letter runs, digit runs, punctuation
    * runs, whitespace) — the token-budget estimator a data pipeline runs
    * before the real tokenizer. Pattern kept lookahead-free so Java regex
    * (Spark) and RE2 (DuckDB) agree.
    */
  private val BpePattern =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** Contraction apostrophes need dialect-specific literal escaping. */
  private def sqlQuoteDuck(p: String): String = p.replace("'", "''")

  def t05BpeTokens(s: SparkSession, dir: String): DataFrame = {
    val sparkPat = BpePattern.replace("\\", "\\\\").replace("'", "\\'")
    Tables.spread(Tables.documents(s, dir))
      .withColumn("pieces", expr(s"regexp_extract_all(text, '$sparkPat', 0)"))
      .withColumn("n_pieces", size(col("pieces")).cast(LongType))
      // regex whitespace test, not trim(p) = '': trim strips only ASCII
      // spaces, so newline/tab pieces from the \s+ alternative would be
      // miscounted as real tokens
      .withColumn("n_ws", expr("size(filter(pieces, p -> p rlike '^\\\\s+$'))").cast(LongType))
      .select(
        col("doc_id"),
        col("n_pieces"),
        (col("n_pieces") - col("n_ws")).as("n_tokens_est"),
        col("n_chars"),
        (col("n_chars").cast(DoubleType) / nullif(col("n_pieces") - col("n_ws"), lit(0L))).as("chars_per_bpe_token"))
      .orderBy(col("doc_id"))
  }

  val t05Sql: String =
    s"""SELECT doc_id, n_pieces, n_pieces - n_ws AS n_tokens_est, n_chars,
       |  CAST(n_chars AS DOUBLE) / NULLIF(n_pieces - n_ws, 0) AS chars_per_bpe_token
       |FROM (
       |  SELECT doc_id, n_chars,
       |    CAST(len(regexp_extract_all(text, '${sqlQuoteDuck(BpePattern)}')) AS BIGINT) AS n_pieces,
       |    CAST(len(list_filter(regexp_extract_all(text, '${sqlQuoteDuck(BpePattern)}'), p -> regexp_matches(p, '^\\s+$$'))) AS BIGINT) AS n_ws
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t06
  /** Within-document repetition signals — the Gopher-style quality filter
    * that catches boilerplate and degenerate generations: the fraction of
    * duplicated word bigrams and the share claimed by the single most
    * frequent bigram, plus the pass/fail verdict at the dup <= 0.3
    * threshold.
    *
    * Shape at 100 TB: explode to (doc, bigram), count per (doc, bigram),
    * re-aggregate per doc — both shuffles key on doc_id(+bigram), so the
    * work is perfectly data-parallel and AQE-coalesced; no global state.
    * (A mapPartitions per-doc hash map would save the shuffle but lose
    * codegen and spill handling; declarative wins until profiling says
    * otherwise.)
    */
  def t06Repetition(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.spread(Tables.documents(s, dir))
      .withColumn("toks", expr(s"regexp_extract_all(text, '$TokenPattern', 0)"))
      .withColumn("bg", expr(
        """if(size(toks) >= 2,
          |   transform(sequence(1, size(toks) - 1),
          |     i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))),
          |   cast(array() as array<string>))""".stripMargin))
      .select(col("doc_id"), explode_outer(col("bg")).as("bigram"))
    val perGram = grams.groupBy(col("doc_id"), col("bigram"))
      .agg(count(col("bigram")).as("c"))
    perGram.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_bigrams"),
        count(col("bigram")).as("n_distinct"),
        max(col("c")).as("top_count"))
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (floor((lit(1.0) - col("n_distinct").cast(DoubleType) /
          nullif(col("n_bigrams"), lit(0L))) * 10000.0 + 0.5) / 10000.0).as("dup_2gram_frac"),
        (floor(col("top_count").cast(DoubleType) /
          nullif(col("n_bigrams"), lit(0L)) * 10000.0 + 0.5) / 10000.0).as("top_2gram_frac"))
      .withColumn("passes_repetition_filter",
        coalesce(col("dup_2gram_frac") <= 0.3, lit(true)))
      .orderBy(col("doc_id"))
  }

  val t06Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
      |  FROM toks, unnest(generate_series(1, GREATEST(len(t) - 1, 0))) AS u(i)),
      |per_gram AS (
      |  SELECT doc_id, bigram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
      |per_doc AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |    COUNT(*) AS n_distinct, MAX(c) AS top_count
      |  FROM per_gram GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(p.n_bigrams, 0) AS n_bigrams,
      |  FLOOR((1.0 - CAST(n_distinct AS DOUBLE) / NULLIF(n_bigrams, 0)) * 10000.0 + 0.5) / 10000.0 AS dup_2gram_frac,
      |  FLOOR(CAST(top_count AS DOUBLE) / NULLIF(n_bigrams, 0) * 10000.0 + 0.5) / 10000.0 AS top_2gram_frac,
      |  COALESCE(FLOOR((1.0 - CAST(n_distinct AS DOUBLE) / NULLIF(n_bigrams, 0)) * 10000.0 + 0.5) / 10000.0 <= 0.3, TRUE)
      |    AS passes_repetition_filter
      |FROM (SELECT DISTINCT doc_id FROM documents) d
      |LEFT JOIN per_doc p ON d.doc_id = p.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- t07
  /** Corpus heavy hitters, sketch-audited: the exact top-10 tokens by
    * frequency (count desc, token asc — deterministic under ties), each
    * row carrying a `cms_ok` contract bit that the Count-Min-Sketch
    * estimate honored its published guarantee (overestimate-only, within
    * eps·N with confidence 1-delta).
    *
    * The sketch is built with `df.stat.countMinSketch` — a distributed
    * merge of per-partition CMS tables (width eps=0.1%, depth from
    * delta=1%), constant memory per executor regardless of cardinality.
    * At 100 TB the exact top-k shown here is itself fine (two-stage hash
    * agg on token), but the CMS answers point frequency queries WITHOUT
    * the token-keyed shuffle — that's the operator being certified. The
    * oracle computes the exact list in DuckDB with a literal-TRUE
    * contract column, so a sketch accuracy violation fails the hash
    * compare (same pattern as d04's est_ok).
    */
  def t07HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val eps = 0.001
    val toks = Tables.spread(Tables.documents(s, dir))
      .select(explode(expr(s"regexp_extract_all(text, '$TokenPattern', 0)")).as("tok"))
      .cache()
    val total = toks.count()
    val cms = toks.stat.countMinSketch("tok", eps, 0.99, 42)
    val cmsB = s.sparkContext.broadcast(cms)
    val bound = (eps * total).toLong
    val cmsOk = udf((tok: String, n: Long) => {
      val est = cmsB.value.estimateCount(tok)
      est >= n && est <= n + bound
    })
    toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(10)
      .withColumn("cms_ok", cmsOk(col("tok"), col("n")))
      .orderBy(col("n").desc, col("tok"))
  }

  val t07Sql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok FROM documents)
      |SELECT tok, COUNT(*) AS n, TRUE AS cms_ok
      |FROM toks GROUP BY tok ORDER BY n DESC, tok LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- t08
  /** Benchmark decontamination — the pipeline stage that keeps eval sets
    * out of training data: every training document is scored by its
    * 3-gram shingle overlap against the eval corpus (here: the
    * deterministic doc_id % 100 == 0 slice stands in for the benchmark
    * suite) and flagged when the overlap fraction crosses 0.2.
    *
    * Scale shape: the eval side is tiny by construction (benchmarks are
    * KBs–MBs against a 100 TB corpus), so its distinct shingle set
    * BROADCASTS and contamination scoring is a map-side semi-join over
    * the training corpus's exploded shingles — one aggregation shuffle
    * keyed by doc_id, no corpus-vs-corpus join. Shares the d03/d04
    * shingle builder, so "overlap" means the same thing across the
    * dedup and decontamination tiers.
    */
  def t08Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .withColumn("toks", split(Tables.canonText(col("text")), " "))
      .withColumn("sh_arr", expr(DedupQueries.shingleArrExpr))
      .select(col("doc_id"), col("sh_arr"), size(col("sh_arr")).as("n_sh"))
    val isEval = col("doc_id") % 100 === 0
    val evalSh = docs.filter(isEval)
      .select(explode(col("sh_arr")).as("shingle")).distinct()
    val train = docs.filter(!isEval)
    val overlap = train
      .select(col("doc_id"), explode(col("sh_arr")).as("shingle"))
      .join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    train.select(col("doc_id"), col("n_sh"))
      .join(overlap, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (floor(coalesce(col("n_overlap"), lit(0L)).cast(DoubleType) * 10000.0 /
          nullif(col("n_sh"), lit(0)) + 0.5) / 10000.0).as("overlap_frac"))
      .withColumn("contaminated", coalesce(col("overlap_frac") >= 0.2, lit(false)))
      .orderBy(col("doc_id"))
  }

  val t08Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
      |  FROM docs, unnest(generate_series(1, GREATEST(len(toks) - 2, 0))) AS u(i)),
      |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0),
      |ov AS (
      |  SELECT s.doc_id, COUNT(*) AS n_overlap
      |  FROM sh s JOIN eval_sh e USING (shingle)
      |  WHERE s.doc_id % 100 <> 0 GROUP BY s.doc_id)
      |SELECT d.doc_id,
      |  COALESCE(n_overlap, 0) AS n_overlap,
      |  FLOOR(COALESCE(n_overlap, 0) * 10000.0 / NULLIF(n_sh, 0) + 0.5) / 10000.0 AS overlap_frac,
      |  COALESCE(FLOOR(COALESCE(n_overlap, 0) * 10000.0 / NULLIF(n_sh, 0) + 0.5) / 10000.0 >= 0.2, FALSE)
      |    AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 100 <> 0) d
      |LEFT JOIN counts USING (doc_id)
      |LEFT JOIN ov USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t09
  /** BM25 ranked retrieval — keyword search over the corpus, the lookup
    * side of a data-curation workbench ("show me the docs about X").
    * Standard Robertson/Sparck-Jones BM25 (k1=1.2, b=0.75) for a fixed
    * query term set, top-20 by score with doc_id tiebreak.
    *
    * Fully declarative one-plan formulation: corpus stats (N, avgdl) are
    * 1-row aggregates cross-joined in (broadcast — no collect), document
    * frequencies and term frequencies are two hash aggregations over the
    * term-filtered token stream. The term filter lands BEFORE the
    * exploded-token aggregation, so the shuffle carries only
    * query-matching tokens — at 100 TB with a 3-term query that is a
    * vanishing fraction of the corpus. Scores are rounded to 4 decimals
    * through the shared floor pattern for cross-engine determinism.
    */
  def t09Bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "table", "query")
    val (k1, b) = (1.2, 0.75)
    val toks = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), explode(split(Tables.canonText(col("text")), " ")).as("tok"))
      .cache()
    toks.count() // eager: dl and tf branches both read it (see d04's note)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    tf.join(dfreq, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg((floor(sum(col("contrib")) * 10000.0 + 0.5) / 10000.0).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  val t09Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      |corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      |  WHERE tok IN ('spark', 'table', 'query') GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, COUNT(*) AS dfreq FROM tf GROUP BY tok)
      |SELECT doc_id,
      |  FLOOR(SUM(
      |    ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0) * tf * 2.2 /
      |      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      |  ) * 10000.0 + 0.5) / 10000.0 AS bm25
      |FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN corpus
      |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- t10
  /** Bigram language-model scoring — the classic LM-based quality /
    * perplexity filter (the heaviest text signal a pretraining pipeline
    * computes that is still pure SQL): train an add-one-smoothed bigram
    * model ON the corpus itself, then score every document by its average
    * negative log-likelihood under that model. High avg_nll = the
    * document's word transitions are rare in the corpus (outlier / noisy
    * text); low = templated/repetitive text.
    *
    *   P(w2 | w1) = (c'(w1 w2) + 1) / (c(w1 ·) + V)
    *   avg_nll(doc) = mean over the doc's bigram INSTANCES of -ln P
    *
    * where c' is the COUNT-PRUNED bigram table: types seen < 3 times score
    * as unseen (c' = 0) and the add-one smoothing absorbs them — the
    * standard count-cutoff every corpus-scale LM applies, and what keeps
    * the model table orders of magnitude smaller than the raw bigram-type
    * list (which grows near-linearly with web-scale corpora and killed the
    * previous hard broadcast hint).
    *
    * Plan shape at 100 TB: the bigram instance list is a per-doc map
    * stage; the c2/c1 model tables aggregate with map-side combine. The
    * scoring join carries NO broadcast hint for c2 — AQE broadcasts the
    * pruned model while it fits and degrades to a shuffle join (the honest
    * fallback) when even the pruned table outgrows the threshold; c1 is
    * vocabulary-sized (Heaps-law sublinear) and stays hinted. The per-doc
    * aggregations shuffle model-/doc-keyed rows only — there is no
    * corpus-sized shuffle unless AQE chooses the c2 shuffle join.
    * Determinism: the per-doc sum runs through the DECIMAL(30,6) path
    * ([[graft.Tables.dsum]] rationale) so it is order-independent, and
    * ln() is bit-compatible with DuckDB's (established by t09 BM25's
    * oracle).
    */
  def t10LmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), split(Tables.canonText(col("text")), " ").as("toks"))
      .cache() // read twice: bigram instances + vocabulary size
    // short-doc guard: sequence(1, 0) is the DESCENDING [1, 0], not empty
    // (see shingleArrExpr) — a <2-token doc must yield zero bigrams
    val big = toks
      .withColumn("bigs", expr(
        """if(size(toks) >= 2,
          |   transform(sequence(1, size(toks) - 1),
          |     i -> named_struct('w1', element_at(toks, i), 'w2', element_at(toks, i + 1))),
          |   cast(array() as array<struct<w1: string, w2: string>>))""".stripMargin))
      .select(col("doc_id"), explode(col("bigs")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .cache() // three readers: c2, c1, scoring join
    try {
      big.count()
      val vocab = toks.select(explode(col("toks")).as("tok"))
        .agg(countDistinct(col("tok"))).head.getLong(0)
      val c2 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt2"))
        .filter(col("cnt2") >= 3)
      val c1 = big.groupBy(col("w1")).agg(count(lit(1)).as("cnt1"))
      big
        .join(c2, Seq("w1", "w2"), "left")
        .join(broadcast(c1), Seq("w1"))
        .withColumn("nll",
          -log((coalesce(col("cnt2"), lit(0L)) + 1).cast(DoubleType)
            / (col("cnt1") + lit(vocab)).cast(DoubleType)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          (floor(sum(col("nll").cast(DecimalType(30, 6))).cast(DoubleType)
            / count(lit(1)) * 10000.0 + 0.5) / 10000.0).as("avg_nll"))
        .orderBy(col("doc_id"))
        .localCheckpoint() // materialize before the caches below are released
    } finally {
      big.unpersist()
      toks.unpersist()
    }
  }

  val t10Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
      |  FROM documents),
      |big AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM docs, unnest(generate_series(1, GREATEST(len(toks) - 1, 0))) AS u(i)),
      |v AS (SELECT COUNT(DISTINCT tok) AS vocab FROM (SELECT unnest(toks) AS tok FROM docs)),
      |c2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM big GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |c1 AS (SELECT w1, COUNT(*) AS cnt1 FROM big GROUP BY 1),
      |scored AS (
      |  SELECT big.doc_id,
      |    -LN(CAST(COALESCE(cnt2, 0) + 1 AS DOUBLE) / CAST(cnt1 + vocab AS DOUBLE)) AS nll
      |  FROM big LEFT JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  FLOOR(CAST(CAST(SUM(CAST(nll AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)
      |    / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_nll
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t11
  /** PII scrub — the redaction pass every pretraining pipeline runs
    * before training: find and mask email addresses and IPv4 literals,
    * reporting per-document match counts and the hash of the scrubbed
    * text (so a downstream exact-dedup keys on the PII-free form).
    *
    * The synthetic corpus carries no PII (all-alpha word soup), so the
    * query first plants a deterministic contact line DERIVED FROM the row
    * itself (doc_id + source): the regex extraction and the double
    * redaction pass run against non-degenerate text with varying counts,
    * and the oracle re-derives the identical line, so the hash compare
    * proves the scrub arithmetic end to end. On a real crawl the planting
    * select is dropped and the same scrub runs unchanged.
    *
    * Both patterns evaluate identically under Java regex (Spark) and RE2
    * (DuckDB): character classes, bounded repetition, and ASCII \b only.
    * Scale: pure per-row map work (two extraction passes + two global
    * replaces + md5), embarrassingly parallel, no shuffle except the
    * presentation ORDER BY.
    */
  def t11PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipRe = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
    Tables.spread(Tables.documents(s, dir))
      .withColumn("pii_text", concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast(StringType),
        lit("@"), col("source"), lit(".org from 10."),
        (col("doc_id") % 256).cast(StringType), lit(".0."),
        ((col("doc_id") * 7) % 256).cast(StringType),
        when(col("doc_id") % 3 === 0, lit(" cc admin@example.com")).otherwise(lit(""))))
      .select(col("doc_id"),
        size(regexp_extract_all(col("pii_text"), lit(emailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(col("pii_text"), lit(ipRe), lit(0))).as("n_ip"),
        md5(regexp_replace(
          regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
          ipRe, "<IP>")).as("scrubbed_h"))
      .orderBy(col("doc_id"))
  }

  val t11Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@' || source || '.org from 10.' || CAST(doc_id % 256 AS VARCHAR)
      |      || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
      |      || (CASE WHEN doc_id % 3 = 0 THEN ' cc admin@example.com' ELSE '' END) AS pii_text
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(pii_text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_email,
      |  len(regexp_extract_all(pii_text, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS n_ip,
      |  md5(regexp_replace(
      |    regexp_replace(pii_text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |    '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g')) AS scrubbed_h
      |FROM p ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // ---------------------------------------------------------------- t12
  /** Cross-document n-gram novelty — the "how much of this doc has the
    * corpus already seen?" curation signal (the complement of the
    * previously-seen-n-gram filters used in dataset decontamination and
    * freshness scoring). Per document: its distinct word-3-gram shingles
    * ([[DedupQueries.shingleArrExpr]] — the same definition d03/d04
    * band on), how many of them FIRST appear in this document (first =
    * min doc_id corpus-wide), and the novel fraction. Near-duplicate
    * documents score near 0; the corpus's first copy scores high.
    *
    * Integer counts + one exact double division + round(4): bit-stable
    * across engines with no decimal routing needed.
    *
    * Scale shape — the exploded shingle stream feeds two independent
    * partial-aggregation branches, and per-doc DISTINCTNESS is handled by
    * aggregation, never by array_distinct (an O(len^2) per-array pass
    * that was measured 10x the cost of everything else in this query at
    * sf0.1; d03/d04 amortize it behind their signature caches, a
    * pure-aggregation query shouldn't pay it at all):
    * (a) n_sh per doc is countDistinct(shingle) — Spark expands it to a
    *     (doc_id, shingle)-keyed partial agg, so duplicates collapse
    *     map-side; (b) each shingle's first_doc is min(doc_id) keyed on
    *     the shingle (duplicate-insensitive, so the raw stream is fine),
    *     and counting first_doc occurrences yields n_novel per doc — the
    *     shingle text never rejoins anything. The final doc-keyed merge
    *     joins two aggregates whose row count is #docs, not #shingles.
    *     Docs with <3 tokens have no shingles and drop out (matching the
    *     SQL).
    */
  def t12NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.spread(Tables.documents(s, dir))
      .withColumn("toks", split(Tables.canonText(col("text")), " "))
      .select(col("doc_id"), explode(expr(
        """if(size(toks) >= 3,
          |   transform(sequence(1, size(toks) - 2),
          |     i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))),
          |   cast(array() as array<string>))""".stripMargin)).as("shingle"))
    val perDoc = sh.groupBy(col("doc_id")).agg(countDistinct(col("shingle")).as("n_sh"))
    val novelPerDoc = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novelPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel").cast(DoubleType) / col("n_sh"), 4))
      .orderBy(col("doc_id"))
  }

  val t12Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
      |  FROM docs, unnest(generate_series(1, GREATEST(len(toks) - 2, 0))) AS u(i)),
      |f AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
      |SELECT s.doc_id, COUNT(*) AS n_sh,
      |  COUNT(*) FILTER (WHERE f.first_doc = s.doc_id) AS n_novel,
      |  ROUND(CAST(COUNT(*) FILTER (WHERE f.first_doc = s.doc_id) AS DOUBLE) / COUNT(*), 4) AS novelty
      |FROM sh s JOIN f USING (shingle)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- t13
  /** Composite quality gate with REASONS — the Gopher-rule-style filter
    * stage as an operations surface: each document gets a pass/fail
    * verdict plus the comma-joined list of WHICH rules failed (the
    * explainability a curation pipeline logs so filter-rate shifts can
    * be attributed to a rule, not rediscovered by diffing corpora).
    * Rules, all deterministic on the canonical token stream:
    * token count in [10, 500]; mean token length in [2, 12]; alphanumeric
    * character ratio of the RAW text >= 0.6; distinct-token ratio >= 0.3
    * (the repetition screen, t06's signal as a gate). reasons uses
    * concat_ws's skip-NULL semantics — identical in DuckDB — so the
    * string is a stable rule-name list with no placeholder commas.
    * Map-only over the scan (one regex + one split + one array_distinct
    * per row, no explode, no shuffle but the presentation sort).
    */
  def t13QualityGate(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("toks", split(Tables.canonText(col("text")), " "))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .withColumn("mean_len",
        (length(Tables.canonText(col("text"))) - (col("n_tokens") - 1)).cast(DoubleType) / col("n_tokens"))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")).cast(DoubleType) /
          nullif(length(col("text")), lit(0)))
      .withColumn("distinct_ratio",
        size(array_distinct(col("toks"))).cast(DoubleType) / col("n_tokens"))
      .withColumn("reasons", concat_ws(",",
        when(!col("n_tokens").between(10, 500), lit("length")),
        when(!col("mean_len").between(2.0, 12.0), lit("mean_len")),
        when(!coalesce(col("alpha_ratio") >= 0.6, lit(false)), lit("alpha")),
        when(!(col("distinct_ratio") >= 0.3), lit("repetition"))))
      .select(col("doc_id"), col("n_tokens"),
        (col("reasons") === "").as("passes"), col("reasons"))
      .orderBy(col("doc_id"))

  val t13Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks,
      |    TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS canon
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(length(canon) - (len(toks) - 1) AS DOUBLE) / len(toks) AS mean_len,
      |    CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
      |      / NULLIF(length(text), 0) AS alpha_ratio,
      |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio
      |  FROM d),
      |r AS (
      |  SELECT doc_id, n_tokens, concat_ws(',',
      |    CASE WHEN NOT (n_tokens BETWEEN 10 AND 500) THEN 'length' END,
      |    CASE WHEN NOT (mean_len BETWEEN 2.0 AND 12.0) THEN 'mean_len' END,
      |    CASE WHEN NOT COALESCE(alpha_ratio >= 0.6, FALSE) THEN 'alpha' END,
      |    CASE WHEN NOT (distinct_ratio >= 0.3) THEN 'repetition' END) AS reasons
      |  FROM m)
      |SELECT doc_id, n_tokens, reasons = '' AS passes, reasons
      |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t14
  /** Per-domain boilerplate detection — the CCNet/RefinedWeb line-dedup
    * signal as an audit surface: spans repeated across MOST documents of
    * one source (navigation chrome, footers, taglines) are boilerplate,
    * and a cleaning pass strips them before training. The shipped corpus
    * has no newline structure, so the span unit is d10's 5-word canonical
    * segment; and — like t11's planted PII — a deterministic per-source
    * tagline is PREPENDED so detection has a live, oracle-rebuildable
    * signal: 'visit www <source> com now' canonicalizes to exactly one
    * 5-word segment shared by every document of its source.
    *
    * Rule: a segment type is boilerplate when it appears in at least
    * max(3, ceil(D/2)) DISTINCT documents of the source (D = the
    * source's doc count). Output per source: segment types, boilerplate
    * types, their total occurrences, and the word share they cover.
    *
    * Scale shape: segment fan-out is map-only (one Generate); the type
    * count shuffles (source, segment) keys — linear in total segments
    * (hash the segment to 16 bytes at 100 TB); the per-source doc-count
    * threshold is one row per source, a broadcast join. No quadratic
    * step anywhere; a mega-source costs its hash buckets linear work.
    */
  def t14Boilerplate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        split(Tables.canonText(
          concat(lit("visit www "), col("source"), lit(" com now "), col("text"))),
          " ").as("w"))
    val segs = docs
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(0, cast(ceil(size(w) / 5.0) as int) - 1),
          |          i -> array_join(slice(w, i * 5 + 1, 5), ' '))""".stripMargin)).as("seg"))
      .withColumn("nw", size(split(col("seg"), " ")).cast(LongType))
    val types = segs.groupBy(col("source"), col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd"), count(lit(1)).as("occ"),
        max(col("nw")).as("nw"))
    val perSource = Tables.documents(s, dir)
      .groupBy(col("source")).agg(countDistinct(col("doc_id")).as("d_docs"))
    types.join(broadcast(perSource), "source")
      .withColumn("boiler",
        col("nd") >= greatest(lit(3L), ceil(col("d_docs") / lit(2.0)).cast(LongType)))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_seg_types"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler_types"),
        sum(when(col("boiler"), col("occ")).otherwise(0L)).as("boiler_hits"),
        (floor(sum(when(col("boiler"), col("occ") * col("nw")).otherwise(0L)).cast(DoubleType) /
          sum(col("occ") * col("nw")).cast(DoubleType) * 10000.0 + 0.5) / 10000.0)
          .as("boiler_word_share"))
      .orderBy(col("source"))
  }

  val t14Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source,
      |    string_split(TRIM(regexp_replace(regexp_replace(LOWER(
      |      'visit www ' || source || ' com now ' || text),
      |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS ws
      |  FROM documents),
      |seg AS (
      |  SELECT doc_id, source, array_to_string(ws[i*5+1 : i*5+5], ' ') AS seg,
      |    CAST(len(ws[i*5+1 : i*5+5]) AS BIGINT) AS nw
      |  FROM docs, unnest(generate_series(0, CAST(CEIL(len(ws) / 5.0) AS INT) - 1)) AS u(i)),
      |types AS (
      |  SELECT source, seg, COUNT(DISTINCT doc_id) AS nd, COUNT(*) AS occ, MAX(nw) AS nw
      |  FROM seg GROUP BY 1, 2),
      |d AS (SELECT source, COUNT(DISTINCT doc_id) AS d_docs FROM documents GROUP BY 1),
      |b AS (
      |  SELECT types.*, nd >= GREATEST(3, CAST(CEIL(d_docs / 2.0) AS BIGINT)) AS boiler
      |  FROM types JOIN d USING (source))
      |SELECT source, COUNT(*) AS n_seg_types,
      |  CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_types,
      |  CAST(SUM(CASE WHEN boiler THEN occ ELSE 0 END) AS BIGINT) AS boiler_hits,
      |  FLOOR(CAST(SUM(CASE WHEN boiler THEN occ * nw ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(occ * nw) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS boiler_word_share
      |FROM b GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t15
  /** Vocabulary frequency spectrum — the Zipf audit run before tokenizer
    * training: token types bucketed by occurrence count into power-of-two
    * bands (bucket b holds types seen 2^b .. 2^(b+1)-1 times), reporting
    * types and total occurrences per band. The head bands say how much a
    * frequency-capped vocab covers; the b=0 singleton band sizes the
    * hapax tail (misspellings, ids, noise) a BPE merge pass will never
    * promote.
    *
    * Bucket index is length(bin(cnt)) - 1 — the BIT LENGTH of the count,
    * an integer-exact floor(log2) both engines compute identically
    * (float log2 at exact powers of two is an ulp gamble not worth
    * taking). Plan: one token-keyed count (map-side partial, the only
    * corpus-sized shuffle), then a <64-row rollup. At 100 TB vocab
    * counting is exactly this shape; nothing here is corpus-quadratic.
    */
  def t15ZipfSpectrum(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .select(explode(split(Tables.canonText(col("text")), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", (length(bin(col("cnt"))) - 1).cast(LongType))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_occurrences"))
      .orderBy(col("bucket"))

  val t15Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1)
      |SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS bucket,
      |  COUNT(*) AS n_types, CAST(SUM(cnt) AS BIGINT) AS n_occurrences
      |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- t16
  /** PMI collocations — pointwise mutual information over adjacent token
    * pairs, the classic phrase-induction signal (Church & Hanks 1990;
    * word2vec's phrase pass and modern tokenizer merge heuristics are the
    * same statistic). For bigram (x, y):
    *
    *   pmi = ln( (c(x,y)/N2) / ( (c(x)/N1) * (c(y)/N1) ) )
    *
    * with N1 = total token instances, N2 = total bigram instances. Only
    * bigram types seen >= 5 times are scored (rarer pairs have unstable
    * PMI — the standard frequency floor), top 30 by PMI with a (w1, w2)
    * tiebreak.
    *
    * Plan shape at 100 TB: two token-keyed hash aggregations (unigram +
    * bigram counts, both map-side partial), then joins that are VOCAB-
    * sized, not corpus-sized — and the >= 5 floor prunes the bigram side
    * BEFORE either join, the same bounded-model discipline t10 applies.
    * No broadcast hints: vocabulary grows with the corpus (t10's lesson),
    * so AQE picks the strategy per actual size. The two grand totals are
    * 1-row aggregates cross-joined in (t09's no-collect pattern). The
    * double expression is the same op sequence in both engines, rounded
    * through the shared floor-1e4 pattern.
    */
  def t16PmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(split(Tables.canonText(col("text")), " ").as("toks"))
      .cache() // unigram and bigram branches both read the token arrays
    try {
      docs.count()
      t16Body(docs)
        .localCheckpoint() // materialize before the cache below is released
    } finally {
      docs.unpersist()
    }
  }

  private def t16Body(docs: DataFrame): DataFrame = {
    val uni = docs.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n1 = uni.agg(sum(col("c")).as("n1"))
    val big = docs.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('w1', element_at(toks, i), 'w2', element_at(toks, i + 1)))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val n2 = big.agg(sum(col("c12")).as("n2"))
    big.filter(col("c12") >= 5)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(n1))
      .crossJoin(broadcast(n2))
      .select(
        col("w1"), col("w2"),
        col("c12").as("n_xy"), col("c1").as("n_x"), col("c2").as("n_y"),
        (floor(log(
          (col("c12").cast(DoubleType) / col("n2")) /
            ((col("c1").cast(DoubleType) / col("n1")) *
              (col("c2").cast(DoubleType) / col("n1")))) * 10000.0 + 0.5) / 10000.0).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(30)
  }

  val t16Sql: String =
    """WITH docs AS (
      |  SELECT string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
      |  FROM documents),
      |uc AS (SELECT w, COUNT(*) AS c FROM (SELECT unnest(toks) AS w FROM docs) GROUP BY w),
      |n1 AS (SELECT SUM(c) AS n1 FROM uc),
      |bc AS (
      |  SELECT w1, w2, COUNT(*) AS c12
      |  FROM (
      |    SELECT toks[i] AS w1, toks[i+1] AS w2
      |    FROM docs, unnest(generate_series(1, len(toks) - 1)) AS u(i)
      |    WHERE len(toks) >= 2)
      |  GROUP BY w1, w2),
      |n2 AS (SELECT SUM(c12) AS n2 FROM bc)
      |SELECT w1, w2, c12 AS n_xy, a.c AS n_x, b.c AS n_y,
      |  FLOOR(ln((CAST(c12 AS DOUBLE) / n2) /
      |    ((CAST(a.c AS DOUBLE) / n1) * (CAST(b.c AS DOUBLE) / n1))) * 10000.0 + 0.5) / 10000.0 AS pmi
      |FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w
      |CROSS JOIN n1 CROSS JOIN n2
      |WHERE c12 >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin

  // ---------------------------------------------------------------- t17
  /** Per-doc deflate stats (doc_id, n_bytes, n_deflate, ratio) — the core
    * of t17, also the surface Round5OpsSpec pins. One Deflater per
    * partition (reset per document): codec setup amortized the way the
    * multimodal tier batches its decoders. */
  private[graft] def t17PerDoc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
        val buf = new Array[Byte](1 << 16)
        rows.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          d.reset()
          d.setInput(bytes)
          d.finish()
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          val ratio =
            if (bytes.isEmpty) 1.0
            else math.floor(n.toDouble / bytes.length * 10000.0 + 0.5) / 10000.0
          (id, bytes.length.toLong, n, ratio)
        }
      }
      .toDF("doc_id", "n_bytes", "n_deflate", "ratio")
  }

  /** Compression-ratio quality signal — deflate(text).size / size: the
    * classic cheap proxy for repetitive/templated text (Gopher- and
    * RefinedWeb-style filters drop highly compressible boilerplate and
    * near-incompressible encoded junk). Bands: repetitive (< 0.35),
    * normal [0.35, 0.9), opaque (>= 0.9), rolled up per band.
    *
    * zlib-deflate is not SQL-expressible, so the per-doc deflate frame is
    * materialized to an sf-keyed `graft.Sidecars` path by the query run
    * itself (write-then-read-back, see Sidecars scaladoc); the DuckDB
    * oracle reads that exact path and re-derives the banding + rollup
    * arithmetic over the identical per-doc rows. The deflate VALUES are
    * pinned independently by Round5OpsSpec's bit-for-bit in-JVM recompute
    * — sidecar + spec together close the loop the pure `no_oracle` row
    * left open. The rollup reads the sidecar BACK (not the live frame) so
    * Spark and the oracle aggregate byte-identical inputs.
    *
    * Plan shape at 100 TB: pure per-row map work + one 3-row rollup —
    * deflate at BEST_SPEED runs ~100 MB/s per core, so the corpus scan
    * itself is the bound; nothing shuffles but the band aggregate. (The
    * sidecar materialization is the verify-path contract, not a scale
    * cost: at production scale the per-doc frame is a table you'd persist
    * anyway — it IS the quality-signal output.)
    */
  def t17Compressibility(s: SparkSession, dir: String): DataFrame = {
    // sf-dir-keyed sidecar (graft.Sidecars): a later t17 run at a
    // DIFFERENT sf (bench pass, smoke run) writes a disjoint path, so it
    // cannot clobber the frame the DuckDB oracle is about to read
    graft.Sidecars.write(t17PerDoc(s, dir), dir, "t17_deflate")
      .withColumn("band",
        when(col("ratio") < 0.35, "repetitive")
          .when(col("ratio") < 0.9, "normal")
          .otherwise("opaque"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("raw_bytes"),
        sum(col("n_deflate")).as("deflate_bytes"),
        // decimal-routed mean (Tables.davg recipe): ratios carry 4 decimal
        // digits, so the DECIMAL sum is exact and order-independent — the
        // floor-to-1e-4 result can't straddle an ulp between engines
        (floor(Tables.davg(col("ratio")) * 10000.0 + 0.5) / 10000.0).as("avg_ratio"))
      .orderBy(col("band"))
  }

  /** Band/rollup arithmetic over the sidecar the query run materialized —
    * same decimal-sum mean recipe as Tables.davg; SUMs cast back to BIGINT
    * because DuckDB widens BIGINT sums to HUGEINT. */
  def t17Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("t17_deflate")}/*.parquet'),
      |b AS (
      |  SELECT CASE WHEN ratio < 0.35 THEN 'repetitive'
      |              WHEN ratio < 0.9 THEN 'normal'
      |              ELSE 'opaque' END AS band,
      |         n_bytes, n_deflate, ratio
      |  FROM side)
      |SELECT band, COUNT(*) AS n_docs,
      |  CAST(SUM(n_bytes) AS BIGINT) AS raw_bytes,
      |  CAST(SUM(n_deflate) AS BIGINT) AS deflate_bytes,
      |  FLOOR((CAST(SUM(CAST(ratio AS DECIMAL(30,6))) AS DOUBLE) / COUNT(ratio)) * 10000.0 + 0.5) / 10000.0 AS avg_ratio
      |FROM b GROUP BY band ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- t18
  /** Readability scoring — Flesch reading ease + Flesch-Kincaid grade from
    * three regex-derived counts: letter-run words, [.!?]-run sentences
    * (floored at 1: a fragment is one sentence, and the synthetic corpus
    * has no terminators at all, which this handles by construction), and
    * the classic vowel-group syllable heuristic (max(1, [aeiouy]+ runs)
    * per word — the same approximation readability tooling has used since
    * the original Flesch studies; no dictionary required, so it
    * distributes as pure map work).
    *
    * Scale: one regex map pass, no shuffle at all — the output is per-doc
    * and ordered only for the bounded dump. Determinism: both engines
    * evaluate the identical arithmetic expression tree (the subtraction
    * order matters for the final ulp), and the result is floored to 1e-4
    * via the shared idiom.
    */
  def t18Readability(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("words", expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
      .withColumn("n_words", size(col("words")).cast(LongType))
      .withColumn("n_sentences",
        greatest(lit(1L), size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast(LongType)))
      .withColumn("n_syllables", expr(
        """aggregate(words,
          |  0L,
          |  (acc, w) -> acc + greatest(1, size(regexp_extract_all(w, '[aeiouy]+', 0))))""".stripMargin))
      .select(
        col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
        (floor((lit(206.835)
          - lit(1.015) * (col("n_words").cast(DoubleType) / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast(DoubleType) / nullif(col("n_words"), lit(0L))))
          * 10000.0 + 0.5) / 10000.0).as("flesch_ease"),
        (floor((lit(0.39) * (col("n_words").cast(DoubleType) / col("n_sentences"))
          + lit(11.8) * (col("n_syllables").cast(DoubleType) / nullif(col("n_words"), lit(0L)))
          - lit(15.59))
          * 10000.0 + 0.5) / 10000.0).as("fk_grade"))
      .orderBy(col("doc_id"))

  val t18Sql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    regexp_extract_all(LOWER(text), '[a-z]+') AS words,
      |    GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences
      |  FROM documents),
      |k AS (
      |  SELECT doc_id,
      |    CAST(len(words) AS BIGINT) AS n_words,
      |    CAST(n_sentences AS BIGINT) AS n_sentences,
      |    CAST(CASE WHEN len(words) = 0 THEN 0 ELSE
      |      list_reduce(list_transform(words, w -> GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+')))), (a, b) -> a + b)
      |    END AS BIGINT) AS n_syllables
      |  FROM c)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  FLOOR((206.835
      |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |    - 84.6 * (CAST(n_syllables AS DOUBLE) / NULLIF(n_words, 0)))
      |    * 10000.0 + 0.5) / 10000.0 AS flesch_ease,
      |  FLOOR((0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
      |    + 11.8 * (CAST(n_syllables AS DOUBLE) / NULLIF(n_words, 0))
      |    - 15.59)
      |    * 10000.0 + 0.5) / 10000.0 AS fk_grade
      |FROM k ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t19
  /** Content-defined chunking (CDC) — the rolling-hash boundary primitive
    * under dedup storage layers (rsync, LBFS, FastCDC; in LLM-data terms:
    * chunk-level dedup of a crawl store, where byte-offset chunking would
    * let a one-character edit reshuffle every downstream chunk). A
    * boundary lands after character i when the polynomial rolling hash of
    * the trailing 8-character window
    *
    *   H(i) = sum over j in 0..7 of cp(i - j) * 31^j      (codepoints)
    *
    * satisfies H(i) % 64 == 0 — the boundary depends only on LOCAL
    * content, so an edit relocates at most the chunks overlapping its
    * 8-char neighborhood and every later chunk re-aligns (the
    * edit-locality property Round7OpsSpec pins; fixed-offset chunking
    * provably lacks it). Expected chunk ~64 chars at this divisor.
    * Production FastCDC adds min/max chunk bounds and a gear table; this
    * is the core boundary rule, with the window-8 polynomial spelled
    * identically in both engines.
    *
    * Everything is HOF expressions — codepoint array, boundary filter,
    * chunk assembly, md5 — no UDF; per-source rollup counts chunk-level
    * duplication (n_chunks - n_unique = dup occurrences, the bytes a
    * chunk store would NOT re-store). Plan: one map pass over documents
    * (chunking never shuffles), one source-keyed exact-distinct rollup.
    * At 100 TB the chunk store keys on chunk_hash; the rollup here is
    * the audit a dedup layer publishes per source.
    */
  def t19CdcChunking(s: SparkSession, dir: String): DataFrame = {
    Tables.spread(Tables.documents(s, dir))
      .filter(char_length(col("text")) >= 1)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("cps", expr(
        "transform(sequence(1, char_length(text)), i -> cast(ascii(substring(text, i, 1)) as bigint))"))
      .withColumn("bnds", expr(
        """if(char_length(text) >= 9,
          |  filter(sequence(8, char_length(text) - 1),
          |    i -> (element_at(cps, i) + element_at(cps, i-1)*31 + element_at(cps, i-2)*961
          |          + element_at(cps, i-3)*29791 + element_at(cps, i-4)*923521
          |          + element_at(cps, i-5)*28629151 + element_at(cps, i-6)*887503681
          |          + element_at(cps, i-7)*27512614111) % 64 = 0),
          |  cast(array() as array<int>))""".stripMargin))
      .withColumn("chunk", explode(expr(
        """transform(sequence(1, size(bnds) + 1), k -> substring(text,
          |  CASE WHEN k = 1 THEN 1 ELSE element_at(bnds, k - 1) + 1 END,
          |  (CASE WHEN k = size(bnds) + 1 THEN char_length(text) ELSE element_at(bnds, k) END)
          |    - (CASE WHEN k = 1 THEN 1 ELSE element_at(bnds, k - 1) + 1 END) + 1))""".stripMargin)))
      .select(col("source"), md5(encode(col("chunk"), "utf-8")).as("chunk_hash"),
        char_length(col("chunk")).as("chunk_len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_hash")).as("n_unique_chunks"),
        (count(lit(1)) - countDistinct(col("chunk_hash"))).as("n_dup_occurrences"),
        sum(col("chunk_len")).as("total_chars"),
        min(col("chunk_len")).as("min_len"), max(col("chunk_len")).as("max_len"))
      .orderBy(col("source"))
  }

  /** The identical window-8 polynomial, boundary rule, chunk assembly
    * (CASE-spliced substrings), and md5 — list lambdas mirror the Spark
    * HOFs term by term. */
  val t19Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source, text FROM documents WHERE length(text) >= 1),
      |cp AS (
      |  SELECT doc_id, source, text,
      |    list_transform(generate_series(1, length(text)),
      |      i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS cps
      |  FROM d),
      |bn AS (
      |  SELECT doc_id, source, text,
      |    list_filter(generate_series(8, length(text) - 1),
      |      i -> (cps[i] + cps[i-1]*31 + cps[i-2]*961 + cps[i-3]*29791 + cps[i-4]*923521
      |            + cps[i-5]*28629151 + cps[i-6]*887503681 + cps[i-7]*27512614111) % 64 = 0) AS bnds
      |  FROM cp),
      |ck AS (
      |  SELECT doc_id, source,
      |    list_transform(generate_series(1, len(bnds) + 1),
      |      k -> substr(text,
      |        CASE WHEN k = 1 THEN 1 ELSE bnds[k-1] + 1 END,
      |        (CASE WHEN k = len(bnds) + 1 THEN length(text) ELSE bnds[k] END)
      |          - (CASE WHEN k = 1 THEN 1 ELSE bnds[k-1] + 1 END) + 1)) AS chunks
      |  FROM bn),
      |fl AS (
      |  SELECT doc_id, source, md5(u.chunk) AS chunk_hash, length(u.chunk) AS chunk_len
      |  FROM ck, unnest(chunks) AS u(chunk))
      |SELECT source,
      |  COUNT(*) AS n_chunks,
      |  COUNT(DISTINCT chunk_hash) AS n_unique_chunks,
      |  COUNT(*) - COUNT(DISTINCT chunk_hash) AS n_dup_occurrences,
      |  CAST(SUM(chunk_len) AS BIGINT) AS total_chars,
      |  MIN(chunk_len) AS min_len, MAX(chunk_len) AS max_len
      |FROM fl GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t20
  /** CCNet-style perplexity bucketing — the quality-tier assignment step
    * of the CCNet pipeline (Wenzek et al. 2020): score every document
    * with the in-domain language model, then split the corpus into
    * head / middle / tail TERCILES by score (head = lowest perplexity =
    * most fluent; tail feeds back into filtering or gets down-weighted in
    * the training mixture). The scorer is t10's add-one-smoothed bigram
    * LM verbatim — bucketing and scoring cannot drift because they ARE
    * the same plan prefix.
    *
    * Tercile thresholds WITHOUT a corpus-wide ranking window: avg_nll is
    * 1e-4-rounded (t10's contract), so a (score -> count) histogram is
    * exact, its cardinality is bounded by the score RANGE times 1e4 —
    * never by corpus size — and the cumulative window runs over that
    * bounded histogram, not the documents (the same bounded-window
    * argument as p04's 256-row offset frame). t1/t2 = the smallest score
    * whose cumulative count reaches ceil(N/3) / ceil(2N/3), integer
    * arithmetic only (3*cum >= N avoids division); docs then bucket by
    * two broadcast scalar comparisons — one map pass, no per-doc rank.
    * Equal scores land in one bucket by construction, so the split is
    * deterministic and reproducible across runs and engines.
    *
    * Output: one row per bucket — doc count, bigram mass, score
    * envelope. Oracle restates the t10 chain + the identical histogram
    * threshold arithmetic.
    */
  def t20PerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val scored = t10LmScore(s, dir) // doc_id, n_bigrams, avg_nll (1e-4-rounded)
    val n = scored.agg(count(lit(1)).as("n"))
    // histogram over DISTINCT rounded scores: bounded cardinality, so the
    // unpartitioned running-sum window is over a small frame by contract
    val cum = scored.groupBy(col("avg_nll")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        W.orderBy(col("avg_nll")).rowsBetween(W.unboundedPreceding, W.currentRow)))
    val th = cum.crossJoin(broadcast(n)).agg(
      min(when(col("cum") * 3 >= col("n"), col("avg_nll"))).as("t1"),
      min(when(col("cum") * 3 >= col("n") * 2, col("avg_nll"))).as("t2"))
    scored.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("avg_nll") <= col("t1"), lit("head"))
          .when(col("avg_nll") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("sum_bigrams"),
        min(col("avg_nll")).as("min_nll"),
        max(col("avg_nll")).as("max_nll"))
      .orderBy(col("bucket"))
  }

  /** t10's scoring chain verbatim, then the identical histogram-threshold
    * arithmetic (3*cum >= N integer form) and bucket rollup. */
  val t20Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
      |  FROM documents),
      |big AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM docs, unnest(generate_series(1, GREATEST(len(toks) - 1, 0))) AS u(i)),
      |v AS (SELECT COUNT(DISTINCT tok) AS vocab FROM (SELECT unnest(toks) AS tok FROM docs)),
      |c2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM big GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |c1 AS (SELECT w1, COUNT(*) AS cnt1 FROM big GROUP BY 1),
      |nll AS (
      |  SELECT big.doc_id,
      |    -LN(CAST(COALESCE(cnt2, 0) + 1 AS DOUBLE) / CAST(cnt1 + vocab AS DOUBLE)) AS nll
      |  FROM big LEFT JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
      |scored AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams,
      |    FLOOR(CAST(CAST(SUM(CAST(nll AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)
      |      / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_nll
      |  FROM nll GROUP BY doc_id),
      |n AS (SELECT COUNT(*) AS n FROM scored),
      |cum AS (
      |  SELECT avg_nll, SUM(c) OVER (ORDER BY avg_nll
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM (SELECT avg_nll, COUNT(*) AS c FROM scored GROUP BY 1)),
      |th AS (
      |  SELECT MIN(CASE WHEN cum * 3 >= n THEN avg_nll END) AS t1,
      |    MIN(CASE WHEN cum * 3 >= n * 2 THEN avg_nll END) AS t2
      |  FROM cum CROSS JOIN n)
      |SELECT CASE WHEN avg_nll <= t1 THEN 'head'
      |            WHEN avg_nll <= t2 THEN 'middle'
      |            ELSE 'tail' END AS bucket,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
      |  MIN(avg_nll) AS min_nll, MAX(avg_nll) AS max_nll
      |FROM scored CROSS JOIN th
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- t21
  /** Vocabulary-growth (Heaps'-law) audit — the measurement behind
    * tokenizer and vocab-size planning: how many distinct word types the
    * corpus has after ingesting its first 1/16, 2/16, ... 16/16, where
    * "first" is the reproducible md5-hash ingestion order the repo's
    * samplers already use (q30/p05/p26). Sub-linear growth (types <<
    * tokens, flattening curve) is healthy natural text; near-linear
    * growth flags ID-like/noisy token streams that would blow up a
    * tokenizer's vocab.
    *
    * The scale-correct rewrite (q96's first-seen trick, applied to
    * corpus prefixes): "vocabulary after the first k docs" needs no
    * global scan order at all when the checkpoints are HASH BUCKETS —
    * bucket b = docs whose first md5 hex digit is b, so prefixes
    * {buckets 0..b} are nested by construction. Each type's first-seen
    * checkpoint is then min(bucket) over its occurrences: one
    * token-keyed aggregation whose state is bounded by the VOCABULARY
    * (not the corpus), sharded by token key like any word-count. The
    * published frame folds to 16 rows; the running totals are a window
    * over those 16 rows only (cardinality fixed by the checkpoint
    * grid, never by data).
    *
    * Everything is exact int64 counts — no floats anywhere.
    */
  def t21VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .withColumn("bucket",
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 1), 16, 10) as bigint)"))
      .withColumn("toks", expr(s"regexp_extract_all(text, '$TokenPattern', 0)"))
    val perDoc = docs.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val occ = docs.select(col("bucket"), explode(col("toks")).as("tok"))
    val perTokBucket = occ.groupBy(col("tok"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val firstSeen = perTokBucket.groupBy(col("tok"))
      .agg(min(col("bucket")).as("minb"))
    val tokensPerBucket = perTokBucket.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("n_tokens"))
    val typesPerBucket = firstSeen.groupBy(col("minb").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDoc
      .join(tokensPerBucket, Seq("bucket"), "left")
      .join(typesPerBucket, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      // 16-row frame: the unpartitioned window is bounded by the
      // checkpoint grid, not by data (same rationale as t20's
      // bounded-cardinality histogram)
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("vocab", sum(col("new_types")).over(w))
      .orderBy(col("bucket"))
  }

  /** Identical bucket grid, first-seen minimum, and 16-row running
    * totals. */
  val t21Sql: String =
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))::BIGINT AS bucket,
       |    regexp_extract_all(text, '$TokenPattern') AS toks
       |  FROM documents),
       |per_doc AS (SELECT bucket, COUNT(*) AS n_docs FROM docs GROUP BY bucket),
       |occ AS (SELECT bucket, unnest(toks) AS tok FROM docs),
       |ptb AS (SELECT tok, bucket, COUNT(*) AS cnt FROM occ GROUP BY tok, bucket),
       |first_seen AS (SELECT tok, MIN(bucket) AS minb FROM ptb GROUP BY tok),
       |tpb AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS n_tokens FROM ptb GROUP BY bucket),
       |typ AS (SELECT minb AS bucket, COUNT(*) AS new_types FROM first_seen GROUP BY minb),
       |base AS (
       |  SELECT per_doc.bucket, per_doc.n_docs,
       |    COALESCE(tpb.n_tokens, 0) AS n_tokens,
       |    COALESCE(typ.new_types, 0) AS new_types
       |  FROM per_doc LEFT JOIN tpb ON per_doc.bucket = tpb.bucket
       |               LEFT JOIN typ ON per_doc.bucket = typ.bucket)
       |SELECT bucket, n_docs, n_tokens, new_types,
       |  CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
       |  CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       |  CAST(SUM(new_types) OVER w AS BIGINT) AS vocab
       |FROM base
       |WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- t22
  /** Per-source domain-shift audit: TOTAL-VARIATION distance between
    * each source's unigram distribution and the corpus distribution —
    * the mixture-design measurement behind "is src17 drifting from the
    * rest of the corpus?" (re-weighting, contamination and
    * domain-collapse checks all threshold on exactly this number; on
    * this corpus the signal is each source's language mix — the
    * stopword markers t02 keys on have very different source shares).
    *
    * TV instead of KL deliberately: TV = 1/2 * sum_t |p_s(t) - p_c(t)|
    * is a pure RATIONAL of token counts, so the whole audit is exact
    * int64 — no logarithms whose libm rounding could drift
    * cross-engine, no per-term quantization contract (t10's KL-family
    * scorer pays that cast; a distance used for threshold decisions
    * shouldn't). Scale bound on that exactness (the g13 contract): the
    * gap products cnt_st * n_corpus and n_s * (nc -
    * present_corpus_mass) stay inside int64 while n_corpus *
    * max(cnt_st) < 2^63 — i.e. up to roughly a 3e9-token corpus with a
    * 3e9-count top token; past that, route the products and their SUM
    * through DECIMAL(38,0) on BOTH engines (Spark wraps int64 silently
    * where DuckDB raises, so the overflow would surface as divergence,
    * not an error). The absent-token mass needs no |vocab|-wide join:
    * for t not in source s, |p_s - p_c| = p_c(t), and those terms fold
    * into n_s * (N - sum of cnt_t over PRESENT tokens) — one
    * aggregation over (source, token) pairs that exist, state bounded
    * by the observed pair set exactly like any word count. The only
    * float is the final published division (p26's one-division rule).
    *
    * top_token is the largest |share gap| among tokens the source DOES
    * use (integer argmax, token-asc ties); the absent-token argmax
    * would need a sources x vocab cross join — at production scale
    * that candidate set gets bounded to heavy hitters (t07) first,
    * which is why it is out of this operator's contract.
    */
  def t22DomainDivergence(s: SparkSession, dir: String): DataFrame = {
    val occ = Tables.spread(Tables.documents(s, dir))
      .select(col("source"), col("doc_id"),
        explode(expr(s"regexp_extract_all(text, '$TokenPattern', 0)")).as("tok"))
    val st = occ.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt_st"))
    val srcTot = occ.groupBy(col("source")).agg(count(lit(1)).as("n_s"),
      countDistinct(col("doc_id")).as("n_docs"))
    val corpTok = occ.groupBy(col("tok")).agg(count(lit(1)).as("cnt_t"))
    val nTot = occ.agg(count(lit(1)).as("n_corpus"))
    val terms = st.join(corpTok, "tok").join(srcTot, "source")
      .crossJoin(broadcast(nTot))
      .withColumn("gap", abs(col("cnt_st") * col("n_corpus") - col("cnt_t") * col("n_s")))
    terms.groupBy(col("source"))
      .agg(min(col("n_docs")).as("n_docs"), min(col("n_s")).as("n_tokens"),
        sum(col("gap")).as("present_gap"),
        sum(col("cnt_t")).as("present_corpus_mass"),
        min(col("n_corpus")).as("nc"),
        max(col("gap")).as("max_gap"))
      .withColumn("absent_gap",
        col("n_tokens") * (col("nc") - col("present_corpus_mass")))
      .withColumn("tv_micro", floor(
        (col("present_gap") + col("absent_gap")).cast(DoubleType)
          / (lit(2.0) * col("n_tokens").cast(DoubleType) * col("nc").cast(DoubleType))
          * 1e6).cast("long"))
      .join(
        // deterministic argmax: per source the smallest token among
        // those achieving the max gap
        terms.groupBy(col("source"), col("gap")).agg(min(col("tok")).as("tok"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
              .orderBy(col("gap").desc, col("tok"))))
          .filter(col("rn") === 1)
          .select(col("source"), col("tok").as("top_token")),
        Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("tv_micro"),
        col("top_token"), col("max_gap"))
      .orderBy(col("source"))
  }

  /** Identical exact-integer gap arithmetic, absent-mass fold, argmax
    * tie rule, and one-division micro projection. */
  val t22Sql: String =
    s"""WITH occ AS (
       |  SELECT source, doc_id, unnest(regexp_extract_all(text, '$TokenPattern')) AS tok
       |  FROM documents),
       |st AS (SELECT source, tok, COUNT(*) AS cnt_st FROM occ GROUP BY 1, 2),
       |src_tot AS (
       |  SELECT source, COUNT(*) AS n_s, COUNT(DISTINCT doc_id) AS n_docs
       |  FROM occ GROUP BY 1),
       |corp AS (SELECT tok, COUNT(*) AS cnt_t FROM occ GROUP BY 1),
       |nt AS (SELECT COUNT(*) AS n_corpus FROM occ),
       |terms AS (
       |  SELECT st.source, st.tok,
       |    ABS(st.cnt_st * nt.n_corpus - corp.cnt_t * src_tot.n_s) AS gap,
       |    corp.cnt_t, src_tot.n_s, src_tot.n_docs, nt.n_corpus
       |  FROM st JOIN corp USING (tok) JOIN src_tot USING (source) CROSS JOIN nt),
       |agg AS (
       |  SELECT source, MIN(n_docs) AS n_docs, MIN(n_s) AS n_tokens,
       |    CAST(SUM(gap) AS BIGINT) AS present_gap,
       |    CAST(SUM(cnt_t) AS BIGINT) AS present_corpus_mass,
       |    MIN(n_corpus) AS nc, MAX(gap) AS max_gap
       |  FROM terms GROUP BY source),
       |arg AS (
       |  SELECT source, tok AS top_token FROM (
       |    SELECT source, tok,
       |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY gap DESC, tok) AS rn
       |    FROM terms) WHERE rn = 1)
       |SELECT agg.source, n_docs, n_tokens,
       |  CAST(FLOOR(CAST(present_gap + n_tokens * (nc - present_corpus_mass) AS DOUBLE)
       |    / (2.0 * CAST(n_tokens AS DOUBLE) * CAST(nc AS DOUBLE)) * 1e6) AS BIGINT) AS tv_micro,
       |  top_token, max_gap
       |FROM agg JOIN arg USING (source)
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t23
  /** Out-of-vocabulary (OOV) rate audit — the tokenizer-planning
    * measurement: build a bounded vocabulary from a TRAIN split (even
    * doc ids, top 1000 types by frequency, count-desc token-asc ties),
    * then measure, per source over the HELD-OUT split (odd ids), the
    * fraction of token OCCURRENCES outside that vocabulary. High OOV on
    * a source = the vocab under-serves it (the signal behind vocab-size
    * and domain-mix decisions; BPE exists precisely to drive this to
    * zero — t05's counter covers that tier, this measures the
    * word-level baseline it fixes).
    *
    * Scale: vocab is one word count + a bounded top-k (TakeOrdered);
    * the membership test is a broadcast LEFT join of the held-out
    * occurrence stream against the <= 1000-row vocab — a map-side
    * hash probe, no shuffle on the occurrence stream beyond the
    * per-source rollup. Exact int64 counts; the rate is the p26
    * one-division rule.
    */
  def t23OovRate(s: SparkSession, dir: String): DataFrame = {
    val occ = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        explode(expr(s"regexp_extract_all(text, '$TokenPattern', 0)")).as("tok"))
    // top-k via orderBy+limit: plans TakeOrderedAndProject (per-partition
    // heaps, k rows cross partitions) — the oracle's ROW_NUMBER spelling
    // selects the identical set under the same total order, but a global
    // rank window would sort the whole vocabulary at 100 TB
    val vocab = occ.filter(col("doc_id") % 2 === 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(1000)
      .select(col("tok"), lit(true).as("in_vocab"))
    occ.filter(col("doc_id") % 2 === 1)
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(when(col("in_vocab").isNull, col("tok"))).as("n_oov_types"))
      .withColumn("oov_milli", floor(
        col("n_oov").cast(DoubleType) / col("n_tokens").cast(DoubleType) * 1e3).cast(LongType))
      .select(col("source"), col("n_tokens"), col("n_oov"), col("n_oov_types"),
        col("oov_milli"))
      .orderBy(col("source"))
  }

  /** Identical split, ranked vocab cut, membership test, and
    * one-division rate. */
  val t23Sql: String =
    s"""WITH occ AS (
       |  SELECT doc_id, source, unnest(regexp_extract_all(text, '$TokenPattern')) AS tok
       |  FROM documents),
       |vocab AS (
       |  SELECT tok FROM (
       |    SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rnk
       |    FROM occ WHERE doc_id % 2 = 0 GROUP BY tok) WHERE rnk <= 1000),
       |held AS (
       |  SELECT o.source, o.tok, v.tok IS NULL AS oov
       |  FROM occ o LEFT JOIN vocab v ON o.tok = v.tok
       |  WHERE o.doc_id % 2 = 1)
       |SELECT source, COUNT(*) AS n_tokens,
       |  CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  COUNT(DISTINCT CASE WHEN oov THEN tok END) AS n_oov_types,
       |  CAST(FLOOR(CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) * 1e3) AS BIGINT) AS oov_milli
       |FROM held GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t24
  /** Within-document REPETITION audit — the Gopher repetition filters
    * (Rae et al. 2021, Table A1): a crawl document whose text is
    * dominated by one repeated n-gram (boilerplate, menu spam, SEO
    * keyword stuffing) is dropped before training regardless of its
    * other quality signals. Per document and n in {2, 3}: the TOP
    * n-gram's token share (flag at Gopher's thresholds — 0.20 for
    * 2-grams, 0.18 for 3-grams, both as exact integer cross-products,
    * no division) and the DUPLICATE n-gram occurrence mass (grams
    * appearing >= 2 times), rolled up per source with one-division
    * milli fractions. Token n-gram share approximates Gopher's
    * character fraction on this uniform-word-length corpus; the
    * thresholds are the cited ones.
    *
    * The n-grams are built POSITIONALLY with transform(sequence(...))
    * over the token array — pure codegen map work, no self-join on
    * token position (the naive spelling shuffles the corpus once per
    * n; this shuffles only the per-(doc, gram) counts). Both gram
    * sizes ride one explode via a flattened struct array.
    *
    * Scale: per-doc gram counting is a (doc_id, gram)-keyed count with
    * map-side combine; everything after is doc-keyed then
    * source-keyed — state bounded by distinct grams per doc, never
    * cross-document. Exact int64 throughout; milli rates are p26
    * one-divisions.
    */
  def t24RepetitionAudit(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        expr(s"regexp_extract_all(text, '$TokenPattern', 0)").as("t"))
      .withColumn("n_tokens", size(col("t")).cast(LongType))
    val grams = toks.select(col("doc_id"), col("source"), col("n_tokens"),
      explode(expr(
        """flatten(array(
          |  CASE WHEN size(t) >= 2 THEN
          |    transform(sequence(0, size(t) - 2),
          |      i -> struct(2L AS g, concat_ws(' ', slice(t, i + 1, 2)) AS gram))
          |  ELSE array() END,
          |  CASE WHEN size(t) >= 3 THEN
          |    transform(sequence(0, size(t) - 3),
          |      i -> struct(3L AS g, concat_ws(' ', slice(t, i + 1, 3)) AS gram))
          |  ELSE array() END))""".stripMargin)).as("x"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("x.g").as("g"), col("x.gram").as("gram"))
    val per = grams
      .groupBy(col("doc_id"), col("source"), col("n_tokens"), col("g"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("source"), col("n_tokens"), col("g"))
      .agg(sum(col("cnt")).as("total"),
        sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dup"),
        max(col("cnt")).as("mx"))
    val docstats = per.groupBy(col("doc_id"), col("source"), col("n_tokens"))
      .agg(max(when(col("g") === 2, col("mx"))).as("mx2"),
        max(when(col("g") === 3, col("mx"))).as("mx3"),
        sum(when(col("g") === 2, col("dup")).otherwise(0L)).as("dup2"),
        sum(when(col("g") === 2, col("total")).otherwise(0L)).as("tot2"),
        sum(when(col("g") === 3, col("dup")).otherwise(0L)).as("dup3"),
        sum(when(col("g") === 3, col("total")).otherwise(0L)).as("tot3"))
      .withColumn("flag2",
        (col("mx2") * 2L * 100L >= col("n_tokens") * 20L).cast(LongType))
      .withColumn("flag3",
        (col("mx3") * 3L * 100L >= col("n_tokens") * 18L).cast(LongType))
    docstats.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("flag2")).as("n_flag_top2"),
        sum(col("flag3")).as("n_flag_top3"),
        sum(when(col("flag2") + col("flag3") >= 1L, 1L).otherwise(0L)).as("n_flag_any"),
        sum(col("dup2")).as("sum_dup2"), sum(col("tot2")).as("sum_tot2"),
        sum(col("dup3")).as("sum_dup3"), sum(col("tot3")).as("sum_tot3"))
      .select(col("source"), col("n_docs"),
        col("n_flag_top2"), col("n_flag_top3"), col("n_flag_any"),
        floor(col("sum_dup2").cast(DoubleType) / col("sum_tot2").cast(DoubleType) * 1e3)
          .cast(LongType).as("dup2_milli"),
        floor(col("sum_dup3").cast(DoubleType) / col("sum_tot3").cast(DoubleType) * 1e3)
          .cast(LongType).as("dup3_milli"))
      .orderBy(col("source"))
  }

  /** Identical positional n-gram construction, integer thresholds, and
    * one-division milli rates. */
  val t24Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, regexp_extract_all(text, '$TokenPattern') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens, 2 AS g,
       |    unnest(CASE WHEN len(t) >= 2 THEN
       |      list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
       |      ELSE [] END) AS gram
       |  FROM toks
       |  UNION ALL
       |  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens, 3 AS g,
       |    unnest(CASE WHEN len(t) >= 3 THEN
       |      list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
       |      ELSE [] END) AS gram
       |  FROM toks),
       |cnt AS (
       |  SELECT doc_id, source, n_tokens, g, gram, COUNT(*) AS c
       |  FROM grams GROUP BY 1, 2, 3, 4, 5),
       |per AS (
       |  SELECT doc_id, source, n_tokens, g,
       |    CAST(SUM(c) AS BIGINT) AS total,
       |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup,
       |    MAX(c) AS mx
       |  FROM cnt GROUP BY 1, 2, 3, 4),
       |docstats AS (
       |  SELECT doc_id, source, n_tokens,
       |    MAX(CASE WHEN g = 2 THEN mx END) AS mx2,
       |    MAX(CASE WHEN g = 3 THEN mx END) AS mx3,
       |    CAST(SUM(CASE WHEN g = 2 THEN dup ELSE 0 END) AS BIGINT) AS dup2,
       |    CAST(SUM(CASE WHEN g = 2 THEN total ELSE 0 END) AS BIGINT) AS tot2,
       |    CAST(SUM(CASE WHEN g = 3 THEN dup ELSE 0 END) AS BIGINT) AS dup3,
       |    CAST(SUM(CASE WHEN g = 3 THEN total ELSE 0 END) AS BIGINT) AS tot3
       |  FROM per GROUP BY 1, 2, 3),
       |flagged AS (
       |  SELECT *,
       |    CASE WHEN mx2 * 2 * 100 >= n_tokens * 20 THEN 1 ELSE 0 END AS flag2,
       |    CASE WHEN mx3 * 3 * 100 >= n_tokens * 18 THEN 1 ELSE 0 END AS flag3
       |  FROM docstats)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(flag2) AS BIGINT) AS n_flag_top2,
       |  CAST(SUM(flag3) AS BIGINT) AS n_flag_top3,
       |  CAST(SUM(CASE WHEN flag2 + flag3 >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_any,
       |  CAST(FLOOR(CAST(SUM(dup2) AS DOUBLE) / CAST(SUM(tot2) AS DOUBLE) * 1e3) AS BIGINT) AS dup2_milli,
       |  CAST(FLOOR(CAST(SUM(dup3) AS DOUBLE) / CAST(SUM(tot3) AS DOUBLE) * 1e3) AS BIGINT) AS dup3_milli
       |FROM flagged GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t24_repetition_audit" -> (t24RepetitionAudit _),
    "t23_oov_rate" -> (t23OovRate _),
    "t22_domain_divergence" -> (t22DomainDivergence _),
    "t21_vocab_growth" -> (t21VocabGrowth _),
    "t20_perplexity_buckets" -> (t20PerplexityBuckets _),
    "t19_cdc_chunking" -> (t19CdcChunking _),
    "t18_readability" -> (t18Readability _),
    "t17_compressibility" -> (t17Compressibility _),
    "t15_zipf_spectrum" -> (t15ZipfSpectrum _),
    "t14_boilerplate" -> (t14Boilerplate _),
    "t13_quality_gate" -> (t13QualityGate _),
    "t16_pmi_collocations" -> (t16PmiCollocations _),
    "t12_ngram_novelty" -> (t12NgramNovelty _),
    "t11_pii_redact" -> (t11PiiRedact _),
    "t10_lm_score" -> (t10LmScore _),
    "t09_bm25" -> (t09Bm25 _),
    "t08_decontaminate" -> (t08Decontaminate _),
    "t07_heavy_hitters" -> (t07HeavyHitters _),
    "t05_bpe_tokens" -> (t05BpeTokens _),
    "t01_doc_stats" -> (t01DocStats _),
    "t02_lang_id" -> (t02LangId _),
    "t03_quality_score" -> (t03QualityScore _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t06_repetition" -> (t06Repetition _))

  // def, not val: t17Sql embeds the Sidecars.oracleDir-keyed path, which
  // Verify pins at runtime before dumping oracle_sql.json
  def oracle: Map[String, String] = Map(
    "t24_repetition_audit" -> t24Sql,
    "t23_oov_rate" -> t23Sql,
    "t22_domain_divergence" -> t22Sql,
    "t21_vocab_growth" -> t21Sql,
    "t20_perplexity_buckets" -> t20Sql,
    "t17_compressibility" -> t17Sql,
    "t19_cdc_chunking" -> t19Sql,
    "t18_readability" -> t18Sql,
    "t16_pmi_collocations" -> t16Sql,
    "t15_zipf_spectrum" -> t15Sql,
    "t14_boilerplate" -> t14Sql,
    "t13_quality_gate" -> t13Sql,
    "t12_ngram_novelty" -> t12Sql,
    "t11_pii_redact" -> t11Sql,
    "t10_lm_score" -> t10Sql,
    "t09_bm25" -> t09Sql,
    "t08_decontaminate" -> t08Sql,
    "t07_heavy_hitters" -> t07Sql,
    "t06_repetition" -> t06Sql,
    "t05_bpe_tokens" -> t05Sql,
    "t01_doc_stats" -> t01Sql,
    "t02_lang_id" -> t02Sql,
    "t03_quality_score" -> t03Sql,
    "t04_fingerprint" -> t04Sql)
}
