package graft.text

/**
 * DuckDB oracle-SQL fragments for the [[TextOps]] operators, generated from
 * the SAME constants (HashMod/HashBase/hashParams/stopword sets), so the
 * Spark result and the oracle agree structurally: every hash is modular
 * integer math, every double is an int division or a fixed-order sum —
 * bit-exact in both engines.
 */
object TextSql {
  import TextOps._

  /** Lowercase word tokens of an expression. */
  def tokens(e: String): String =
    s"regexp_extract_all(lower($e), '[a-z0-9]+')"

  def tokenCountRegex(e: String): String =
    s"len(regexp_extract_all($e, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))::BIGINT"

  /** Char-level rolling hash: list_reduce with a prepended 0 accumulator. */
  def rollingHash(e: String): String =
    s"""list_reduce(
       |  list_prepend(0::BIGINT,
       |    list_transform(string_split($e, ''), ch -> unicode(ch)::BIGINT)),
       |  (h, c) -> (h * $HashBase + c) % $HashMod)""".stripMargin

  private def sqlList(xs: Seq[String]): String = xs.mkString("[", ", ", "]")
  private def strList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("[", ", ", "]")

  /** Language-ID CASE chain matching [[TextOps.langId]] (toks = a token
   *  list expression; emitted as a single scalar expression). */
  def langId(toks: String): String = {
    val counts = LangStopwords.map { case (lang, words) =>
      lang -> s"len(list_filter($toks, t -> list_contains(${strList(words)}, t)))::BIGINT"
    }
    val maxExpr = s"greatest(${counts.map(_._2).mkString(", ")})"
    val chain = counts.foldRight("'und'") { case ((lang, c), els) =>
      s"CASE WHEN $c = __mx THEN '$lang' ELSE $els END"
    }
    // bind the max once via a lambda-let (list_transform over a 1-list)
    s"""(list_transform([$maxExpr], __mx ->
       |  CASE WHEN __mx = 0 THEN 'und' ELSE $chain END))[1]""".stripMargin
  }

  /** Quality columns matching [[TextOps.qualityColumns]]; returns the SELECT
   *  fragments (same aliases, same evaluation order). `t` = text expr. */
  def qualityColumns(t: String): Seq[(String, String)] = {
    val toks = tokens(t)
    val enStop = strList(LangStopwords.head._2)
    val nChars = s"length($t)::BIGINT"
    val nToks = s"len($toks)::BIGINT"
    val sumLen = s"coalesce(list_sum(list_transform($toks, x -> length(x)::BIGINT)), 0)::BIGINT"
    val meanLen = s"CASE WHEN $nToks > 0 THEN $sumLen::DOUBLE / $nToks::DOUBLE ELSE 0.0 END"
    val stopR = s"CASE WHEN $nToks > 0 THEN len(list_filter($toks, x -> list_contains($enStop, x)))::DOUBLE / $nToks::DOUBLE ELSE 0.0 END"
    val nPunct = s"len(regexp_extract_all($t, '[^A-Za-z0-9\\s]'))::BIGINT"
    val punctR = s"CASE WHEN $nChars > 0 THEN $nPunct::DOUBLE / $nChars::DOUBLE ELSE 0.0 END"
    val score = s"least($nToks::DOUBLE / 100.0, 1.0) * 0.25 + ($stopR) * 0.25 + (1.0 - ($punctR)) * 0.25 + least(($meanLen) / 8.0, 1.0) * 0.25"
    Seq("n_chars" -> nChars, "n_tokens" -> nToks, "mean_token_len" -> meanLen,
      "stopword_ratio" -> stopR, "punct_ratio" -> punctR, "quality" -> score)
  }

  /** SimHash matching [[TextOps.simhash]] over token list expr `toks`. */
  def simhash(toks: String): String = {
    val hashes = s"list_transform($toks, __t -> ${rollingHash("__t")})"
    val bits = (0 until SimHashBits).map { b =>
      s"""CASE WHEN coalesce(list_sum(list_transform(__hs, h ->
         |  CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
         |  THEN ${1L << b}::BIGINT ELSE 0::BIGINT END""".stripMargin
    }
    s"(list_transform([$hashes], __hs -> ${bits.mkString(" + ")}))[1]"
  }

  /** k-shingle strings over token list expr. */
  def shingles(toks: String, k: Int = 3): String =
    s"""CASE WHEN len($toks) >= $k
       |  THEN list_transform(range(1, len($toks) - ${k - 1} + 1),
       |         i -> array_to_string(($toks)[i:i+${k - 1}], ' '))
       |  ELSE [array_to_string($toks, ' ')] END""".stripMargin

  def shingleHashes(toks: String, k: Int = 3): String =
    s"list_distinct(list_transform(${shingles(toks, k)}, __s -> ${rollingHash("__s")}))"

  /** MinHash signature list matching [[TextOps.minhashSignature]]. */
  def minhashSignature(shingleHs: String): String =
    sqlList(hashParams(NumHashes).map { case (a, b) =>
      s"list_min(list_transform($shingleHs, h -> (h * $a + $b) % $HashMod))"
    })

  /** Band hash list matching [[TextOps.bandHashes]] over sig list expr. */
  def bandHashes(sig: String): String =
    sqlList((0 until NumBands).map { band =>
      (0 until BandRows).foldLeft("0::BIGINT") { (acc, r) =>
        s"(($acc) * $BandBase + ($sig)[${band * BandRows + r + 1}]) % $HashMod"
      }
    })

  /** Near-dup connected-components CTE chain over [[signaturesCte]]'s
   *  candidates: `__jac` = verified pairs at `minJaccard` (the oracle
   *  analog of [[TextOps.jaccardPairs]]), `__reach` = recursive min-label
   *  reachability, `__comp` = (id, component = min id of the cluster) —
   *  exactly [[TextOps.connectedComponents]]'s contract. The enclosing
   *  query must open with `WITH RECURSIVE`. */
  /** Verified near-dup pairs CTE (`__jac`: id_a, id_b) over
   *  [[signaturesCte]]'s candidates at `minJaccard` — the oracle analog of
   *  [[TextOps.jaccardPairs]]'s (id_a < id_b) output. */
  def jaccardCte(minJaccard: Double): String =
    s"""__jac AS (
       |  SELECT c.id_a, c.id_b
       |  FROM __cands c
       |  JOIN __sigs a ON c.id_a = a.id
       |  JOIN __sigs b ON c.id_b = b.id
       |  WHERE len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))::DOUBLE
       |     / (len(a.shingles) + len(b.shingles)
       |        - len(list_filter(a.shingles, x -> list_contains(b.shingles, x))))::DOUBLE
       |    >= $minJaccard
       |)""".stripMargin

  def componentsCte(minJaccard: Double): String =
    s"""${jaccardCte(minJaccard)},
       |__edges AS (
       |  SELECT id_a AS a, id_b AS b FROM __jac
       |  UNION SELECT id_b, id_a FROM __jac
       |),
       |__reach(id, comp) AS (
       |  SELECT a, a FROM __edges
       |  UNION
       |  SELECT e.a, r.comp FROM __edges e JOIN __reach r ON e.b = r.id
       |),
       |__comp AS (
       |  SELECT id, min(comp) AS component FROM __reach GROUP BY id
       |)""".stripMargin

  /** Per-doc signatures CTE over `documents` (id, shingles, sig, bands) —
   *  the oracle analog of [[TextOps.signatures]]. */
  def signaturesCte(table: String = "documents", textCol: String = "text",
      idCol: String = "doc_id", k: Int = 3): String =
    s"""__sigs AS (
       |  SELECT $idCol AS id, __sh AS shingles,
       |         ${minhashSignature("__sh")} AS sig
       |  FROM (SELECT $idCol, ${shingleHashes(tokens(textCol), k)} AS __sh
       |        FROM $table)
       |),
       |__bands AS (
       |  SELECT id, ${bandHashes("sig")} AS bands FROM __sigs
       |),
       |__bt AS (
       |  SELECT id, i - 1 AS band_idx, bands[i] AS band_hash
       |  FROM __bands, (SELECT unnest(range(1, $NumBands + 1)) AS i)
       |),
       |__cands AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS n_bands
       |  FROM __bt a JOIN __bt b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.id < b.id
       |  GROUP BY 1, 2
       |)""".stripMargin
}
