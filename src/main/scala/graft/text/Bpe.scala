package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (t30, Sennrich et al. 2016) —
  * the tokenizer-vocabulary step of a training-data pipeline, trained
  * on-cluster: `merges` rounds of (count adjacent symbol pairs →
  * merge the most frequent pair corpus-wide), emitting the merge
  * table (round, l, r, merged, pair_count) that IS the learned
  * tokenizer.
  *
  * Scale design — the classic BPE trick, distributed: merges operate
  * on the (word → count) table, NOT the corpus. The corpus is
  * touched exactly once (tokenize → word counts, one
  * partial-aggregatable pass); every round after that is one
  * pair-count aggregate over the VOCABULARY-sized word table
  * (occurrences weighted by word count), a 1-row broadcast argmax,
  * and a scan-speed string replace. At 100 TB the vocabulary is
  * still ~10⁶ rows.
  *
  * Word representation: symbols joined with DOUBLE spaces, padded
  * with single spaces (" h  e  l  l  o "). That invariant makes
  * plain left-to-right string replace of ' l  r ' → ' lr '
  * EXACTLY the greedy BPE merge: each match consumes one space of
  * each flanking double gap, so adjacent occurrences ("a b a b")
  * still match back-to-back, while overlapping ones ("a a a" with
  * pair (a,a)) correctly merge left-first — and `replace` (not
  * regexp) means pair symbols never need regex escaping, so the
  * DuckDB twin replays every round verbatim. Determinism: counts are
  * exact integers; the argmax orders (count DESC, l, r) — a total
  * order; everything else is string equality. */
object Bpe {

  /** @return (round, l, r, merged, pair_count) — one row per merge,
    *         ordered by round */
  def trainMerges(docs: DataFrame, merges: Int = 8,
      textCol: String = "text"): DataFrame = {
    val words = docs
      .select(explode(TextAnalysis.tokens(
        TextAnalysis.normalized(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(col("w"), col("c"),
        concat(lit(" "),
          trim(regexp_replace(col("w"), "(.)", "$1  ")),
          lit(" ")).as("s"))
      .localCheckpoint()
    var cur = words
    val out = Seq.newBuilder[DataFrame]
    for (k <- 1 to merges) {
      // token array materialized behind a projection (the t23/HOF
      // rule); single-symbol words carry no pairs — and Spark's
      // sequence(1, 0) steps DOWNWARD rather than yielding empty, so
      // they must be filtered before the transform (DuckDB's
      // range(1, 1) is already empty)
      val withArr = cur.select(col("c"),
        split(trim(col("s")), "  ").as("a"))
        .filter(size(col("a")) >= 2)
      val pairs = withArr
        .select(col("c"), explode(transform(
          sequence(lit(1), size(col("a")) - 1),
          i => struct(element_at(col("a"), i).as("l"),
            element_at(col("a"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("cnt"))
      val best = pairs.orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1).localCheckpoint()
      out += best.select(lit(k.toLong).as("round"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"),
        col("cnt").as("pair_count"))
      val next = cur
        .crossJoin(broadcast(best.select(col("l").as("bl"),
          col("r").as("br"))))
        .select(col("w"), col("c"),
          expr("replace(s, concat(' ', bl, '  ', br, ' '), " +
            "concat(' ', bl, br, ' '))").as("s"))
        .localCheckpoint()
      // best is its own checkpoint (out survives this) and next is
      // materialized — the superseded corpus round is dead
      graft.util.Checkpoints.free(cur)
      cur = next
    }
    graft.util.Checkpoints.free(cur) // the merge list is the result
    out.result().reduce(_.unionAll(_)).orderBy("round")
  }

  /** Re-tokenize the corpus words under an already-trained merge
    * list applied in order — the APPLY side of BPE (what the
    * tokenizer does at training-data-prep time). Returns
    * (w, c, symbols). */
  def applyMerges(docs: DataFrame, mergeList: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val words = docs
      .select(explode(TextAnalysis.tokens(
        TextAnalysis.normalized(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(col("w"), col("c"),
        concat(lit(" "),
          trim(regexp_replace(col("w"), "(.)", "$1  ")),
          lit(" ")).as("s"))
    val merged = mergeList.foldLeft(words) { case (df, (l, r)) =>
      df.withColumn("s",
        expr(s"replace(s, concat(' ', '$l', '  ', '$r', ' '), " +
          s"concat(' ', '$l$r', ' '))"))
    }
    merged.select(col("w"), col("c"),
      split(trim(col("s")), "  ").as("symbols"))
  }

  /** DuckDB twin of [[trainMerges]] over `documents` — every round
    * MATERIALIZED (plain CTEs inline per reference and the round
    * chain would re-expand exponentially). */
  def trainMergesSql(merges: Int = 8): String = {
    val toks = TextAnalysis.tokensSql(TextAnalysis.normalizedSql("text"))
    val pre =
      s"""wc AS MATERIALIZED (SELECT w, count(*) AS c FROM
         |  (SELECT unnest($toks) AS w FROM documents) GROUP BY w),
         |w0 AS MATERIALIZED (SELECT w, c,
         |  ' ' || trim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' '
         |    AS s FROM wc)""".stripMargin.replace('\n', ' ')
    val rounds = (1 to merges).map { k =>
      s"""p$k AS MATERIALIZED (SELECT a[i] AS l, a[i + 1] AS r,
         |    CAST(sum(c) AS BIGINT) AS cnt
         |  FROM (SELECT c, str_split(trim(s), '  ') AS a
         |    FROM w${k - 1}) t, unnest(range(1, len(a))) u(i)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |w$k AS MATERIALIZED (SELECT w, c,
         |  replace(s, ' ' || l || '  ' || r || ' ',
         |    ' ' || l || r || ' ') AS s
         |  FROM w${k - 1} CROSS JOIN b$k)"""
        .stripMargin.replace('\n', ' ')
    }.mkString(", ")
    val sel = (1 to merges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS round, l, r,
         |  l || r AS merged, cnt AS pair_count FROM b$k"""
        .stripMargin.replace('\n', ' ')
    }.mkString(" UNION ALL ")
    s"WITH $pre, $rounds $sel ORDER BY round"
  }
}
