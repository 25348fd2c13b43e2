package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Multinomial naive Bayes over HASHED token features (ml17) — the
  * generative multiclass sibling of t27's discriminative binary filter:
  * predict a document's class (here: language) from its tokens with
  * Laplace-smoothed per-class token likelihoods and log-prior class
  * mass. The fastText/NB text-classification baseline every corpus
  * router starts from.
  *
  * Scale shape, stage by stage:
  *  1. tokens hash into B buckets (ml10's 48-bit md5 prefix — no
  *     vocabulary dictionary, no global distinct, scan speed);
  *  2. the MODEL is the dense (class × bucket) log-likelihood table
  *     w_{c,b} = ln((cnt_{c,b}+1)/(tok_c+B)) plus per-class log-priors
  *     ln(n_c/N) — C·B rows from ONE partial-aggregatable count pass
  *     over the training split; it broadcasts at any corpus size;
  *  3. SCORING is the sparse doc-bucket counts joined to the broadcast
  *     model: score(d,c) = lp_c + Σ_b c_{d,b}·w_{c,b} — multinomial NB
  *     ignores absent features, so only present buckets join;
  *  4. ARGMAX per doc over C rows via one bounded window.
  *
  * Determinism (the t27/ml12 discipline): ln-terms round once to 6 dp;
  * score terms round to 6 dp and sum as DECIMAL(38,6), so partial-sum
  * order is irrelevant and the argmax compares exact decimals, ties
  * broken by smallest class name. Train/test split is the t6
  * content-hash cut — RNG-free, partition-invariant, identical in both
  * engines. */
object NaiveBayes {

  /** (id, idx, c): hashed-bucket token counts per document. */
  private def docBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs
      .select(col(idCol), explode(TextAnalysis.tokens(
        TextAnalysis.normalized(col(textCol)))).as("tok"))
      .withColumn("idx", expr(
        s"CAST(conv(substring(md5(tok), 1, 12), 16, 10) AS BIGINT)" +
          s" % $buckets"))
      .groupBy(col(idCol), col("idx"))
      .agg(count(lit(1)).as("c"))

  /** Dense (cls, idx, w, lp) model from labeled docs. */
  def train(labeled: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", classCol: String = "cls",
      buckets: Int = 64): DataFrame = {
    // localCheckpoint: byClass (≤ C·B rows) feeds both the dense spine
    // join and the per-class totals — truncation keeps the corpus
    // tokenize+count pass from running twice
    val byClass = docBuckets(labeled.select(col(idCol), col(textCol)),
        idCol, textCol, buckets)
      .join(labeled.select(col(idCol), col(classCol).as("cls")), idCol)
      .groupBy(col("cls"), col("idx")).agg(sum(col("c")).as("cnt"))
      .localCheckpoint()
    val tokC = byClass.groupBy(col("cls")).agg(sum(col("cnt")).as("tok_c"))
    val nC = labeled.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_c"))
      .localCheckpoint()
    // total docs derived from the class counts — no second corpus scan
    val n = nC.agg(sum(col("n_c")).as("n"))
    val spine = nC.select(col("cls"))
      .select(col("cls"), explode(sequence(lit(0L),
        lit((buckets - 1).toLong))).as("idx"))
    spine
      .join(byClass, Seq("cls", "idx"), "left")
      .na.fill(0L, Seq("cnt"))
      .join(broadcast(tokC), Seq("cls"))
      .join(broadcast(nC), Seq("cls"))
      .crossJoin(broadcast(n))
      .select(col("cls"), col("idx"),
        round(log((col("cnt") + 1).cast("double") /
          (col("tok_c") + buckets).cast("double")), 6).as("w"),
        round(log(col("n_c").cast("double") / col("n").cast("double")),
          6).as("lp"))
  }

  /** (id, pred): argmax-class per scored document under `model`. */
  def predict(docs: DataFrame, model: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 64): DataFrame = {
    val scores = docBuckets(docs, idCol, textCol, buckets)
      .join(broadcast(model), Seq("idx"))
      .groupBy(col(idCol), col("cls"), col("lp"))
      .agg(sum(round(col("c") * col("w"), 6).cast("decimal(38,6)"))
        .as("ll"))
      .select(col(idCol),
        col("cls"), (col("ll") + col("lp").cast("decimal(38,6)"))
          .as("score"))
    scores
      .withColumn("rn", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(desc("score"), col("cls"))))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cls").as("pred"))
  }

  /** The ml17 harness shape: train on the t6 content-hash half of the
    * corpus, predict the held-out half, return the (cls, pred, n_docs)
    * confusion matrix. */
  def confusion(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", classCol: String = "cls",
      buckets: Int = 64): DataFrame = {
    val inTrain = substring(TextAnalysis.fingerprint(col(textCol)),
      1, 4) < lit("8000")
    val model = train(docs.filter(inTrain), idCol, textCol, classCol,
      buckets)
    val test = docs.filter(!inTrain)
    predict(test.select(col(idCol), col(textCol)), model, idCol,
      textCol, buckets)
      .join(test.select(col(idCol), col(classCol).as("cls")), idCol)
      .groupBy(col("cls"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("cls", "pred")
  }

  /** DuckDB twin of [[confusion]] over the `documents` table with
    * (doc_id, text) and a class column. */
  def confusionSql(classCol: String, buckets: Int = 64): String = {
    val norm = TextAnalysis.normalizedSql("text")
    s"""WITH base AS (SELECT doc_id, text, $classCol AS cls,
       |    substr(${TextAnalysis.fingerprintSql("text")}, 1, 4) < '8000'
       |      AS tr
       |  FROM documents),
       |toks AS (SELECT doc_id, cls, tr,
       |    unnest(regexp_split_to_array($norm, '\\s+')) AS tok
       |  FROM base),
       |db AS (SELECT doc_id, cls, tr,
       |    CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) % $buckets
       |      AS idx,
       |    count(*) AS c
       |  FROM toks GROUP BY 1, 2, 3, 4),
       |bc AS (SELECT cls, idx, CAST(sum(c) AS BIGINT) AS cnt
       |  FROM db WHERE tr GROUP BY 1, 2),
       |tc AS (SELECT cls, CAST(sum(cnt) AS BIGINT) AS tok_c
       |  FROM bc GROUP BY 1),
       |ncl AS (SELECT cls, CAST(count(*) AS BIGINT) AS n_c
       |  FROM base WHERE tr GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base WHERE tr),
       |spine AS (SELECT cls, CAST(i AS BIGINT) AS idx
       |  FROM ncl CROSS JOIN unnest(range(0, $buckets)) AS t(i)),
       |mdl AS (SELECT s.cls, s.idx,
       |    round(ln(CAST(coalesce(bc.cnt, 0) + 1 AS DOUBLE)
       |      / (tc.tok_c + $buckets)), 6) AS w,
       |    round(ln(CAST(ncl.n_c AS DOUBLE) / nn.n), 6) AS lp
       |  FROM spine s
       |  LEFT JOIN bc ON bc.cls = s.cls AND bc.idx = s.idx
       |  JOIN tc ON tc.cls = s.cls
       |  JOIN ncl ON ncl.cls = s.cls
       |  CROSS JOIN nn),
       |sc AS (SELECT db.doc_id, m.cls, m.lp,
       |    sum(CAST(round(db.c * m.w, 6) AS DECIMAL(38,6))) AS ll
       |  FROM db JOIN mdl m ON m.idx = db.idx
       |  WHERE NOT db.tr GROUP BY 1, 2, 3),
       |pr AS (SELECT doc_id, cls AS pred,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY ll + CAST(lp AS DECIMAL(38,6)) DESC, cls) AS rn
       |  FROM sc)
       |SELECT b.cls, p.pred, count(*) AS n_docs
       |FROM pr p JOIN base b USING (doc_id)
       |WHERE p.rn = 1 AND NOT b.tr
       |GROUP BY 1, 2 ORDER BY cls, pred"""
      .stripMargin.replace('\n', ' ')
  }
}
