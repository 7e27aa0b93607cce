package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Trained document classification — the supervised complement of the
  * n-gram lang_id heuristic (reference analog: the quality/language
  * filtering stage every training-data pipeline runs; the public
  * method is the fastText linear classifier of Joulin et al. '16 —
  * model-free here, so the classical multinomial Naive Bayes of
  * McCallum & Nigam AAAI'98 stands in: same bag-of-words features,
  * closed-form training, no gradient loop).
  *
  * Training IS aggregation: per-(class, token) counts, per-class token
  * totals, per-class document priors, and the training vocabulary size
  * — all one groupBy pass over the train split. Scoring is
  *
  *   score(d, c) = ln P(c) + Σ_{t ∈ d} tf(t,d) · ln((cnt(c,t)+1) / (tot(c)+V))
  *
  * with add-1 (Laplace) smoothing; out-of-vocabulary test tokens drop
  * (the standard convention). Every ln() argument is a ratio of exact
  * integers; per-token contributions round to 9dp and accumulate in
  * DECIMAL so per-document scores are addition-order-free
  * cross-engine; argmax ties break on ascending class label.
  *
  * Scale (100 TB): the count model is class-conditional aggregate
  * state — |vocab|·|classes| rows, shuffled once at training. Scoring
  * shuffles test tokens joined against that model on the token key
  * (never corpus × corpus); the class dimension multiplies the
  * token stream by |classes| (small constant); the argmax window
  * partitions by document (|classes| rows per partition). The one-row
  * frames (vocabulary size, corpus doc count) broadcast.
  */
object Classify {

  /** Train multinomial NB on `train` and classify `test`. Both frames
    * need all three of (idCol, textCol, labelCol): train's label is
    * the supervision signal, test's label is the ground truth behind
    * the output's `correct` flag — a test frame lacking labelCol
    * fails at analysis. Output: (id, label, predicted, correct 0/1)
    * per test document.
    */
  def naiveBayes(train: DataFrame, test: DataFrame,
                 idCol: String, textCol: String, labelCol: String,
                 tokensOf: org.apache.spark.sql.Column =>
                   org.apache.spark.sql.Column = TextOps.tokens): DataFrame = {
    val pred = classify(train, test, idCol, textCol, labelCol, tokensOf)
    test.select(F.col(idCol).as("id"), F.col(labelCol).as("label"))
      .join(pred, "id")
      .select(F.col("id"), F.col("label"), F.col("predicted"),
        F.when(F.col("predicted") === F.col("label"), 1).otherwise(0).as("correct"))
  }

  /** Train on `train` (needs labelCol) and predict for every `docs`
    * row (needs only idCol/textCol — no ground truth required).
    * Output: (id, predicted), one row per docs row; all-OOV documents
    * get the prior-argmax fallback. The label-free half of
    * [[naiveBayes]], and the scoring engine behind [[nbFilter]].
    */
  def classify(train: DataFrame, docs: DataFrame,
               idCol: String, textCol: String, labelCol: String,
               tokensOf: org.apache.spark.sql.Column =>
                 org.apache.spark.sql.Column = TextOps.tokens): DataFrame = {
    // fail fast on a degenerate seed set: zero training rows means
    // zero classes, which would make the prior-fallback crossJoin
    // collapse EVERY docs row to nothing — downstream nbFilter would
    // then silently wipe the corpus, the worst failure mode a
    // curation filter can have. (All-empty-token training is fine:
    // classes root at the document priors, so smoothing + the prior
    // argmax still classify.) The probe is a limit-1 job on the seed
    // frame — driver-small by contract.
    require(!train.isEmpty,
      "classify: empty training frame — zero classes would silently drop every document")
    val tr = train.select(F.col(idCol).as("id"), F.col(labelCol).as("label"),
      tokensOf(F.col(textCol)).as("tl"))
    val te = docs.select(F.col(idCol).as("id"),
      tokensOf(F.col(textCol)).as("tl"))

    // the model: per-(class, token) counts, class totals, priors, |V|
    val trTok = tr.select(F.col("label"), F.explode(F.col("tl")).as("tok"))
    val cnt = trTok.groupBy("label", "tok").agg(F.count(F.lit(1)).as("cnt"))
    val tot = cnt.groupBy("label").agg(F.sum("cnt").as("tot"))
    val vocabSize = cnt.select("tok").distinct()
      .agg(F.count(F.lit(1)).as("v"))
    val priors = tr.groupBy("label").agg(F.count(F.lit(1)).as("n_docs"))
    val nTotal = tr.agg(F.count(F.lit(1)).as("n_all"))
    // classes frame: label, tot, prior contribution (9dp decimal) —
    // |classes| rows, broadcast everywhere below. Rooted at priors
    // (every TRAINED class, left-joined to token totals with tot=0
    // when absent) so a class whose documents all tokenize to empty
    // still scores via smoothing and participates in the prior-argmax
    // fallback, instead of silently dropping out of the model
    val classes = priors.join(tot, Seq("label"), "left")
      .na.fill(0L, Seq("tot")).crossJoin(nTotal)
      .select(F.col("label").as("cl"), F.col("tot"),
        F.round(F.log(F.col("n_docs").cast("double") / F.col("n_all").cast("double")), 9)
          .cast("decimal(20,9)").as("prior_c"))

    // test term frequencies, restricted to the training vocabulary
    val vocab = cnt.select("tok").distinct()
    val teTf = te.select(F.col("id"), F.explode(F.col("tl")).as("tok"))
      .groupBy("id", "tok").agg(F.count(F.lit(1)).as("tf"))
      .join(vocab, "tok")

    // per-(doc, class, token) smoothed log-likelihood contributions
    val contrib = teTf
      .crossJoin(F.broadcast(classes))
      .join(cnt.withColumnRenamed("label", "cl"), Seq("cl", "tok"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(F.broadcast(vocabSize))
      .withColumn("c", F.round(F.col("tf") *
        F.log((F.col("cnt") + F.lit(1)).cast("double") /
          (F.col("tot") + F.col("v")).cast("double")), 9).cast("decimal(20,9)"))

    val scored = contrib.groupBy("id", "cl")
      .agg(F.sum("c").as("ll"))
      .join(F.broadcast(classes.select("cl", "prior_c")), "cl")
      .withColumn("score", F.col("ll") + F.col("prior_c"))
    val w = Window.partitionBy("id")
      .orderBy(F.col("score").desc, F.col("cl").asc)
    val pred = scored.withColumn("rk", F.row_number().over(w))
      .where(F.col("rk") === 1)
      .select(F.col("id"), F.col("cl").as("predicted"))

    // a doc with zero in-vocabulary tokens scores every class by its
    // prior alone — the argmax-prior class (ties on label asc)
    val topPrior = classes.orderBy(F.col("prior_c").desc, F.col("cl").asc)
      .limit(1).select(F.col("cl").as("fallback"))
    te.select("id").join(pred, Seq("id"), "left")
      .crossJoin(F.broadcast(topPrior))
      .select(F.col("id"),
        F.coalesce(F.col("predicted"), F.col("fallback")).as("predicted"))
  }

  /** Model-based corpus filtering — the classifier-driven curation
    * stage a training-data pipeline runs after heuristics (the public
    * pattern is a fastText quality classifier gating the crawl;
    * Joulin '16 / the quality-filter stage in Rae et al.'s Gopher and
    * Brown et al.'s GPT-3 data work): train NB on a labeled seed set,
    * score EVERY corpus document, keep those predicted `keepLabel`.
    * Returns the kept documents' original rows (all `docs` columns).
    *
    * Scale: scoring is [[classify]] — |vocab|·|classes| model state
    * joined on the token key, never corpus×corpus; the keep set
    * applies as a semi-join of predictions back to the corpus on the
    * id, so document payloads move only for kept rows.
    */
  def nbFilter(train: DataFrame, docs: DataFrame,
               idCol: String, textCol: String, labelCol: String,
               keepLabel: String): DataFrame = {
    val keep = classify(train, docs, idCol, textCol, labelCol)
      .where(F.col("predicted") === keepLabel)
      .select(F.col("id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }
}
