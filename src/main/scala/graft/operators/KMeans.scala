package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorOps

/** Distributed k-means codebook training (Lloyd's iterations, cosine
  * assignment) — the trainer behind [[Similarity.ivfTopK]]'s codebook:
  * partition 100 TB of embeddings into inverted lists by learned
  * centroids instead of the lowest-id stand-ins.
  *
  * Scale shape per iteration: assignment is a pure map-side projection
  * (the ≤256-centroid codebook is baked into the plan as literals, the
  * `ivfTopK` idiom — a codebook IS a small learned model, and shipping
  * it with the plan is how a trained model broadcasts); the update is
  * posexplode → ONE partially-combined aggregate on (centroid, dim) —
  * k·dim result rows regardless of corpus size. The corpus is scanned
  * once per iteration and never shuffled; only the k·dim means cross
  * the wire back to the driver (bounded model state, the legitimate
  * collect).
  *
  * Determinism & portability: seeds are the k lowest-id vectors
  * (relabeled 0..k-1 in id order); assignment breaks score ties toward
  * the lowest centroid id; and each updated component is
  * portableRound6(decimalSum(portableRound6(x)) / n) cast to float
  * (meanVectors' kernel — portableRound6, not built-in round, since
  * the r9 ROUND-tie incident) — every step a correctly-rounded IEEE
  * op, an exact decimal sum, or an exact floor, so an external
  * engine (the DuckDB oracle) replays the whole training run
  * bit-for-bit. The 6-place quantization of means is the documented
  * price of engine-portable training; it perturbs centroids by < 1e-6
  * per iteration, far below the movement k-means itself makes.
  *
  * The corpus is read once per iteration — inherent to Lloyd's — so
  * callers training many iterations over a remote store should persist
  * (or cache to local SSD) the (id, vec) projection first; the trainer
  * itself stays storage-agnostic.
  *
  * Cosine ("spherical") assignment suits unit-ish embedding corpora;
  * means are deliberately NOT re-normalized — normalization scales a
  * centroid without changing any cosine, so assignments are identical
  * and skipping it keeps the oracle SQL one step simpler. A cluster
  * that loses all members keeps its previous centroid.
  */
object KMeans {

  /** Train and return the codebook as (centroid_id, vec) pairs,
    * centroid_id in [0, k).
    */
  def fit(corpus: DataFrame, k: Int, iters: Int): Array[(Long, Array[Float])] = {
    require(k > 0 && k <= 256, s"k must be in [1, 256], got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    var codebook: Array[(Long, Array[Float])] = corpus
      .orderBy(col("id")).limit(k)
      .select(col("vec")).collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](0).toArray) }
    require(codebook.length == k,
      s"corpus has only ${codebook.length} rows, need k = $k seeds")

    for (_ <- 0 until iters) {
      val code = codebook.map { case (cid, v) =>
        // Same left-to-right double fold as FloatVecNormSq / the oracle.
        var s = 0.0
        v.foreach(x => s += x.toDouble * x.toDouble)
        (cid, v, math.sqrt(s))
      }
      def scoreTo(cv: Array[Float], cn: Double): Column =
        VectorOps.guardCos(try_divide(
          VectorOps.dot(col("vec"), typedlit(cv)), col("_n") * lit(cn)))
      // per-row corruption guard, free until it fires (codegen'd
      // conditional): a stray vector of the wrong length would
      // otherwise NULL its dots, guardCos-pin its score to -2, land in
      // centroid 0, and SKEW that centroid's short positions silently
      // — ProductQuant.requireDim calls the outcome
      // "plausible-looking garbage"; here the corpus never collects,
      // so the check rides the assignment scan instead of a probe.
      // NULL/NaN/Inf ELEMENTS are the same class one level down: a
      // null element NULLs every dot (score -2, centroid 0) and then
      // inflates meanVectors' count while its sum skips the null —
      // silent codebook bias — and a NaN/Inf element reaches
      // meanVectors' decimal cast, which ANSI-kills the whole training
      // job at the UPDATE step instead of naming the corrupt row here.
      // (All-ZERO vectors stay legal: they deterministically join the
      // tie-break centroid — filter upstream if unwanted.)
      val dim = codebook.head._2.length
      // the NULL-VEC guard rides the vec column ITSELF, not the score
      // chain: size(NULL) is NULL so neither sibling condition fires,
      // and a guard only on the score column never evaluates — the
      // update step explodes vec, the optimizer hoists the Generate
      // above the projection, and a NULL array emits zero rows BEFORE
      // the score is computed (probed; the row silently vanished from
      // training). Guarding the exploded column forces evaluation per
      // input row.
      val guardedVec = when(col("vec").isNull,
        raise_error(lit("KMeans: NULL vector in training corpus"))
          .cast("array<float>"))
        .otherwise(col("vec"))
      val assigned = corpus
        .select(guardedVec.as("vec"), VectorOps.norm(col("vec")).as("_n"))
        .select(col("vec"),
          when(size(col("vec")) =!= dim,
            raise_error(concat(lit("KMeans: vector of dimension "),
              size(col("vec")).cast("string"),
              lit(s" in a $dim-dimensional corpus"))))
            .when(exists(col("vec"), x =>
                x.isNull || !x.between(-Float.MaxValue, Float.MaxValue)),
              raise_error(lit(
                "KMeans: vector with null/NaN/Inf element in training corpus")))
            .otherwise(
              array_max(array(code.toIndexedSeq.map { case (cid, cv, cn) =>
                struct(scoreTo(cv, cn).as("s"), lit(-cid).as("negc"))
              }: _*))).as("best"))
        .select(col("vec"), (-col("best.negc")).as("cid"))
      // the update step IS VectorAgg.meanVectors (its doc: "the KMeans
      // update-step shape, exposed as a standalone operator") — one
      // definition of the oracle-parity decimal-mean kernel, so a
      // rounding fix cannot desync the two bit-for-bit replays
      val means = VectorAgg.meanVectors(assigned, "cid", "vec")
        .select(col("cid"), col("pos"), col("comp"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rs) =>
          cid -> rs.sortBy(_.getInt(1)).map(_.getFloat(2)).toArray
        }
      codebook = codebook.map { case (cid, prev) =>
        (cid, means.getOrElse(cid, prev)) // empty cluster keeps its centroid
      }
    }
    codebook
  }

  /** [[fit]] flattened to a (centroid_id, pos, component) DataFrame —
    * the shape an oracle checks element-by-element and a warehouse
    * stores alongside the corpus it indexes.
    */
  def fitDF(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    fit(corpus, k, iters)
      .flatMap { case (cid, v) =>
        v.zipWithIndex.map { case (x, p) => (cid, p, x) }
      }.toSeq.toDF("centroid_id", "pos", "component")
  }
}
