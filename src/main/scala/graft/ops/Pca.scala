package graft.ops

import graft.core.Observations._
import graft.model.{Parameters, ProcessingType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Principal-component analysis over d aligned series — the engine's
  * DIMENSIONALITY_REDUCTION operator beyond the reference's row-wise
  * average (/root/reference/src/meteaudata/processing_steps/multivariate/
  * average.py:33 is the only operator the reference ships in that
  * category; types.py:192 declares the enum value).
  *
  * 100 TB shape — the classic tall-skinny split:
  *  - ONE distributed pass accumulates n, Σxᵢ, Σxᵢxⱼ (i ≤ j) as exact
  *    DECIMAL(38,6) sums over the ts-aligned wide frame: a single hash
  *    aggregate with map-side partials, O(d²) accumulators, no shuffle
  *    beyond the alignment aggregate — row count never reaches the driver;
  *  - the d×d eigensolve is O(d³) DRIVER work on a tiny matrix (d =
  *    #series, not #rows) — the legitimate driver-side step, like the
  *    k-means trainer in ext/Similarity.
  * The decimal accumulation makes the scatter sums bit-identical under any
  * partitioning, so the eigensolve input (and thus the output) is
  * deterministic.
  */
object Pca {

  final case class Model(n: Long, keys: Seq[String], mean: Array[Double],
      cov: Array[Array[Double]], eigenValues: Array[Double],
      eigenVectors: Array[Array[Double]])

  /** ts-aligned wide frame: one row per timestamp carrying every key's
    * value (inner alignment — rows where any series is missing drop, the
    * same discipline as CrossStats.correlation). One hash aggregate. */
  def aligned(obs: DataFrame, keys: Seq[String]): DataFrame = {
    val agg = keys.zipWithIndex.map { case (k, i) =>
      max(when(col(KeyCol) === k, col(ValueCol))).as(s"_c$i")
    }
    obs.where(col(KeyCol).isin(keys: _*))
      .groupBy(col(TsCol))
      .agg(agg.head, agg.tail: _*)
      .na.drop(keys.indices.map(i => s"_c$i").toSeq)
  }

  /** Fit: one distributed scatter pass + driver eigensolve (see object
    * doc). Covariances use the fixed float shape
    * `(Σxy − Σx·Σy/n) / (n−1)` so results are engine-portable. */
  def fit(obs: DataFrame, keys: Seq[String]): Model = {
    val d = keys.size
    val wide = aligned(obs, keys)
    val dec: Column => Column = c => c.cast(DecimalType(38, 6))
    val sums =
      keys.indices.map(i => sum(dec(col(s"_c$i"))).cast("double").as(s"_s$i")) ++
      (for (i <- keys.indices; j <- i until d)
        yield sum(dec(col(s"_c$i") * col(s"_c$j"))).cast("double").as(s"_p${i}_$j"))
    val row = wide.agg(count(lit(1)).as("_n"), sums: _*).head()
    val n = row.getAs[Long]("_n")
    require(n > 1, s"PCA needs >= 2 aligned rows, got $n")
    val s = keys.indices.map(i => row.getAs[Double](s"_s$i")).toArray
    val mean = s.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      (row.getAs[Double](s"_p${a}_$b") - s(a) * s(b) / n) / (n - 1)
    }
    val (lam, vec) = eigenSym(cov)
    Model(n, keys, mean, cov, lam, vec)
  }

  /** Cyclic Jacobi eigensolver for a symmetric d×d matrix: eigenvalues
    * descending, eigenvectors row-per-component, sign fixed so each
    * vector's largest-magnitude entry is positive (deterministic basis). */
  def eigenSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    def off(): Double =
      (for (i <- 0 until d; j <- i + 1 until d) yield a(i)(j) * a(i)(j)).sum
    while (off() > 1e-24 && sweep < 100) {
      sweep += 1
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val sn = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - sn * akq
          a(k)(q) = sn * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - sn * aqk
          a(q)(k) = sn * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - sn * vkq
          v(k)(q) = sn * vkp + c * vkq
        }
      }
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val lam = order.map(i => a(i)(i)).toArray
    val vec = order.map { i =>
      val comp = (0 until d).map(k => v(k)(i)).toArray
      val maxIdx = comp.indices.maxBy(k => math.abs(comp(k)))
      if (comp(maxIdx) < 0) comp.map(-_) else comp
    }.toArray
    (lam, vec)
  }

  /** Project the aligned rows onto the top-k components: score series
    * keyed PC1..PCk on the shared ts axis (mean-centered dot products —
    * a narrow projection over the aligned aggregate, distributed). */
  def project(obs: DataFrame, model: Model, k: Int): DataFrame = {
    val wide = aligned(obs, model.keys)
    val scores = (0 until k).map { c =>
      val dot = model.keys.indices.map { i =>
        (col(s"_c$i") - model.mean(i)) * model.eigenVectors(c)(i)
      }.reduce(_ + _)
      wide.select(lit(s"PC${c + 1}").as(KeyCol), col(TsCol), dot.as(ValueCol))
    }
    scores.reduce(_ unionByName _)
  }
}

/** PC1 projection as a dataset-level transform: fit PCA over the input
  * series and emit the first principal component's score series — the
  * lineage-registered DIMENSIONALITY_REDUCTION path (the reference's
  * category, a real reduction rather than average's uniform weights). */
object PcaSignal extends DatasetTransform {
  val opName = "pca_project"
  val suffix = "RAW"
  val ptype = ProcessingType.DimensionalityReduction
  val description =
    "Project aligned input series onto their first principal component"
  val signalBaseName = "PCA"

  def transform(inputs: DataFrame, params: Parameters): DataFrame = {
    import org.apache.spark.sql.Row
    val keys = inputs.select(col(KeyCol)).distinct()
      .collect().map { case Row(k: String) => k }.sorted.toSeq
    val model = Pca.fit(inputs, keys)
    Pca.project(inputs, model, 1)
      .select(lit(signalBaseName).as(KeyCol), col(TsCol), col(ValueCol))
  }
}
