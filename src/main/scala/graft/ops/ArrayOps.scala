package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-local array/sequence function library (SURVEY.md §2.2, §2.6).
  *
  * Everything here is composed from Spark's codegen'd higher-order
  * functions (`transform`/`zip_with`/`aggregate`) — no UDFs — so plans
  * stay inside whole-stage codegen and scale linearly with rows: a series
  * is one row, operators never shuffle.
  *
  * ANSI-safety: Spark 4 runs with spark.sql.ansi.enabled=true by default;
  * all element_at calls are guarded by CaseWhen (lazily evaluated) so no
  * out-of-bounds index is ever evaluated.
  */
object ArrayOps {

  /** Σ a[i] (row-local; left-to-right, same order DuckDB list_sum uses). */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (s, x) => s + x)

  /** mean of array elements (A6: `output.mean(dim=1)`). */
  def arrayMean(a: Column): Column =
    arraySum(a) / size(a).cast("double")

  /** dot product ⟨a,b⟩ of equal-length arrays (J2/W10 building block). */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** l2Norm through the native graft_dot kernel — bit-identical to the
    * HOF form for arrays with NO null elements (the kernel reads
    * primitive slots; a null element yields NULL in the HOF form but
    * undefined bytes natively — DotExpr's documented contract). The
    * hot-path choice for the embedding corpus, whose elements are
    * non-null by construction. */
  def l2Norm(s: org.apache.spark.sql.SparkSession, a: Column): Column =
    sqrt(graft.expr.GraftFunctions.dot(s, a, a))

  /** cosine similarity — the similarity-search kernel. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** elementwise ReLU (P11). */
  def relu(a: Column): Column =
    transform(a, x => greatest(x, lit(0.0)))

  /** P1: one-hot of an int in [0,n) as a length-n double array. */
  def oneHot(idx: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => when(i === idx, lit(1.0)).otherwise(lit(0.0)))

  /** P1×P2 fused: zip (value, quality) sequences into a quality-bucketed
    * n-channel signal — `data.unsqueeze(2) * one_hot(acc, n)`
    * (`unsupervised.py:52-55`). Result: ARRAY (time) of ARRAY (channel). */
  def oneHotFuse(values: Column, quality: Column, n: Int): Column =
    zip_with(values, quality, (v, q) =>
      transform(sequence(lit(0), lit(n - 1)),
        i => when(i === q, v).otherwise(lit(0.0))))

  /** row-local numerically-stable log(Σ exp(a[i])) (A4/W9). */
  def logSumExp(a: Column): Column = {
    val m = array_max(a)
    log(aggregate(a, lit(0.0), (s, x) => s + exp(x - m))) + m
  }

  /** row-local softmax (P15): exp(x − m) / Σ exp(x − m). */
  def softmax(a: Column): Column = {
    val m = array_max(a)
    val z = aggregate(a, lit(0.0), (s, x) => s + exp(x - m))
    transform(a, x => exp(x - m) / z)
  }

  /** row-local log-softmax (W9): x − logSumExp(a). */
  def logSoftmax(a: Column): Column = {
    val lse = logSumExp(a)
    transform(a, x => x - lse)
  }

  /** 1-based argmax (W8): position of the max element (first on ties). */
  def argmax(a: Column): Column = array_position(a, array_max(a))

  /** General same-length 1-D convolution with zero padding (W1):
    * out[i] = Σ_d k[d] · a[i + d − center], taps outside the array are 0.
    * kernel is a literal (weights are inputs, SURVEY §2.9 M5). */
  def conv1dSame(a: Column, kernel: Seq[Double]): Column = {
    val center = kernel.size / 2
    transform(sequence(lit(1), size(a)), i =>
      kernel.zipWithIndex.map { case (k, d) =>
        val j = i + (d - center)
        when(j >= 1 && j <= size(a), element_at(a, j) * lit(k))
          .otherwise(lit(0.0))
      }.reduce(_ + _))
  }

  /** centered 3-tap moving average with shrinking edges (W1-lite):
    * s[i] = mean(a[max(1,i−1) .. min(n,i+1)]). */
  def smooth3(a: Column): Column = {
    val n = size(a)
    transform(sequence(lit(1), n), i => {
      val left = when(i > 1, element_at(a, i - 1)).otherwise(lit(0.0))
      val right = when(i < n, element_at(a, i + 1)).otherwise(lit(0.0))
      val cnt = when(i > 1, 1).otherwise(0) + when(i < n, 1).otherwise(0) + 1
      (left + element_at(a, i) + right) / cnt.cast("double")
    })
  }

  /** W7 EMA, final value: ema[0]=a[0]; ema[i]=(1−α)·ema[i−1]+α·a[i].
    * Row-local sequential scan via `aggregate` — order-dependent by
    * design (SURVEY §2.6 W2/W7 recurrence family). NULL for empty. */
  def emaLast(a: Column, alpha: Double): Column =
    when(size(a) === 0, lit(null).cast("double")).otherwise(
      aggregate(slice(a, lit(2), greatest(size(a) - 1, lit(0))),
        element_at(a, 1),
        (s, x) => s * lit(1.0 - alpha) + x * lit(alpha)))

  /** W7 EMA, full trajectory (for curve smoothing as in
    * `exercise provided.ipynb` cell 20). */
  def emaScan(a: Column, alpha: Double): Column =
    when(size(a) === 0, array().cast("array<double>")).otherwise(
      aggregate(
        slice(a, lit(2), greatest(size(a) - 1, lit(0))),
        array(element_at(a, 1)),
        (acc, x) => concat(acc,
          array(element_at(acc, -1) * lit(1.0 - alpha) + x * lit(alpha)))))

  /** P12: seeded train-time dropout — zero elements w.p. `p`, scale
    * survivors by 1/(1−p) ("Augmentation", `T_CPC.py:19`). Eval mode
    * (`model.eval()`, `unsupervised.py:102`) is the identity — pass
    * train=false and constant folding removes the op entirely. */
  def dropout(a: Column, p: Double, seed: Long, train: Boolean = true): Column =
    if (!train) a
    else transform(a, x =>
      when(rand(seed) < p, lit(0.0)).otherwise(x / (1.0 - p)))

  /** P12 companion: the 0/1 KEEP-mask behind `dropout`, materialized as
    * its own column so callers can derive both the dropped array
    * (`zip_with`) and exact kept/dropped counts from ONE set of rand
    * draws. rand is non-deterministic to Catalyst, so a projection
    * computing this mask is never collapsed into its consumers — the
    * draws happen once per row, not once per downstream use. */
  def dropoutMask(a: Column, p: Double, seed: Long): Column =
    transform(a, _ => when(rand(seed) < p, lit(0.0)).otherwise(lit(1.0)))

  /** P6/P7/P8 idioms re-exported for discoverability. */
  def prefix(a: Column, len: Column): Column = slice(a, lit(1), len)
  def lastElem(a: Column): Column = element_at(a, -1)

  /** W10: matrix–vector product with a literal weight matrix (rows of W). */
  def matVec(w: Seq[Seq[Double]], x: Column): Column =
    array(w.map(row => dot(array(row.map(lit): _*), x)): _*)

  /** matVec through the native graft_dot kernel — bit-identical to the
    * HOF form for EQUAL-length, non-null inputs (same left-fold order;
    * on a length mismatch the kernel sums over min length where the
    * HOF form yields NULL — DotExpr's documented contract; layer
    * widths here are fixed by the literal weights) but one primitive
    * loop per output row instead of dims interpreted lambda steps. The
    * hot-path choice for wide literal layers (q97's 64×64 dense stack
    * measured 36 s at sf1 on the HOF spelling). */
  def matVec(s: org.apache.spark.sql.SparkSession, w: Seq[Seq[Double]],
      x: Column): Column =
    array(w.map(row =>
      graft.expr.GraftFunctions.dot(s, array(row.map(lit): _*), x)): _*)
}
