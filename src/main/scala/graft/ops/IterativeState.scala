package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The declarative iterative-training pattern shared by the
  * oracle-grade ML dataflows (q98 Lloyd KMeans, q100 GD logistic,
  * q101 power-iteration PCA):
  *
  *  - model state lives in a ONE-ROW DataFrame holding a dense array
  *    (weights / component / centroid matrix), broadcast into each
  *    epoch's distributed pass — never a driver-side collect;
  *  - the epoch update is a KEYED partial-aggregable aggregation
  *    (per-dim gradient, per-(cell,dim) mean), gathered back into the
  *    dense array with an ordered collect_list;
  *  - the new state is QUANTIZED (round to a fixed scale) so
  *    cross-engine float drift cannot compound across epochs, and
  *    eagerly localCheckpointed so lineage stays O(1) per epoch and
  *    every downstream action reads a materialized state instead of
  *    re-deriving the whole iteration chain.
  *
  * This is the loop shape that survives 100 TB: per-epoch work is one
  * shuffle of K keys (K = model dim, tiny), state is O(model), and the
  * data is only ever scanned, never moved.
  */
object IterativeState {

  /** Gather keyed scalar updates into ONE dense array ordered by key —
    * the state-rebuild step (`collect_list` of (key, value) structs,
    * array_sort on the key, project the value). Aggregate over a
    * one-group frame: `df.agg(gather($"dim", $"wj").as("w"))`. */
  def gather(key: Column, value: Column): Column =
    transform(array_sort(collect_list(struct(key.as("k"), value.as("x")))),
      t => t("x"))

  /** Run `n` epochs of `step` under the quantize-then-cut contract:
    * `step` must round the state it returns; epochs() eagerly
    * localCheckpoints each result before the next epoch reads it. */
  def epochs(init: DataFrame, n: Int)(
      step: (DataFrame, Int) => DataFrame): DataFrame =
    epochsTraced(init, n)(step)((_, _) => ())

  /** `epochs` plus a per-epoch callback observing the CHECKPOINTED
    * state (for trace tables like q100's loss curve — the callback's
    * reads hit the materialized state, not the update lineage). */
  def epochsTraced(init: DataFrame, n: Int)(
      step: (DataFrame, Int) => DataFrame)(
      onEpoch: (DataFrame, Int) => Unit): DataFrame = {
    var st = init
    for (t <- 1 to n) {
      st = step(st, t).localCheckpoint(true)
      onEpoch(st, t)
    }
    st
  }
}
