package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checkpointing strategy for fixed-point iterative operators
  * (connected components, PageRank, k-means): every round must
  * materialize its state AND truncate lineage, or the per-round plan
  * chains back through every previous round and iteration cost explodes.
  *
  * Two interchangeable modes, chosen by the caller's failure budget:
  *
  *   - [[Local]] — `localCheckpoint()`: blocks live in executor
  *     storage. Fastest (no filesystem round-trip), but an executor
  *     loss mid-iteration fails the job and the caller reruns from
  *     scratch. Right for single-node runs and short iterations.
  *   - [[Reliable]] — `checkpoint()`: each generation is written to
  *     `SparkContext.setCheckpointDir` (HDFS / object store on a
  *     cluster). Survives executor loss — a 1000-executor job restarts
  *     from the last completed round instead of round zero. Requires
  *     the checkpoint dir to be set; old generations are reclaimed by
  *     the ContextCleaner when
  *     `spark.cleaner.referenceTracking.cleanCheckpoints=true`, or by
  *     deleting the directory after the job.
  *
  * Both modes are eager, so `free`/ContextCleaner can reclaim the
  * previous generation as soon as the next one exists. Results are
  * IDENTICAL between modes (IterativesSpec proves it on fixtures) —
  * the choice affects fault tolerance and speed only.
  */
object Iteratives {

  sealed trait Mode
  case object Local extends Mode
  case object Reliable extends Mode

  /** Materialize `df` and truncate its lineage per `mode` (both eager). */
  def checkpoint(df: DataFrame, mode: Mode): DataFrame = mode match {
    case Local => df.localCheckpoint()
    case Reliable => df.checkpoint()
  }

  /** Release a DEAD generation (the next one is already materialized).
    * Local blocks are dropped immediately; reliable files are left for
    * the ContextCleaner / post-job directory cleanup — an explicit
    * delete here would break restart-from-last-round. */
  def free(df: DataFrame, mode: Mode): Unit = mode match {
    case Local => graft.H.freeLocalCheckpoint(df)
    case Reliable => ()
  }

  /** Damped PageRank in integer micro-units over a sparsified edge list —
    * the iterative core of the `graph_pagerank` query, extracted so the
    * checkpoint mode is a parameter. Ranks start at 1,000,000; each round
    * is `contrib = r div outdeg` summed per destination, then
    * `r' = 150000 + (85 * sum) div 100` — pure integer ops, so results
    * are bit-identical across partitionings, run counts, and modes.
    *
    * Scale shape: `edges` is checkpointed once and never re-shuffled;
    * rank state (|nodes| rows) broadcasts into the join each round. At
    * |nodes| too large to broadcast, drop the hint and the same loop
    * runs as a co-partitioned shuffle join on src.
    *
    * @param edgesRaw (src, dst) directed edges, pre-sparsified
    * @param nodes    (id) the full vertex set (isolated nodes keep the
    *                 damping floor)
    */
  def pageRankMicro(
      edgesRaw: DataFrame,
      nodes: DataFrame,
      rounds: Int,
      mode: Mode = Local): DataFrame = {
    val edges = checkpoint(edgesRaw, mode)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    var ranks = nodes.withColumn("r", lit(1000000L))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to rounds) {
      val contribs = edges
        .join(broadcast(ranks), edges("src") === ranks("id"))
        .join(broadcast(outdeg), Seq("src"))
        .select(col("dst").as("id"), expr("r div d").as("contrib"))
        .groupBy("id").agg(sum("contrib").as("sc"))
      val next = checkpoint(
        nodes.join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(150000L) + expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) div 100"))
              .cast("long").as("r")),
        mode)
      prev.foreach(free(_, mode)) // next is materialized; last round is dead
      prev = Some(next)
      ranks = next
    }
    free(edges, mode) // every round is eager, nothing unexecuted reads edges
    ranks
  }
}
