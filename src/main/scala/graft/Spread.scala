package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join,
  LocalRelation, LogicalPlan, RepartitionOperation, Sort, Window}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scale-adaptive input spread for single-`mapPartitions` kernels
  * (decode loops, batched inference, codecs).
  *
  * Those kernels' parallelism is EXACTLY their input's partition
  * count: a small single-file parquet scan plans as ONE task, so the
  * whole kernel serializes on one core while the rest of the cluster
  * idles (opt guide §2.5 "input skew: one huge unsplittable file …
  * repartition immediately after the read"). When the input has fewer
  * partitions than the session's default parallelism, round-robin
  * repartition up to it; otherwise pass the frame through untouched.
  *
  * Scale behaviour: at real scale the scan already carries >= the
  * cluster's parallelism in partitions, so the guard makes this a
  * structural no-op — nothing here is tuned to the local fixture; the
  * local default (defaultParallelism) IS the cluster value.
  *
  * Determinism: round-robin repartition sorts each input partition
  * before assigning rows (spark.sql.execution.sortBeforeRepartition,
  * on by default since SPARK-23207), so the row->partition map is a
  * pure function of the input — retries and reruns see identical
  * batches. Every kernel fed through this helper is per-row (one KV
  * session / one decode per row), so row order never reaches results.
  */
object Spread {
  // scoped opt-out for call sites whose kernel input is a PROVABLY tiny
  // slice the guards below cannot see (none remain in-tree — the
  // round-20 exchange-bearing skip covers the former join-fed users —
  // but the escape hatch stays for library callers)
  private val disabled = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }
  def noSpread[T](f: => T): T = {
    val prev = disabled.get
    disabled.set(true)
    try f finally disabled.set(prev)
  }

  def apply(df: DataFrame): DataFrame = {
    if (disabled.get) return df
    if (df.isStreaming) return df // micro-batch partitioning is the source's
    val target = df.sparkSession.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    // provably-tiny inputs (a known row count under a few rows per
    // core, e.g. a top-k candidate slice feeding a reranker) are not
    // worth a shuffle: the kernel finishes faster than the exchange
    // schedules (measured +0.5 s on the 20-candidate rerank queries)
    val tiny = plan.stats.rowCount.exists(_ < 4L * target)
    if (tiny) return df
    // Round-20 (ADVICE r19): exchange-bearing inputs skip the spread
    // WITHOUT consulting toRdd. Two reasons, both load-bearing:
    //  1. under AQE, building toRdd EAGERLY MATERIALIZES every
    //     upstream shuffle query stage — real jobs at plan time whose
    //     work is then discarded when the kernel's own Dataset
    //     re-plans and re-runs the same shuffles (silent
    //     double-execution for any join/aggregate-fed kernel);
    //  2. a post-shuffle frame already runs at the session's shuffle
    //     width — the one-task single-file-scan pathology this helper
    //     exists for cannot occur, so there is nothing to fix.
    // This retires the per-site noSpread labels the r19 rowCount-only
    // guard needed (stats lose rowCount through joins).
    val hasExchange = plan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort |
           _: RepartitionOperation | _: GlobalLimit => true
      case _ => false
    }
    if (hasExchange) return df
    // Exchange-free scan-shaped plan: estimate the scan's partition
    // count from the LEAVES, without toRdd (round-20: physically
    // planning the subtree cost ~50 ms of driver time per kernel
    // construction — ~20 s across a bench — for a yes/no decision).
    //  - file scans: Spark's own split math (maxPartitionBytes /
    //    openCostInBytes / bytesPerCore) over the relation's cached
    //    file listing;
    //  - checkpointed RDDs: the RDD's real partition count;
    //  - anything else: fall back to planning (safe — exchange-free).
    val conf = df.sparkSession.sessionState.conf
    val leaves = plan.collectLeaves()
    val estimated: Option[Long] = leaves.foldLeft(Option(0L)) {
      case (Some(acc), l: LogicalRelation) => l.relation match {
        case fs: HadoopFsRelation =>
          val total = fs.location.sizeInBytes
          val nFiles = fs.location.inputFiles.length.max(1).toLong
          val openCost = conf.filesOpenCostInBytes
          val bytesPerCore = (total + nFiles * openCost) /
            df.sparkSession.sparkContext.defaultParallelism.max(1)
          val maxSplit = math.min(conf.filesMaxPartitionBytes,
            math.max(openCost, bytesPerCore)).max(1L)
          Some(acc + ((total + nFiles * openCost + maxSplit - 1) / maxSplit))
        case _ => None
      }
      case (Some(acc), r: LogicalRDD) => Some(acc + r.rdd.getNumPartitions)
      case (Some(acc), _: LocalRelation) => Some(acc + 1L)
      case _ => None
    }
    val parts = estimated.getOrElse(df.queryExecution.toRdd.getNumPartitions.toLong)
    if (parts < target) df.repartition(target) else df
  }

  // LogicalPlan.exists by predicate (TreeNode.find) — local helper so
  // the match above reads as intent
  private implicit class PlanOps(val p: LogicalPlan) extends AnyVal {
    def exists(f: LogicalPlan => Boolean): Boolean = p.find(f).isDefined
  }
}
