package graft.plans

import org.apache.spark.{SparkEnv, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators
import org.apache.spark.sql.graftbridge

/** Custom whole-operator: per-key top-k.
  *
  * Spark expresses "first k rows per key" as Window(row_number over
  * key, order) + filter — which must SORT every row of every key and,
  * worse, shuffles all rows into only as many effective streams as
  * there are keys. This operator keeps a bounded heap of k rows per
  * key: one equi-shuffle on the key, O(n log k) work, O(keys·k) memory,
  * no full sort anywhere. At 100 TB that is the difference between a
  * spilling sort of the fact table and a streaming pass.
  *
  * MEMORY BOUND + DEGRADE PATH (ADVICE r1, VERDICT r3): the heap map
  * holds O(distinct keys in partition × k) retained rows. That is the
  * right trade when keys are group-like (bounded cardinality: users,
  * sessions, categories) — but when the key is near-unique (e.g.
  * l_orderkey on the fact table) the map approaches the partition size.
  * Rather than OOM where a window sort would have spilled, the exec
  * DEGRADES: once retained rows cross the per-partition budget
  * (`spark.graft.topKPerKey.maxHeldRows`, default 2^20), every retained
  * row plus the rest of the input is handed to Spark's spillable
  * [[UnsafeExternalRowSorter]] ordered by (key, order), and a streaming
  * pass keeps the first k rows per key group with O(1) extra memory.
  * Rows already evicted from a full heap can never re-enter that key's
  * top-k (k strictly-better rows are still retained), so dropping them
  * stays safe. The degrade is observable in the `degraded partitions` /
  * `external sorted rows` SQL metrics. This makes the automatic
  * [[TopKRankPushdown]] rewrite safe for plain-SQL users at any key
  * cardinality: worst case the plan pays one external sort — exactly
  * what WindowExec would have done — after a bounded O(maxHeldRows)
  * detour. Map-typed keys are groupable but not sort-orderable; they
  * keep the pure heap path (and the bounded-cardinality contract).
  *
  * [[TopKPerKey.topKPerKeyAuto]] remains the explicit API for callers
  * who KNOW keys are near-unique and want the window formulation
  * (external sort + streaming rank) without the heap detour.
  *
  * Preference-ladder slot (c) from the build brief: LogicalPlan +
  * Strategy + SparkPlan, registered both via GraftExtensions and
  * runtime-injected through spark.experimental.extraStrategies by the
  * Column-API entry point below, so it works in any session.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical per-key top-k. Planned as a PARTIAL/FINAL pair (like hash
  * aggregation): the partial instance runs map-side with no
  * distribution requirement, pruning each input partition to ≤ k rows
  * per locally-seen key BEFORE the exchange, so the shuffle carries
  * O(keys·k) rows per map partition instead of the whole child. The
  * final instance requires the key clustering and produces the exact
  * per-key top-k. Partial pruning is sound for row_number semantics: a
  * row outside its partition-local top-k is dominated by k rows that
  * travel to the same reducer, so it can never enter the global top-k.
  *
  * Partial degrade: when the heap budget trips map-side, sorting would
  * be pure overhead — the partial instance just PASSES THROUGH the
  * remaining input (a superset stays correct; only the shuffle-volume
  * optimization is lost), leaving the spillable external sort to the
  * final instance. The final instance keeps the r3 degrade path.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numDegradedPartitions" -> SQLMetrics.createMetric(sparkContext,
      "degraded partitions (external sort)"),
    "externalSortedRows" -> SQLMetrics.createMetric(sparkContext,
      "external sorted rows"))

  /** All rows of a key must meet in one partition for the FINAL
    * instance — Spark's EnsureRequirements inserts the (single) hash
    * shuffle above the partial instance, which accepts any layout.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) UnspecifiedDistribution else ClusteredDistribution(keys)) :: Nil

  /** Row pruning keeps the child's partitioning intact — without this
    * override the default UnknownPartitioning makes EnsureRequirements
    * insert a SECOND redundant exchange above (e.g. for a downstream
    * Window over the same keys).
    */
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val schema = child.schema
    val maxHeldRows = conf
      .getConfString(TopKPerKey.MaxHeldRowsKey, TopKPerKey.MaxHeldRowsDefault.toString)
      .toLong
    // degrade needs a total order on the key columns; map-typed keys are
    // groupable but not orderable and keep the pure heap path. The
    // partial instance degrades by passing through (no sort), so it is
    // always degradable.
    val isPartial = partial
    val degradable = isPartial ||
      keyExprs.forall(e => RowOrdering.isOrderable(e.dataType))
    val fullOrder = keyExprs.map(SortOrder(_, Ascending)) ++ sortOrder
    val pageSize = SparkEnv.get.memoryManager.pageSizeBytes
    val numDegraded = longMetric("numDegradedPartitions")
    val extSortedRows = longMetric("externalSortedRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // per key: bounded "max-heap" (head = worst kept row); a new row
      // replaces the head when it sorts strictly before it
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val reverse = ordering.reversed()
      var held = 0L
      var degrade = false
      while (iter.hasNext && !degrade) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
          held += 1
          if (degradable && held > maxHeldRows) degrade = true
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      if (!degrade) {
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap { heap =>
          val arr = heap.toArray(new Array[InternalRow](heap.size()))
          java.util.Arrays.sort(arr, ordering)
          arr.iterator
        }
      } else if (isPartial) {
        // map-side budget tripped: pruning here is only a shuffle-volume
        // optimization, so hand everything (held rows + the rest of the
        // input) to the final instance unsorted — no external sort paid
        // on the map side
        numDegraded.add(1)
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala
          .flatMap(_.iterator().asScala) ++ iter
      } else {
        numDegraded.add(1)
        // Spill path: sort (key, order) externally — UnsafeExternalRowSorter
        // spills to disk under memory pressure, exactly like WindowExec's
        // sort — then stream the first k rows of each key group.
        val fullOrdering = RowOrdering.create(fullOrder, childOutput)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          // constant prefix: every comparison falls through to the full
          // record comparator; correctness over radix speed on the rare path
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            p.value = 0L; p.isNull = false; p
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          schema, fullOrdering, PrefixComparators.LONG, prefixComputer,
          pageSize, false)
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => sorter.cleanupResources()))
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        var fed = 0L
        val heapIt = heaps.values().iterator()
        while (heapIt.hasNext) {
          val h = heapIt.next()
          val rowIt = h.iterator()
          while (rowIt.hasNext) { sorter.insertRow(toUnsafe(rowIt.next())); fed += 1 }
        }
        heaps.clear()
        while (iter.hasNext) { sorter.insertRow(toUnsafe(iter.next())); fed += 1 }
        extSortedRows.add(fed)
        val sorted = sorter.sort()
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var emittedForKey = 0
          private var ready: InternalRow = null
          override def hasNext: Boolean = {
            while (ready == null && sorted.hasNext) {
              val r = sorted.next()
              // group-change detection by key-byte equality is sound
              // here because the strategy float-normalized the keys:
              // byte equality and the (key, order) sort order agree on
              // ±0.0 / NaN, so a key group is one contiguous byte-equal
              // run (ADVICE r4 #1)
              val key = keyProj(r)
              if (curKey == null || key != curKey) {
                curKey = key.copy(); emittedForKey = 0
              }
              // copy: the sorter reuses its row buffer and this iterator
              // advances it inside hasNext(), which would clobber a row
              // the consumer still holds one call earlier than the heap
              // path's copied rows allow (ADVICE r4 #2); cost is bounded
              // by the output size, k rows per key
              if (emittedForKey < limit) { emittedForKey += 1; ready = r.copy() }
            }
            ready != null
          }
          override def next(): InternalRow = {
            if (ready == null && !hasNext) throw new NoSuchElementException
            val r = ready; ready = null; r
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // Float-normalize the keys ONCE here so every downstream use —
      // the shuffle's HashPartitioning, the heap map's byte-equality
      // grouping, the degrade sort order, and the degrade iterator's
      // group-change detection — agrees on -0.0 == 0.0 and NaN == NaN.
      // The optimizer's NormalizeFloatingNumbers rule does this for
      // built-in Aggregate/Window/Join keys but never visits custom
      // nodes (ADVICE r4: byte-distinct-but-ordering-equal keys could
      // interleave in the sorted run and over-emit per key).
      val normKeys = keys.map(org.apache.spark.sql.graftbridge.normalizeFloats)
      // partial/final pair: EnsureRequirements places the key exchange
      // between them, so the shuffle carries each map partition's local
      // top-k per key instead of the whole child
      TopKPerKeyExec(normKeys, order, k, partial = false,
        TopKPerKeyExec(normKeys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Per-partition retained-row budget before the exec degrades to the
    * spillable external sort. 2^20 rows ≈ 100 MB at 100 B/row — small
    * enough to never OOM an executor, large enough that group-like keys
    * (the operator's target case) never trip it.
    */
  val MaxHeldRowsKey = "spark.graft.topKPerKey.maxHeldRows"
  val MaxHeldRowsDefault: Long = 1L << 20

  /** Alias-metadata marker telling [[TopKRankPushdown]] to leave a
    * window formulation alone. Without it, the auto variant's explicit
    * high-cardinality fallback would be silently rewritten back into
    * the heap operator by our own optimizer rule in
    * GraftExtensions-enabled sessions (found by the r4 spill spec).
    */
  val NoRewriteTag = "graft.topk.noRewrite"

  /** Column-API entry point; self-registers the planner strategy. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(GraftStrategies)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    }
    // Columns carry opaque ColumnNode wrappers that only the Dataset
    // API resolves — route them through throwaway select/sort plans so
    // we get catalyst expressions bound to the child's attribute ids
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    import org.apache.spark.sql.catalyst.expressions.Alias
    val analyzed = df.queryExecution.analyzed
    val resolvedKeys = df.select(keys: _*).queryExecution.analyzed match {
      case Project(list, _) => list.map {
        case a: Alias => a.child
        case e => e
      }
      case other => throw new IllegalStateException(s"unexpected plan: $other")
    }
    val resolvedOrder = df.sortWithinPartitions(order: _*)
      .queryExecution.analyzed match {
      case Sort(so, _, _, _) => so
      case other => throw new IllegalStateException(s"unexpected plan: $other")
    }
    graftbridge.ofRows(spark, TopKPerKey(resolvedKeys, resolvedOrder, k, analyzed))
  }

  /** Cardinality-aware entry point: the bounded-heap operator when keys
    * are group-like, the spillable sort-based window formulation when
    * the caller KNOWS the key is near-unique (`highCardinalityKeys =
    * true`). The window path sorts each key-partition externally
    * (spills to disk) and streams ranks — O(1) extra heap per key — so
    * it survives keys ~ n without paying the heap path's bounded
    * maxHeldRows detour first.
    */
  def topKPerKeyAuto(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                     k: Int, highCardinalityKeys: Boolean): DataFrame =
    if (!highCardinalityKeys) topKPerKey(df, keys, order, k)
    else {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, row_number}
      import org.apache.spark.sql.types.MetadataBuilder
      val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      val noRewrite = new MetadataBuilder().putBoolean(NoRewriteTag, true).build()
      // backtick-quote every projected name so columns containing dots
      // resolve exactly (bare col("a.b") reads a struct field); pick a
      // rank alias no caller column shares so the filter can't bind to
      // a pre-existing column of the same name
      def quoted(n: String) = col("`" + n.replace("`", "``") + "`")
      val rn = Iterator.from(0).map(i => s"__graft_rn$i")
        .find(n => !df.columns.contains(n)).get
      df.select(df.columns.map(quoted).toSeq :+
          row_number().over(w).as(rn, noRewrite): _*)
        .filter(quoted(rn) <= k)
        .drop(rn)
    }
}
