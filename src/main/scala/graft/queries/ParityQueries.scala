package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.aggregation.Aggregation
import graft.folds.{Aggregators, Folds, NamedAgg}
import graft.mapreduce.{Assign, MapReduce, Reduce, Unpack}

/** One query per reference operator family (SURVEY.md §2.1-2.5), each
  * instantiated on the driver's TPC-H-ish tables with a DuckDB oracle.
  * These are the correctness gate for reference parity. */
object ParityQueries {
  import Q.table

  /** q1: the reference flagship (`Readme.md:104-117`) — unpackFilterOnField
    * + assignKeysAndData + single-pass multi-agg incl. a derived-expression
    * fold (`recFieldF`). */
  private def q1(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "lineitem"),
      Unpack.filterOnField("l_returnflag")(_.isin("A", "R")),
      Assign.KeysAndData(Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice", "l_discount")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("sum_qty", sum(col("l_quantity"))),
        NamedAgg("sum_price", sum(col("l_extendedprice"))),
        Folds.recFieldF("revenue", sum, col("l_extendedprice") * (lit(1.0) - col("l_discount"))))))

  /** q2: the reference example's composed weighted-mean fold
    * (`examples/AddRowsByLabel.hs:61-69`) as native expressions —
    * `sequenceRecFold` of two sums and their quotient, one pass. */
  private def q2(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "lineitem"),
      Unpack.NoOp,
      Assign.SplitOnKeys(Seq("l_returnflag")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("sum_qty", sum(col("l_quantity"))),
        NamedAgg("wavg_price", sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity"))))))

  /** q3: the SAME weighted mean as a typed `Aggregator` fold (the
    * `foldAndAddKey` arbitrary-Fold path, reference
    * `src/Frames/MapReduce.hs:162-167`) — the oracle SQL is identical to
    * q2's, which asserts Aggregator ≡ native expressions (SURVEY §7.2). */
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val wm = Aggregators.asColumn(
      Aggregators.weightedMean,
      col("l_extendedprice"), col("l_quantity"))(
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), wm.as("wavg_price"))
  }

  /** q4: splitOnKeys + foldAllConstrained @Num sum
    * (`examples/AddRowsByLabel.hs:51,104`): sum EVERY numeric column of the
    * complement, schema-driven. */
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val assign = Assign.SplitOnKeys(Seq("l_returnflag", "l_linestatus"))
    val (_, data) = assign.resolve(li.schema)
    val dataSchema = StructType(data.map(li.schema(_)))
    MapReduce(li, Unpack.NoOp, assign,
      Reduce.FoldAndAddKey(Folds.foldAllNumeric(dataSchema, sum)))
  }

  /** q5: assignKeys — key columns stay available to the data folds
    * (reference `src/Frames/MapReduce.hs:128-133`). */
  private def q5(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "orders"),
      Unpack.NoOp,
      Assign.Keys(Seq("o_orderstatus")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("n_orders", count(lit(1))),
        NamedAgg("max_status", max(col("o_orderstatus"))),
        NamedAgg("sum_price", sum(col("o_totalprice"))))))

  /** q6: splitOnData (reference `src/Frames/MapReduce.hs:144-149`) — name
    * the data columns, group by the runtime-schema complement. */
  private def q6(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "customer"),
      Unpack.NoOp,
      Assign.SplitOnData(Seq("c_acctbal", "c_custkey")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("sum_bal", sum(col("c_acctbal"))),
        NamedAgg("n", count(lit(1))))))

  /** q7: monomorphic unpackGoodRows (reference
    * `src/Frames/MapReduce.hs:112-116`): drop-nulls-in-subset AND project to
    * the subset, then aggregate. */
  private def q7(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "orders"),
      Unpack.GoodRows(Seq("o_orderstatus", "o_orderpriority", "o_totalprice")),
      Assign.SplitOnKeys(Seq("o_orderstatus", "o_orderpriority")),
      Reduce.FoldAndAddKey(Seq(NamedAgg("sum_price", sum(col("o_totalprice"))))))

  /** q8: unpackFilterOnGoodField (reference
    * `src/Frames/MapReduce/General.hs:154-161`): non-null AND predicate. */
  private def q8(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "lineitem"),
      Unpack.filterOnGoodField("l_discount")(_ > 0.05),
      Assign.KeysAndData(Seq("l_linestatus"), Seq("l_discount")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("n", count(lit(1))),
        NamedAgg("avg_disc", avg(col("l_discount"))))))

  /** q9: reduceAndAddKey (reference `src/Frames/MapReduce.hs:152-159`) —
    * arbitrary Scala over the group's rows via `mapGroups`, one output row.
    * Deliberately computed imperatively (count + max in one pass) to
    * exercise the escape hatch; the oracle states the same semantics in
    * SQL. */
  private def q9(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "lineitem"),
      Unpack.NoOp,
      Assign.KeysAndData(Seq("l_returnflag", "l_linestatus"), Seq("l_extendedprice")),
      Reduce.ReduceAndAddKey(
        StructType(Seq(
          StructField("n_rows", LongType, nullable = false),
          StructField("max_price", DoubleType, nullable = true))),
        { rows =>
          var n = 0L
          var mx = Double.MinValue
          rows.foreach { r =>
            n += 1
            val p = r.getDouble(0)
            if (p > mx) mx = p
          }
          Seq(n, if (n == 0) null else mx)
        }))

  /** q10: makeRecsWithKey (reference `src/Frames/MapReduce.hs:171-179`) —
    * one group → many output rows via `flatMapGroups`: per-group top-2 by
    * price (deterministic tie-break on orderkey, linenumber). */
  private def q10(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "lineitem"),
      Unpack.NoOp,
      Assign.KeysAndData(
        Seq("l_returnflag", "l_linestatus"),
        Seq("l_orderkey", "l_linenumber", "l_extendedprice")),
      Reduce.MakeRecsWithKey(
        StructType(Seq(
          StructField("l_orderkey", LongType, nullable = false),
          StructField("l_extendedprice", DoubleType, nullable = false))),
        { rows =>
          val top = rows.toSeq.sortBy { r: Row =>
            (-r.getDouble(2), r.getLong(0), r.getInt(1))
          }.take(2)
          // Seq[Any] — without the ascription Scala's weak conformance
          // widens Seq(Long, Double) to Seq[Double], corrupting l_orderkey.
          top.iterator.map(r => Seq[Any](r.getLong(0), r.getDouble(2)))
        }))

  /** q11: aggregateAllFold + keyMap (reference
    * `src/Frames/Aggregation.hs:78-83,109-121`): recode the full key set
    * (order date → era band) and aggregate over merged groups. */
  private def q11(s: SparkSession, dir: String): DataFrame =
    Aggregation.aggregateAllFold(
      table(s, dir, "orders").select("o_orderdate", "o_totalprice"),
      Aggregation.keyMap("o_orderdate", "order_band")(d =>
        when(year(d) < 1995, "early").otherwise("late")),
      Seq(NamedAgg("sum_price", sum(col("o_totalprice"))), NamedAgg("n", count(lit(1)))))

  /** q12: aggregateFold @k (reference `src/Frames/Aggregation.hs:130-136`):
    * constant keys held fixed alongside the recoded keys — compiled to ONE
    * flat groupBy (the reference's nested grouping is an artifact,
    * SURVEY §2.4). */
  private def q12(s: SparkSession, dir: String): DataFrame =
    Aggregation.aggregateFold(
      table(s, dir, "orders").select("o_orderpriority", "o_orderdate", "o_totalprice"),
      constKeys = Seq("o_orderpriority"),
      Aggregation.keyMap("o_orderdate", "order_band")(d =>
        when(year(d) < 1995, "early").otherwise("late")),
      Seq(NamedAgg("sum_price", sum(col("o_totalprice")))))

  /** q13: combineKeyAggregations (reference
    * `src/Frames/Aggregation.hs:68-74`): product of two recoders over
    * disjoint key sets. */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val statusRecode = Aggregation.keyMap("o_orderstatus", "status_band")(c =>
      when(c === "O", "open").otherwise("closed"))
    val dateRecode = Aggregation.keyMap("o_orderdate", "order_band")(d =>
      when(year(d) < 1995, "early").otherwise("late"))
    Aggregation.aggregateAllFold(
      table(s, dir, "orders").select("o_orderstatus", "o_orderdate", "o_totalprice"),
      Aggregation.combineKeyAggregations(statusRecode, dateRecode),
      Seq(NamedAgg("sum_price", sum(col("o_totalprice"))), NamedAgg("n", count(lit(1)))))
  }

  /** q14: mergeDataFolds (reference `src/Frames/Aggregation.hs:169-173`):
    * two independent single-column folds merged into one two-column fold. */
  private def q14(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "lineitem"),
      Unpack.NoOp,
      Assign.KeysAndData(Seq("l_linestatus"), Seq("l_quantity", "l_tax")),
      Reduce.FoldAndAddKey(Folds.mergeDataFolds(
        Folds.fieldToFieldFold("l_quantity", "avg_qty", avg),
        Folds.fieldToFieldFold("l_tax", "sum_tax", sum))))

  /** q15: raw MR.Unpack as row→many-rows flatMap (reference usage at
    * `src/Frames/Aggregation.hs:116-118`): explode document text into
    * tokens, then group — the flatMap stays a native `explode` so Catalyst
    * can still prune/push around it. */
  private def q15(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "documents"),
      Unpack.Transform(df =>
        df.select(col("lang"), explode(split(col("text"), " ")).as("token"))
          .filter(length(col("token")) > 0)),
      Assign.SplitOnKeys(Seq("lang")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("n_tokens", count(lit(1))),
        NamedAgg("n_distinct_tokens", countDistinct(col("token"))))))

  /** q16: null-SKIPPING fold semantics — the golden behavior pinned by the
    * reference's one deterministic test (`examples/AddRowsByLabel.hs:126`,
    * `filteredFold` at `src/Frames/Folds/General.hs:110-112`). The test
    * tables have no nulls, so nulls are introduced with a deterministic
    * `when` recode first; Spark's `sum` then skips them, matching the
    * reference. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    MapReduce(
      table(s, dir, "events")
        .select(col("event_type"), when(col("value") < 20.0, lit(null)).otherwise(col("value")).as("v")),
      Unpack.NoOp,
      Assign.SplitOnKeys(Seq("event_type")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("sum_v", sum(col("v"))),
        NamedAgg("n_good", count(col("v"))),
        NamedAgg("n_rows", count(lit(1))))))

  /** q17: null-POISONING sum — the non-default null semantics users can
    * express in the reference via `functorFoldAllConstrained`
    * (`src/Frames/Folds/General.hs:260-273`): any null in the group makes
    * the aggregate null. Implemented as a typed Aggregator (no Spark
    * built-in has this behavior). */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val poisoned = Aggregators.asColumn(
      Aggregators.nullPoisoningSum,
      when(col("value") < 20.0, lit(null)).otherwise(col("value")))(Encoders.DOUBLE)
    table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(poisoned.as("sum_poisoned"), count(lit(1)).as("n_rows"))
  }

  /** q18: foldAll — one unconstrained endo-fold applied to EVERY data
    * column, keeping names (reference `src/Frames/Folds.hs:198-206`; the
    * docs' canonical example is a last/max-style fold). Exercises mixed
    * types: longs, doubles, timestamp, string. */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    val assign = Assign.SplitOnKeys(Seq("o_orderstatus"))
    val (_, data) = assign.resolve(o.schema)
    MapReduce(o, Unpack.NoOp, assign,
      Reduce.FoldAndAddKey(Folds.foldAll(StructType(data.map(o.schema(_))), max)))
  }

  def all: Seq[Q] = Seq(
    Q("q1_flagship", q1, Some("""
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        sum(l_extendedprice) AS sum_price,
        sum(l_extendedprice * (1.0 - l_discount)) AS revenue
      FROM lineitem WHERE l_returnflag IN ('A','R')
      GROUP BY l_returnflag, l_linestatus""")),
    Q("q2_weighted_mean", q2, Some("""
      SELECT l_returnflag,
        sum(l_quantity) AS sum_qty,
        sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wavg_price
      FROM lineitem GROUP BY l_returnflag""")),
    Q("q3_weighted_mean_udaf", q3, Some("""
      SELECT l_returnflag,
        sum(l_quantity) AS sum_qty,
        sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wavg_price
      FROM lineitem GROUP BY l_returnflag""")),
    Q("q4_fold_all_numeric", q4, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(l_orderkey) AS BIGINT) AS l_orderkey,
        CAST(sum(l_partkey) AS BIGINT) AS l_partkey,
        CAST(sum(l_suppkey) AS BIGINT) AS l_suppkey,
        CAST(sum(l_linenumber) AS BIGINT) AS l_linenumber,
        sum(l_quantity) AS l_quantity,
        sum(l_extendedprice) AS l_extendedprice,
        sum(l_discount) AS l_discount,
        sum(l_tax) AS l_tax
      FROM lineitem GROUP BY l_returnflag, l_linestatus""")),
    Q("q5_assign_keys", q5, Some("""
      SELECT o_orderstatus,
        count(*) AS n_orders,
        max(o_orderstatus) AS max_status,
        sum(o_totalprice) AS sum_price
      FROM orders GROUP BY o_orderstatus""")),
    Q("q6_split_on_data", q6, Some("""
      SELECT c_name, c_nationkey, c_mktsegment,
        sum(c_acctbal) AS sum_bal, count(*) AS n
      FROM customer GROUP BY c_name, c_nationkey, c_mktsegment""")),
    Q("q7_good_rows", q7, Some("""
      SELECT o_orderstatus, o_orderpriority, sum(o_totalprice) AS sum_price
      FROM orders
      WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        AND o_totalprice IS NOT NULL
      GROUP BY o_orderstatus, o_orderpriority""")),
    Q("q8_filter_good_field", q8, Some("""
      SELECT l_linestatus, count(*) AS n, avg(l_discount) AS avg_disc
      FROM lineitem
      WHERE l_discount IS NOT NULL AND l_discount > 0.05
      GROUP BY l_linestatus""")),
    Q("q9_reduce_and_add_key", q9, Some("""
      SELECT l_returnflag, l_linestatus,
        count(*) AS n_rows, max(l_extendedprice) AS max_price
      FROM lineitem GROUP BY l_returnflag, l_linestatus""")),
    Q("q10_make_recs_with_key", q10, Some("""
      SELECT l_returnflag, l_linestatus, l_orderkey, l_extendedprice
      FROM (
        SELECT l_returnflag, l_linestatus, l_orderkey, l_extendedprice,
          row_number() OVER (
            PARTITION BY l_returnflag, l_linestatus
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem) t
      WHERE rn <= 2""")),
    Q("q11_key_recode", q11, Some("""
      SELECT CASE WHEN year(o_orderdate) < 1995 THEN 'early' ELSE 'late' END AS order_band,
        sum(o_totalprice) AS sum_price, count(*) AS n
      FROM orders GROUP BY 1""")),
    Q("q12_aggregate_fold", q12, Some("""
      SELECT o_orderpriority,
        CASE WHEN year(o_orderdate) < 1995 THEN 'early' ELSE 'late' END AS order_band,
        sum(o_totalprice) AS sum_price
      FROM orders GROUP BY 1, 2""")),
    Q("q13_combine_recodes", q13, Some("""
      SELECT CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END AS status_band,
        CASE WHEN year(o_orderdate) < 1995 THEN 'early' ELSE 'late' END AS order_band,
        sum(o_totalprice) AS sum_price, count(*) AS n
      FROM orders GROUP BY 1, 2""")),
    Q("q14_merge_data_folds", q14, Some("""
      SELECT l_linestatus, avg(l_quantity) AS avg_qty, sum(l_tax) AS sum_tax
      FROM lineitem GROUP BY l_linestatus""")),
    Q("q15_unpack_flatmap", q15, Some("""
      SELECT lang, count(*) AS n_tokens,
        count(DISTINCT token) AS n_distinct_tokens
      FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents) t
      WHERE length(token) > 0
      GROUP BY lang""")),
    Q("q16_null_skip_sum", q16, Some("""
      SELECT event_type,
        sum(CASE WHEN value < 20.0 THEN NULL ELSE value END) AS sum_v,
        count(CASE WHEN value < 20.0 THEN NULL ELSE value END) AS n_good,
        count(*) AS n_rows
      FROM events GROUP BY event_type""")),
    Q("q17_null_poison_sum", q17, Some("""
      SELECT event_type,
        CASE WHEN count(*) = count(CASE WHEN value < 20.0 THEN NULL ELSE value END)
             THEN sum(value) ELSE NULL END AS sum_poisoned,
        count(*) AS n_rows
      FROM events GROUP BY event_type""")),
    Q("q18_fold_all", q18, Some("""
      SELECT o_orderstatus,
        max(o_orderkey) AS o_orderkey,
        max(o_custkey) AS o_custkey,
        max(o_totalprice) AS o_totalprice,
        max(o_orderdate) AS o_orderdate,
        max(o_orderpriority) AS o_orderpriority
      FROM orders GROUP BY o_orderstatus"""))
  )
}
