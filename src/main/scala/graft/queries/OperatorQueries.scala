package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsofJoin, RangeJoin, Sessionize}
import graft.sources.Excel

/** Temporal/range operator queries over the `events`/`part`/`lineitem`
  * tables: backward as-of join, bucketed range join, and gaps-and-islands
  * sessionization. All three are operators Spark lacks as built-ins,
  * implemented in shuffle-bounded shapes (see graft.operators scaladocs);
  * DuckDB expresses each directly (ASOF JOIN, non-equi join, window
  * islands), which makes the oracles exact.
  */
object OperatorQueries {

  def defs: Seq[QueryDef] = Seq(

    // S2 read_excel: the nation table round-tripped through a real .xlsx
    // file (self-contained zip+XML reader/writer — no POI; see
    // sources/Excel.scala). The oracle reads the same rows from the
    // original parquet, so the whole write→read path must be lossless.
    QueryDef("s02_read_excel",
      (s, dir) => {
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft-s02-nation.xlsx").getPath
        Excel.write(Tables.load(s, dir, "nation"), path)
        Excel.read(s, path)
          .select("n_nationkey", "n_name", "n_regionkey")
          .orderBy("n_nationkey")
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             |       CAST(n_regionkey AS BIGINT) AS n_regionkey
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // Backward as-of join: every error event attributed to the user's
    // most recent click at-or-before it. The Spark plan is the
    // union + running-last window (one shuffle on user_id); the oracle is
    // DuckDB's native ASOF LEFT JOIN.
    QueryDef("p16_asof_join",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        val errors = events.where(col("event_type") === "error")
          .select("event_id", "user_id", "ts", "value")
        val clicks = events.where(col("event_type") === "click")
        AsofJoin.backward(errors, clicks,
          leftKey = "user_id", rightKey = "user_id",
          leftTs = "ts", rightTs = "ts",
          rightCols = Map("event_id" -> "click_id", "value" -> "click_value"))
          .select(col("event_id"), col("user_id"),
            QueryDef.ntz(col("ts")).as("ts"), col("click_id"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, e.ts, c.event_id AS click_id,
             |       c.value AS click_value
             |FROM (SELECT * FROM events WHERE event_type = 'error') e
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON e.user_id = c.user_id AND e.ts >= c.ts
             |ORDER BY e.event_id""".stripMargin)),

    // Bucketed range join: lineitems priced within ±5 of each part's
    // retail price, aggregated per part. Spark explodes each [lo, hi]
    // range onto its covering width-10 buckets and equi-joins on the
    // bucket id — no broadcast-nested-loop; the oracle is a plain
    // non-equi BETWEEN join (fine at oracle scale).
    QueryDef("p17_range_join",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem").select("l_extendedprice")
        val parts = Tables.load(s, dir, "part")
          .select(col("p_partkey"),
            (col("p_retailprice") - 5).as("lo"),
            (col("p_retailprice") + 5).as("hi"))
        RangeJoin.pointInRange(li, "l_extendedprice", parts, "lo", "hi",
          bucketWidth = 10)
          .groupBy("p_partkey")
          .agg(count(lit(1)).as("n_items"),
            QueryDef.dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("p_partkey")
      },
      Some(s"""SELECT p.p_partkey, COUNT(*) AS n_items,
             |       ${QueryDef.dsumSql("l.l_extendedprice")} AS sum_price
             |FROM part p JOIN lineitem l
             |  ON l.l_extendedprice BETWEEN p.p_retailprice - 5 AND p.p_retailprice + 5
             |GROUP BY p.p_partkey ORDER BY p.p_partkey""".stripMargin)),

    // Gaps-and-islands sessionization: per-user sessions with a 12-hour
    // inactivity gap (events strictly less than the gap apart merge).
    // session_end follows the streaming session_window convention
    // (last event + gap). Oracle: the same lag/running-sum island SQL.
    QueryDef("p18_sessionize",
      (s, dir) => Sessionize.sessions(
        Tables.load(s, dir, "events"), "user_id", "ts", gap = "12 hours",
        aggs = Seq(QueryDef.dsum(col("value")).as("sum_value")))
        .select(col("user_id"),
          QueryDef.ntz(col("session_start")).as("session_start"),
          QueryDef.ntz(col("session_end")).as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
      Some(s"""WITH e AS (
             |  SELECT user_id, ts, value,
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM events
             |), f AS (
             |  SELECT *, CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 12 HOUR
             |                 THEN 1 ELSE 0 END AS nw
             |  FROM e
             |), g AS (
             |  SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM f
             |)
             |SELECT user_id, MIN(ts) AS session_start,
             |       MAX(ts) + INTERVAL 12 HOUR AS session_end,
             |       COUNT(*) AS n_events,
             |       ${QueryDef.dsumSql("value")} AS sum_value
             |FROM g GROUP BY user_id, sess
             |ORDER BY user_id, session_start""".stripMargin)),

    // Ordered-step funnel: signup → click → purchase, each step's time
    // constrained to at-or-after the previous step's first completion.
    // Oracle replays the correlated per-step MIN chain.
    QueryDef("p86_funnel",
      (s, dir) => graft.operators.EventAnalytics.funnel(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
        .orderBy("step_idx"),
      Some("""WITH s0 AS (
             |  SELECT user_id, MIN(ts) AS t0 FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id
             |), s1 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t1
             |  FROM events e JOIN s0 USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts >= s0.t0
             |  GROUP BY e.user_id
             |), s2 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t2
             |  FROM events e JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
             |  GROUP BY e.user_id
             |), c AS (
             |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s0) AS n0,
             |         (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
             |         (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2
             |)
             |SELECT 0 AS step_idx, 'signup' AS step, n0 AS n_users,
             |       CAST(NULL AS DOUBLE) AS conv_frac FROM c
             |UNION ALL
             |SELECT 1, 'click', n1, ROUND(CAST(n1 AS DOUBLE) / n0, 6) FROM c
             |UNION ALL
             |SELECT 2, 'purchase', n2, ROUND(CAST(n2 AS DOUBLE) / n1, 6) FROM c
             |ORDER BY step_idx""".stripMargin)),

    // First-seen weekly retention cohorts over an 8-week horizon.
    // Oracle: distinct (user, week) activity + first-seen min + the
    // same integer week-offset arithmetic.
    QueryDef("p87_retention_cohorts",
      (s, dir) => graft.operators.EventAnalytics.retentionCohorts(
        Tables.load(s, dir, "events"), "user_id", "ts", periods = 8)
        .select(QueryDef.ntz(col("cohort")).as("cohort"), col("offset"),
          col("n_active"), col("cohort_size"), col("retention"))
        .orderBy("cohort", "offset"),
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
             |), f AS (
             |  SELECT user_id, MIN(week) AS cohort FROM act GROUP BY user_id
             |), j AS (
             |  SELECT f.cohort,
             |         CAST(date_diff('day', CAST(f.cohort AS DATE), CAST(a.week AS DATE)) // 7 AS INT) AS "offset"
             |  FROM act a JOIN f USING (user_id)
             |), g AS (
             |  SELECT cohort, "offset", CAST(COUNT(*) AS BIGINT) AS n_active
             |  FROM j WHERE "offset" < 8 GROUP BY 1, 2
             |), sz AS (
             |  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1
             |)
             |SELECT g.cohort, g."offset", g.n_active, sz.cohort_size,
             |       ROUND(CAST(g.n_active AS DOUBLE) / sz.cohort_size, 6) AS retention
             |FROM g JOIN sz USING (cohort)
             |ORDER BY cohort, "offset"""".stripMargin)),

    // Per-user event-type transition matrix: lag under the total
    // (ts, event_id) order, pair counts, row-normalized P(to | from).
    // Oracle replays the lag chain and the normalization.
    QueryDef("p88_event_transitions",
      (s, dir) => graft.operators.EventAnalytics.eventTransitions(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_type", "event_id")
        .orderBy("from_type", "to_type"),
      Some("""WITH nx AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id
             |                                ORDER BY ts, event_id) AS to_type
             |  FROM events
             |), pairs AS (
             |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
             |  FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2
             |), tot AS (
             |  SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS t
             |  FROM pairs GROUP BY 1
             |)
             |SELECT p.from_type, p.to_type, p.n_transitions,
             |       ROUND(CAST(p.n_transitions AS DOUBLE) / t, 6) AS prob
             |FROM pairs p JOIN tot USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // Schema-on-read JSON extraction: props."k" pulled with an explicit
    // one-field from_json schema (map-only, inside the scan's codegen
    // stage), per-type telemetry card in one map-side-combined
    // aggregate. Oracle uses DuckDB's native json_extract_string —
    // matching proves the extraction semantics, not a regex stand-in.
    QueryDef("p80_json_props",
      (s, dir) => graft.pipeline.EventCorpus.propsStats(
        Tables.load(s, dir, "events"), "event_type", "props", "k",
        hiThreshold = 50L)
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |       COUNT(*) AS n_events,
             |       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_parsed,
             |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
             |       ROUND(CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
             |                           THEN 1 ELSE 0 END) AS DOUBLE)
             |             / CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE), 6) AS hi_frac
             |FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Sessionized dialogue-corpus construction: each (user, session)
    // becomes one training document — the (ts, event_id)-ordered
    // event-type turn sequence as text plus turn count and exact value
    // total. Oracle: the p18 islands tail + string_agg with the same
    // total order.
    QueryDef("p81_dialogue_corpus",
      (s, dir) => graft.pipeline.EventCorpus.dialogueCorpus(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
        "value", "event_id", gap = "12 hours")
        .select(col("user").as("user_id"),
          QueryDef.ntz(col("session_start")).as("session_start"),
          col("n_turns"), col("turns"), col("total_value"))
        .orderBy("user_id", "session_start"),
      Some(s"""WITH e AS (
             |  SELECT user_id, ts, event_id, event_type, value,
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM events
             |), f AS (
             |  SELECT *, CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 12 HOUR
             |                 THEN 1 ELSE 0 END AS nw
             |  FROM e
             |), g AS (
             |  SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM f
             |)
             |SELECT user_id, MIN(ts) AS session_start,
             |       COUNT(*) AS n_turns,
             |       string_agg(event_type, ' -> ' ORDER BY ts, event_id) AS turns,
             |       ${QueryDef.dsumSql("value")} AS total_value
             |FROM g GROUP BY user_id, sess
             |ORDER BY user_id, session_start""".stripMargin)),
  )
}
