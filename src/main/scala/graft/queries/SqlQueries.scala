package graft.queries

import Tables._

/** SQL-surface queries: the same consumer shapes as
  * [[graft.gold.ConsumerQueries]] but entered through `spark.sql` over
  * registered views — the reference README's Athena workflow
  * (README.md:155-183) under the driver's hash gate. The text frontend
  * changes nothing below the parser: the top-k SQL compiles to the same
  * TakeOrderedAndProject plan as its DataFrame twin (q_o5), asserted in
  * PlanAuditSpec.
  */
object SqlQueries {

  val all: Seq[Q] = Seq(

    // Orange-cap-shaped top-k through the SQL surface: agg + ORDER BY +
    // LIMIT over a temp view.
    Q("q_sql_view_topk",
      (s, dir) => {
        orders(s, dir).createOrReplaceTempView("v_orders")
        s.sql(
          """SELECT o_custkey,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
            |FROM v_orders GROUP BY o_custkey
            |ORDER BY total_spend DESC, o_custkey ASC LIMIT 10""".stripMargin)
      },
      Some(s"""SELECT o_custkey, ${sqlDsum("o_totalprice")} AS total_spend
              |FROM orders GROUP BY o_custkey
              |ORDER BY total_spend DESC, o_custkey ASC LIMIT 10""".stripMargin)),

    // Standings-shaped SQL: join + agg + window rank — the points-table
    // consumer query re-expressed over the relational schema.
    Q("q_sql_view_standings",
      (s, dir) => {
        customer(s, dir).createOrReplaceTempView("v_customer")
        orders(s, dir).createOrReplaceTempView("v_orders")
        nation(s, dir).createOrReplaceTempView("v_nation")
        s.sql(
          """SELECT
            |  CAST(RANK() OVER (ORDER BY total_spend DESC, team ASC) AS BIGINT) AS rank,
            |  team, n_orders, total_spend
            |FROM (
            |  SELECT n.n_name AS team, COUNT(*) AS n_orders,
            |    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
            |  FROM v_orders o
            |  JOIN v_customer c ON o.o_custkey = c.c_custkey
            |  JOIN v_nation n ON c.c_nationkey = n.n_nationkey
            |  GROUP BY n.n_name) agg
            |ORDER BY rank ASC""".stripMargin)
      },
      Some(s"""SELECT
              |  CAST(RANK() OVER (ORDER BY total_spend DESC, team ASC) AS BIGINT) AS rank,
              |  team, n_orders, total_spend
              |FROM (
              |  SELECT n.n_name AS team, COUNT(*) AS n_orders,
              |    ${sqlDsum("o.o_totalprice")} AS total_spend
              |  FROM orders o
              |  JOIN customer c ON o.o_custkey = c.c_custkey
              |  JOIN nation n ON c.c_nationkey = n.n_nationkey
              |  GROUP BY n.n_name) agg
              |ORDER BY rank ASC""".stripMargin)),
  )
}
