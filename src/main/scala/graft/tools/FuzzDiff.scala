package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Fuzz differential vs the DuckDB oracle: generate N seeded-random
  * query shapes (filter/project, aggregate, HAVING, joins, windows,
  * set ops, scalar subqueries) over the testdata schema in a PORTABLE
  * ANSI subset, run them in Spark, and dump `oracle_sql.json` +
  * per-shape parquet in the exact layout `scripts/check.py` compares —
  * so one `python3 scripts/check.py <sfDir> <outDir>` afterwards
  * value-compares every shape in DuckDB.
  *
  * The 171 fixed SparkEntry queries pin known shapes; this hunts the
  * UNKNOWN ones — null ordering, overflow edges, type-coercion corners
  * — in the composition space the fixed set can't enumerate. Seeded and
  * replayable: the same (seed, n) always regenerates the same SQL, so a
  * divergence becomes a fixed regression spec by copying its entry.
  *
  * Portability rules baked into the generator (the lessons the fixed
  * oracle suite already encodes):
  *   - SUM/COUNT(DISTINCT) wrapped in CAST(... AS BIGINT) — DuckDB
  *     SUM(int) is HUGEINT;
  *   - EXTRACT(...) cast to INTEGER — DuckDB returns BIGINT, Spark INT;
  *   - no SUM/AVG over raw doubles (accumulation order drifts the low
  *     bits); doubles only pass through, compare, MIN/MAX, or enter
  *     integer space via CAST(FLOOR(x) AS BIGINT) (CAST alone disagrees:
  *     DuckDB rounds, Spark truncates);
  *   - int arithmetic promoted to BIGINT first (Spark 4 ANSI overflow);
  *   - windows ordered by EVERY column of the table with explicit
  *     NULLS FIRST — the testdata's nominal keys are NOT unique
  *     (11k duplicate (l_orderkey, l_linenumber) pairs at sf0.01, a
  *     divergence this fuzzer itself caught on its first run), and the
  *     engines disagree on default null ordering; a full-row total
  *     order makes ties interchangeable, so ROW_NUMBER/running sums
  *     compare deterministically;
  *   - events (TIMESTAMP_NANOS) and embeddings (FLOAT[]) excluded —
  *     the two engines legitimately read those differently.
  *
  * Usage: graft.tools.FuzzDiff <sfDir> <outDir> [n] [seed]
  *
  * Grammar versions: changing the shape set changes the (seed, n) →
  * SQL mapping, so every record carries `"gen"` and replay is defined
  * per generator version (v1 = 9 families, r11 seeds 11/42; v2 adds
  * FK-chain joins, conditional aggregation, EXISTS/NOT EXISTS,
  * IN-subquery semi joins, ROLLUP+GROUPING(), global ORDER BY+LIMIT
  * top-k, and CTE aggregate-join-back; v3 adds the TYPED corners —
  * decimal arithmetic/casts with explicit result types (division
  * excluded: the engines' published result-scale rules legitimately
  * differ), timestamp/interval arithmetic and DATE_TRUNC bucketing
  * over the DST-free UTC session, LIKE/_-wildcard/string-comparison
  * edges, and NULL-in-IN / NOT-IN-vs-NULL-subquery three-valued-logic
  * corners).
  */
object FuzzDiff {

  /** Bumped whenever the shape grammar changes (see Scaladoc). */
  private val GenVersion = 3

  private final case class Col(name: String, t: Char) // i/d/s/t
  private final case class Tbl(name: String, keys: Seq[String], cols: Seq[Col]) {
    def of(c: Char): Seq[Col] = cols.filter(_.t == c)
  }

  private val tables = Seq(
    Tbl("region", Seq("r_regionkey"),
      Seq(Col("r_regionkey", 'i'), Col("r_name", 's'))),
    Tbl("nation", Seq("n_nationkey"),
      Seq(Col("n_nationkey", 'i'), Col("n_name", 's'), Col("n_regionkey", 'i'))),
    Tbl("customer", Seq("c_custkey"),
      Seq(Col("c_custkey", 'i'), Col("c_name", 's'), Col("c_nationkey", 'i'),
        Col("c_acctbal", 'd'), Col("c_mktsegment", 's'))),
    Tbl("supplier", Seq("s_suppkey"),
      Seq(Col("s_suppkey", 'i'), Col("s_name", 's'), Col("s_nationkey", 'i'),
        Col("s_acctbal", 'd'))),
    Tbl("part", Seq("p_partkey"),
      Seq(Col("p_partkey", 'i'), Col("p_name", 's'), Col("p_brand", 's'),
        Col("p_type", 's'), Col("p_size", 'i'), Col("p_retailprice", 'd'))),
    Tbl("orders", Seq("o_orderkey"),
      Seq(Col("o_orderkey", 'i'), Col("o_custkey", 'i'),
        Col("o_orderstatus", 's'), Col("o_totalprice", 'd'),
        Col("o_orderdate", 't'), Col("o_orderpriority", 's'))),
    Tbl("lineitem", Seq("l_orderkey", "l_linenumber"),
      Seq(Col("l_orderkey", 'i'), Col("l_partkey", 'i'), Col("l_suppkey", 'i'),
        Col("l_linenumber", 'i'), Col("l_quantity", 'd'),
        Col("l_extendedprice", 'd'), Col("l_discount", 'd'),
        Col("l_returnflag", 's'), Col("l_linestatus", 's'),
        Col("l_shipdate", 't'))),
    Tbl("documents", Seq("doc_id"),
      Seq(Col("doc_id", 'i'), Col("lang", 's'), Col("source", 's'),
        Col("n_chars", 'i'))))

  /** Known categorical domains, for IN-list predicates that actually
    * select something. */
  private val domains: Map[String, Seq[String]] = Map(
    "o_orderstatus" -> Seq("F", "O", "P"),
    "l_returnflag" -> Seq("A", "N", "R"),
    "l_linestatus" -> Seq("F", "O"),
    "c_mktsegment" -> Seq("MACHINERY", "BUILDING", "FURNITURE",
      "AUTOMOBILE", "HOUSEHOLD"),
    "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW"),
    "lang" -> Seq("en", "de", "fr", "es", "zh"))

  // FK edges for join shapes: (left table, left col, right table, right col)
  private val fks = Seq(
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** Composable FK paths for multi-way join shapes (each edge's right
    * table is the next edge's left table). */
  private val chains: Seq[Seq[(String, String, String, String)]] = Seq(
    Seq(("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey")),
    Seq(("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey")),
    Seq(("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey")))

  private final class Gen(seed: Long) {
    val rnd = new java.util.Random(seed)
    def int(n: Int): Int = rnd.nextInt(n)
    def pick[A](xs: Seq[A]): A = xs(int(xs.length))
    def tbl(): Tbl = pick(tables)
    /** A factish table (enough rows for aggregates to be interesting). */
    def factTbl(): Tbl = pick(tables.filter(t =>
      Set("orders", "lineitem", "customer", "part", "documents")(t.name)))

    /** Integer-typed SQL expression over `t` (BIGINT-safe). */
    def intExpr(t: Tbl, q: String = ""): String = {
      def c(n: String) = if (q.isEmpty) n else s"$q.$n"
      val ic = t.of('i'); val dc = t.of('d')
      int(3) match {
        case 0 => s"CAST(${c(pick(ic).name)} AS BIGINT)"
        case 1 if dc.nonEmpty => s"CAST(FLOOR(${c(pick(dc).name)}) AS BIGINT)"
        case _ =>
          s"CAST(${c(pick(ic).name)} AS BIGINT) * ${1 + int(5)} + ${int(7)}"
      }
    }

    /** One predicate over table `t` (optionally alias-qualified). */
    def pred(t: Tbl, q: String = ""): String = {
      def c(n: String) = if (q.isEmpty) n else s"$q.$n"
      val choices = Seq.newBuilder[() => String]
      for (col <- t.of('i'))
        choices += (() => int(3) match {
          case 0 => s"${c(col.name)} % ${2 + int(9)} = ${int(2)}"
          case 1 => s"${c(col.name)} > ${int(800)}"
          case _ => s"${c(col.name)} BETWEEN ${int(300)} AND ${300 + int(900)}"
        })
      for (col <- t.of('d'))
        choices += (() => int(2) match {
          case 0 => s"${c(col.name)} > ${100 + int(5000)}.${int(100)}"
          case _ => s"${c(col.name)} <= ${5000 + int(95000)}.${int(100)}"
        })
      for (col <- t.of('s'))
        choices += (() => domains.get(col.name) match {
          case Some(vals) if int(2) == 0 =>
            val k = 1 + int(math.min(3, vals.length))
            val distinct = scala.util.Random.javaRandomToRandom(rnd)
              .shuffle(vals).take(k).sorted
            s"${c(col.name)} IN (${distinct.map(v => s"'$v'").mkString(", ")})"
          case _ =>
            s"${c(col.name)} LIKE '%${('a' + int(5)).toChar}%'"
        })
      for (col <- t.of('t'))
        choices += (() => int(2) match {
          case 0 =>
            s"${c(col.name)} >= TIMESTAMP '${1995 + int(6)}-0${1 + int(9)}-01 00:00:00'"
          case _ =>
            s"CAST(EXTRACT(YEAR FROM ${c(col.name)}) AS INTEGER) = ${1995 + int(7)}"
        })
      val cs = choices.result()
      val one = pick(cs)()
      if (int(3) == 0) s"($one ${if (int(2) == 0) "AND" else "OR"} ${pick(cs)()})"
      else one
    }

    /** Projection expression list incl. computed columns; always
      * includes the table keys so rows stay distinguishable. */
    def proj(t: Tbl): Seq[String] = {
      val extras = Seq.newBuilder[String]
      val ss = t.of('s')
      if (ss.nonEmpty && int(2) == 0) {
        val s = pick(ss).name
        extras += (int(3) match {
          case 0 => s"UPPER($s) AS u_$s"
          case 1 => s"SUBSTRING($s, 1, ${1 + int(6)}) AS sub_$s"
          case _ => s"CAST(LENGTH($s) AS INTEGER) AS len_$s"
        })
      }
      if (int(2) == 0)
        extras += s"CASE WHEN ${pred(t)} THEN 'hit' ELSE 'miss' END AS tag"
      if (int(2) == 0) extras += s"${intExpr(t)} AS ie"
      val plain = scala.util.Random.javaRandomToRandom(rnd)
        .shuffle(t.cols.map(_.name)).take(1 + int(3))
      (t.keys ++ plain).distinct ++ extras.result()
    }

    /** Group keys: categorical string, small int, or year-of. */
    def groupKeys(t: Tbl, q: String = ""): Seq[(String, String)] = {
      def c(n: String) = if (q.isEmpty) n else s"$q.$n"
      val cands = Seq.newBuilder[(String, String)]
      for (col <- t.of('s') if domains.contains(col.name) || int(3) == 0)
        cands += ((c(col.name), col.name))
      for (col <- t.of('i'))
        cands += ((s"${c(col.name)} % ${2 + int(7)}", s"g_${col.name}"))
      for (col <- t.of('t'))
        cands += ((s"CAST(EXTRACT(YEAR FROM ${c(col.name)}) AS INTEGER)",
          s"y_${col.name}"))
      val all = cands.result()
      scala.util.Random.javaRandomToRandom(rnd).shuffle(all)
        .take(1 + int(2))
    }

    def aggList(t: Tbl, q: String = ""): Seq[String] = {
      def c(n: String) = if (q.isEmpty) n else s"$q.$n"
      val aggs = Seq.newBuilder[String]
      aggs += "CAST(COUNT(*) AS BIGINT) AS cnt"
      if (int(2) == 0) aggs += s"CAST(SUM(${intExpr(t, q)}) AS BIGINT) AS s_ie"
      val any = pick(t.cols).name
      if (int(2) == 0) aggs += s"MIN(${c(any)}) AS mn_$any"
      if (int(2) == 0) aggs += s"MAX(${c(pick(t.cols).name)}) AS mx"
      if (int(2) == 0)
        aggs += s"CAST(COUNT(DISTINCT ${c(pick(t.cols).name)}) AS BIGINT) AS cd"
      aggs.result().distinct
    }
  }

  /** Generate one named shape. Returns (kind, sql). */
  private def shape(g: Gen): (String, String) = {
    g.int(20) match {
      case 0 => // filter + project (+computed columns)
        val t = g.tbl()
        ("filter_project",
          s"SELECT ${g.proj(t).mkString(", ")} FROM ${t.name} WHERE ${g.pred(t)}")
      case 1 => // aggregate, optional HAVING
        val t = g.factTbl()
        val gks = g.groupKeys(t)
        val sel = gks.map { case (e, a) => s"$e AS $a" } ++ g.aggList(t)
        val having = if (g.int(2) == 0) s" HAVING COUNT(*) > ${1 + g.int(5)}" else ""
        ("agg",
          s"SELECT ${sel.mkString(", ")} FROM ${t.name} WHERE ${g.pred(t)} " +
            s"GROUP BY ${gks.map(_._1).mkString(", ")}$having")
      case 2 => // FK inner join + aggregate
        val (lt, lc, rt, rc) = g.pick(fks)
        val l = tables.find(_.name == lt).get
        val r = tables.find(_.name == rt).get
        val gks = g.groupKeys(r, "b")
        val sel = gks.map { case (e, a) => s"$e AS $a" } ++ g.aggList(l, "a")
        ("join_agg",
          s"SELECT ${sel.mkString(", ")} FROM $lt a JOIN $rt b ON a.$lc = b.$rc " +
            s"WHERE ${g.pred(l, "a")} GROUP BY ${gks.map(_._1).mkString(", ")}")
      case 3 => // LEFT join: null-bearing right columns + COALESCE
        val (lt, lc, rt, rc) = g.pick(fks)
        val l = tables.find(_.name == lt).get
        val r = tables.find(_.name == rt).get
        val rCol = g.pick(r.cols).name
        ("left_join",
          s"SELECT ${l.keys.map("a." + _).mkString(", ")}, b.$rCol, " +
            s"CASE WHEN b.$rc IS NULL THEN 'none' ELSE 'some' END AS side " +
            s"FROM $lt a LEFT JOIN " +
            s"(SELECT * FROM $rt WHERE ${g.pred(r)}) b ON a.$lc = b.$rc " +
            s"WHERE ${g.pred(l, "a")}")
      case 4 => // window top-k per group (full-row total-order tie-break)
        val t = g.factTbl()
        val (gk, ga) = g.groupKeys(t).head
        val oc = g.pick(t.cols).name
        val ord = (oc +: t.cols.map(_.name)).distinct
          .map(_ + " NULLS FIRST").mkString(", ")
        ("window_topk",
          s"SELECT * FROM (SELECT ${t.cols.map(_.name).mkString(", ")}, " +
            s"$gk AS grp_$ga, ROW_NUMBER() OVER " +
            s"(PARTITION BY $gk ORDER BY $ord) AS rn " +
            s"FROM ${t.name} WHERE ${g.pred(t)}) w WHERE w.rn <= ${1 + g.int(4)}")
      case 5 => // running sum over a full-row total order
        val t = g.factTbl()
        val (gk, ga) = g.groupKeys(t).head
        val e = g.intExpr(t)
        val ord = t.cols.map(_.name + " NULLS FIRST").mkString(", ")
        ("window_running",
          s"SELECT ${t.cols.map(_.name).mkString(", ")}, $gk AS grp_$ga, " +
            s"CAST(SUM($e) OVER (PARTITION BY $gk " +
            s"ORDER BY $ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
            s"AS BIGINT) AS run FROM ${t.name} WHERE ${g.pred(t)}")
      case 6 => // set operation between two filtered slices
        val t = g.tbl()
        val c = g.pick(t.of('i')).name
        val op = g.pick(Seq("INTERSECT", "EXCEPT", "UNION", "UNION ALL"))
        (s"setop",
          s"SELECT $c FROM ${t.name} WHERE ${g.pred(t)} $op " +
            s"SELECT $c FROM ${t.name} WHERE ${g.pred(t)}")
      case 7 => // scalar subquery threshold
        val t = g.factTbl()
        val c = g.pick(t.of('i')).name
        val t2 = g.factTbl()
        val c2 = g.pick(t2.of('i')).name
        ("scalar_subquery",
          s"SELECT ${(t.keys :+ c).distinct.mkString(", ")} FROM ${t.name} WHERE " +
            s"CAST($c AS BIGINT) > (SELECT CAST(MIN($c2) AS BIGINT) + " +
            s"${g.int(5)} FROM ${t2.name} WHERE ${g.pred(t2)})")
      case 8 => // distinct projection
        val t = g.tbl()
        val cols = scala.util.Random.javaRandomToRandom(g.rnd)
          .shuffle(t.cols.filter(_.t != 'd').map(_.name)).take(1 + g.int(2))
        ("distinct",
          s"SELECT DISTINCT ${cols.mkString(", ")} FROM ${t.name} " +
            s"WHERE ${g.pred(t)}")
      case 9 => // multi-way FK chain join (+aggregate on the first hop)
        val chain = g.pick(chains)
        val hops = chain.take(2 + g.int(chain.length - 1)) // 2..len edges
        val first = tables.find(_.name == hops.head._1).get
        val last = tables.find(_.name == hops.last._3).get
        val aliases = ("t0" +: hops.indices.map(i => s"t${i + 1}")).toIndexedSeq
        val joins = hops.zipWithIndex.map { case ((_, lc, rt, rc), i) =>
          s"JOIN $rt ${aliases(i + 1)} ON ${aliases(i)}.$lc = ${aliases(i + 1)}.$rc"
        }.mkString(" ")
        val gks = g.groupKeys(last, aliases.last)
        val sel = gks.map { case (e, a) => s"$e AS $a" } ++ g.aggList(first, "t0")
        ("chain_join",
          s"SELECT ${sel.mkString(", ")} FROM ${first.name} t0 $joins " +
            s"WHERE ${g.pred(first, "t0")} " +
            s"GROUP BY ${gks.map(_._1).mkString(", ")}")
      case 10 => // conditional aggregation (CASE inside SUM)
        val t = g.factTbl()
        val gks = g.groupKeys(t)
        val sel = gks.map { case (e, a) => s"$e AS $a" } ++ Seq(
          s"CAST(SUM(CASE WHEN ${g.pred(t)} THEN 1 ELSE 0 END) AS BIGINT) AS hits",
          s"CAST(SUM(CASE WHEN ${g.pred(t)} THEN ${g.intExpr(t)} ELSE 0 END) AS BIGINT) AS cond_sum",
          "CAST(COUNT(*) AS BIGINT) AS cnt")
        ("conditional_agg",
          s"SELECT ${sel.mkString(", ")} FROM ${t.name} " +
            s"GROUP BY ${gks.map(_._1).mkString(", ")}")
      case 11 => // EXISTS / NOT EXISTS correlated semi/anti join
        val (ct, cc, pt, pc) = g.pick(fks)
        val child = tables.find(_.name == ct).get
        val parent = tables.find(_.name == pt).get
        val op = if (g.int(2) == 0) "EXISTS" else "NOT EXISTS"
        val cols = (parent.keys ++
          Seq(g.pick(parent.cols).name)).distinct.map("p." + _)
        ("exists_join",
          s"SELECT ${cols.mkString(", ")} FROM $pt p WHERE $op " +
            s"(SELECT 1 FROM $ct c WHERE c.$cc = p.$pc AND ${g.pred(child, "c")})" +
            (if (g.int(2) == 0) s" AND ${g.pred(parent, "p")}" else ""))
      case 12 => // IN / NOT IN subquery on a (non-null) key column
        val (ct, cc, pt, pc) = g.pick(fks)
        val child = tables.find(_.name == ct).get
        val parent = tables.find(_.name == pt).get
        val op = if (g.int(3) == 0) "NOT IN" else "IN"
        val cols = (child.keys ++ Seq(cc, g.pick(child.cols).name)).distinct
        ("in_subquery",
          s"SELECT ${cols.mkString(", ")} FROM $ct WHERE $cc $op " +
            s"(SELECT $pc FROM $pt WHERE ${g.pred(parent)}) " +
            s"AND ${g.pred(child)}")
      case 13 => // ROLLUP with GROUPING() level markers
        val t = g.factTbl()
        // Two keys with DISTINCT aliases (two draws can hit the same
        // column with different moduli — same alias would emit duplicate
        // output column names).
        val gks = {
          var ks = g.groupKeys(t).distinctBy(_._2)
          var guard = 0
          while (ks.size < 2 && guard < 8) {
            ks = (ks ++ g.groupKeys(t)).distinctBy(_._2); guard += 1
          }
          ks.take(2)
        }
        // Near-unreachable fallback when 8 redraws never produced two
        // distinct keys: a SINGLE-key rollup, not ROLLUP(k1, k1) —
        // duplicate grouping-set expansion and GROUPING() resolution
        // for a repeated expression are not guaranteed to agree across
        // engines, so the duplicated-key shape could only ever yield a
        // false-positive divergence.
        val (k1, a1) = gks.head
        val (keySel, rollupKeys) = gks match {
          case Seq(_, (k2, a2)) =>
            (Seq(s"$k1 AS $a1", s"$k2 AS $a2",
              s"CAST(GROUPING($k1) AS INTEGER) AS g1",
              s"CAST(GROUPING($k2) AS INTEGER) AS g2"), s"$k1, $k2")
          case _ =>
            (Seq(s"$k1 AS $a1",
              s"CAST(GROUPING($k1) AS INTEGER) AS g1"), k1)
        }
        val sel = keySel ++ Seq(
          "CAST(COUNT(*) AS BIGINT) AS cnt",
          s"CAST(SUM(${g.intExpr(t)}) AS BIGINT) AS s_ie")
        // HAVING COUNT(*) > 0 is a no-op on every non-empty grouping-set
        // row (each aggregates >= 1 input row) and exists ONLY for the
        // empty-input corner this fuzzer caught on its first gen-2 run:
        // the ANSI expansion of ROLLUP includes the () set, which
        // aggregates globally and yields one cnt=0 row over an empty
        // input (DuckDB does this); Spark's grouping-sets Expand+
        // Aggregate yields zero rows. Pinned in ExtraQueriesSpec
        // ("rollup over an EMPTY input"); the clause makes the SHAPE
        // portable without losing rollup coverage.
        ("rollup",
          s"SELECT ${sel.mkString(", ")} FROM ${t.name} WHERE ${g.pred(t)} " +
            s"GROUP BY ROLLUP($rollupKeys) HAVING COUNT(*) > 0")
      case 14 => // global ORDER BY + LIMIT top-k (full-row total order)
        val t = g.tbl()
        val ord = t.cols.map(_.name + " NULLS FIRST").mkString(", ")
        ("order_limit",
          s"SELECT ${t.cols.map(_.name).mkString(", ")} FROM ${t.name} " +
            s"WHERE ${g.pred(t)} ORDER BY $ord LIMIT ${1 + g.int(30)}")
      case 16 => // decimal arithmetic + casts (v3 typed corner)
        // Every result column carries an EXPLICIT decimal type: + and *
        // follow the standard (s1+s2 / max-scale) rules both engines
        // share. DIVISION is deliberately absent — Spark's and DuckDB's
        // published result-scale rules for '/' genuinely differ, so it
        // can never be a same-type comparison. Down-scaling goes
        // through ROUND(x, 1) (half away from zero on BOTH engines),
        // never a bare down-scale CAST: this generator's first v3 run
        // caught that Spark's decimal→decimal cast ROUNDS half-up while
        // DuckDB's TRUNCATES toward zero (0.15 → 0.2 vs 0.1) — a REAL
        // cross-engine semantics difference, pinned as a spec in
        // ExtraQueriesSpec ("decimal down-scale cast rounds half-up").
        val t = g.pick(tables.filter(_.of('d').nonEmpty))
        val d1 = g.pick(t.of('d')).name
        val d2 = g.pick(t.of('d')).name
        val i1 = g.pick(t.of('i')).name
        val sel = (t.keys ++ Seq(
          s"CAST($d1 AS DECIMAL(18,2)) AS dec2",
          // exact 2-dec source → 1-dec via ROUND exercises decimal
          // rounding portably (see the cast-vs-truncate note above)
          s"CAST(ROUND(CAST($d1 AS DECIMAL(18,2)), 1) AS DECIMAL(18,1)) " +
            "AS dec1",
          s"CAST(CAST($d1 AS DECIMAL(18,2)) + CAST($d2 AS DECIMAL(18,2)) " +
            s"AS DECIMAL(20,2)) AS dsum",
          s"CAST(CAST($d1 AS DECIMAL(18,2)) * CAST(${1 + g.int(9)} " +
            s"AS DECIMAL(4,0)) AS DECIMAL(24,2)) AS dmul",
          s"CAST(CAST($i1 AS DECIMAL(18,0)) - CAST($d2 AS DECIMAL(18,2)) " +
            s"AS DECIMAL(20,2)) AS ddiff")).distinct
        ("decimal",
          s"SELECT ${sel.mkString(", ")} FROM ${t.name} WHERE ${g.pred(t)}")
      case 17 => // decimal aggregate (SUM over exact decimals)
        val t = g.pick(tables.filter(t =>
          t.of('d').nonEmpty && Set("orders", "lineitem", "customer")(t.name)))
        val d1 = g.pick(t.of('d')).name
        val gks = g.groupKeys(t)
        val sel = gks.map { case (e, a) => s"$e AS $a" } ++ Seq(
          s"CAST(SUM(CAST($d1 AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS dsum",
          s"MIN(CAST($d1 AS DECIMAL(18,2))) AS dmin",
          s"MAX(CAST($d1 AS DECIMAL(18,2))) AS dmax",
          "CAST(COUNT(*) AS BIGINT) AS cnt")
        ("decimal_agg",
          s"SELECT ${sel.mkString(", ")} FROM ${t.name} WHERE ${g.pred(t)} " +
            s"GROUP BY ${gks.map(_._1).mkString(", ")}")
      case 18 => // timestamp/interval arithmetic + DATE_TRUNC buckets
        val t = g.pick(tables.filter(_.of('t').nonEmpty))
        val ts = g.pick(t.of('t')).name
        val unit = g.pick(Seq("DAY", "MONTH"))
        val nU = 1 + g.int(if (unit == "DAY") 90 else 11)
        val bucket = g.pick(Seq("month", "year", "quarter", "week"))
        val cmp = s"TIMESTAMP '${1995 + g.int(6)}-0${1 + g.int(9)}-15 00:00:00'"
        val sel = Seq(
          s"CAST(DATE_TRUNC('$bucket', $ts) AS DATE) AS bkt",
          "CAST(COUNT(*) AS BIGINT) AS cnt",
          // shifted-bucket marker: month arithmetic clamps end-of-month
          // identically (add_months semantics) or this diverges loudly
          s"CAST(MIN(CAST($ts + INTERVAL $nU $unit AS DATE)) AS DATE) AS mn_shift",
          s"CAST(MAX(EXTRACT(${g.pick(Seq("MONTH", "DAY", "QUARTER"))} " +
            s"FROM $ts)) AS INTEGER) AS mx_part")
        ("interval_arith",
          s"SELECT ${sel.mkString(", ")} FROM ${t.name} " +
            s"WHERE $ts + INTERVAL $nU $unit ${g.pick(Seq("<=", ">"))} $cmp " +
            s"GROUP BY DATE_TRUNC('$bucket', $ts)")
      case 19 => // LIKE/_-wildcard/string-order edges + NULL 3VL in IN
        val (ct, cc, pt, pc) = g.pick(fks)
        val child = tables.find(_.name == ct).get
        val parent = tables.find(_.name == pt).get
        val sc = g.pick(child.of('s')).name
        val letter = ('a' + g.int(26)).toChar
        val strPred = g.int(4) match {
          case 0 => s"$sc LIKE '%${letter}_%'" // _ wildcard after a literal
          case 1 => s"$sc NOT LIKE '%$letter%'"
          case 2 => s"$sc ${g.pick(Seq("<", ">="))} '${letter.toUpper}'"
          case _ => s"UPPER($sc) LIKE '%${letter.toUpper}%'"
        }
        if (g.int(2) == 0) {
          // NULL-bearing NOT IN subquery: NULLIF plants a NULL, so NOT
          // IN must yield ZERO rows under three-valued logic on both
          // engines whenever the subquery is non-empty; IN is unfazed.
          val op = if (g.int(3) == 0) "NOT IN" else "IN"
          val nullAt = g.int(1000)
          ("null_3vl",
            s"SELECT ${(child.keys :+ cc).distinct.mkString(", ")} " +
              s"FROM $ct WHERE $cc $op " +
              s"(SELECT NULLIF($pc, $nullAt) FROM $pt WHERE ${g.pred(parent)}) " +
              s"AND $strPred")
        } else {
          // IN-list carrying an explicit NULL: matches stay true, the
          // rest evaluate UNKNOWN and filter out — never an error
          val ic = g.pick(child.of('i')).name
          val vals = Seq.fill(2)(g.int(2000)).distinct.mkString(", ")
          ("null_3vl",
            s"SELECT ${(child.keys :+ ic).distinct.mkString(", ")}, " +
              s"CASE WHEN $strPred THEN 'y' ELSE 'n' END AS sp " +
              s"FROM $ct WHERE $ic IN ($vals, NULL)")
        }
      case _ => // CTE aggregate joined back to its base table
        val t = g.factTbl()
        val (gk, _) = g.groupKeys(t).head
        val cols = (t.keys ++ Seq(g.pick(t.cols).name)).distinct
        ("cte_join_back",
          s"WITH grp AS (SELECT $gk AS k, CAST(COUNT(*) AS BIGINT) AS c " +
            s"FROM ${t.name} WHERE ${g.pred(t)} GROUP BY $gk) " +
            s"SELECT ${cols.mkString(", ")}, grp.c FROM ${t.name} " +
            s"JOIN grp ON $gk = grp.k WHERE ${g.pred(t)}")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/fuzz_out")
    val n = args.lift(2).map(_.toInt).getOrElse(200)
    val seed = args.lift(3).map(_.toLong).getOrElse(11L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.registerAll(spark, sfDir)
    new java.io.File(outDir).mkdirs()

    val g = new Gen(seed)
    val sqls = (0 until n).map { i => val (k, s) = shape(g)
      (f"f_${k}_$i%04d", k, s) }
    val kindCounts = sqls.groupBy(_._2).map { case (k, v) => k -> v.size }
    val failures = Seq.newBuilder[(String, String)]
    sqls.foreach { case (name, _, sql) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        failures += name -> (e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("").take(160))
        System.err.println(s"[fuzz] $name SPARK-SIDE FAILURE: $sql")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val failed = failures.result()
    val okSqls = sqls.filterNot(s => failed.exists(_._1 == s._1))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      okSqls.map { case (name, _, sql) => s"${q(name)}: ${q(sql)}" }
        .mkString("{", ",", "}"))
    println(s"""{"gen":$GenVersion,"seed":$seed,"n":$n,"sf":"$sfDir","spark_failures":${failed.size},""" +
      s""""kinds":{${kindCounts.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
      s""""failed":[${failed.map(f => q(f._1) + ":" + q(f._2)).mkString(",")}]}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
