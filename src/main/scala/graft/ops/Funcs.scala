package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Scalar functions (SURVEY.md §2.8): string / regexp / date / math /
  * json / array builtins — the GA dimension-filter and derived-metric
  * surface (`=@` contains, `=~` regex, date rollups, custom-dimension
  * JSON payloads).
  *
  * All of these are codegen'd Catalyst expressions evaluated inside
  * WholeStageCodegen — per-row cost only, no shuffle, so they scale
  * linearly with input bytes. Every double output is rounded per the
  * SURVEY §2 determinism rules; integer-typed results are cast so the
  * Spark schema matches the DuckDB oracle's (the driver compares
  * schemas, and DuckDB LENGTH/YEAR return BIGINT where Spark returns
  * INT).
  */
object Funcs extends OpModule {

  /** upper/lower/substr/concat/length/trim/replace/split/like/nullif. */
  val stringFuncs = Op(
    "string_funcs",
    (s, d) =>
      Tables(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        lower(col("p_brand")).as("brand_lo"),
        substring(col("p_name"), 1, 5).as("name_pre"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"),
        expr("replace(p_name, ' ', '_')").as("name_us"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        col("p_name").like("%wid%").as("has_wid"),
        coalesce(expr("nullif(p_type, 'PROMO')"), lit("(promo)")).as("type_or")),
    Some("""
      SELECT p_partkey,
             UPPER(p_name) AS name_up,
             LOWER(p_brand) AS brand_lo,
             SUBSTRING(p_name, 1, 5) AS name_pre,
             CONCAT_WS('|', p_brand, p_type) AS brand_type,
             CAST(LENGTH(p_name) AS INT) AS name_len,
             TRIM(CONCAT(' ', p_name, ' ')) AS name_trim,
             REPLACE(p_name, ' ', '_') AS name_us,
             string_split(p_name, ' ')[1] AS first_word,
             p_name LIKE '%wid%' AS has_wid,
             COALESCE(NULLIF(p_type, 'PROMO'), '(promo)') AS type_or
      FROM part"""))

  /** regexp_extract / regexp count / rlike — only patterns with
    * identical Java/RE2 semantics (SURVEY §2 rule 8: literal classes,
    * no lookaround). */
  val regexpFuncs = Op(
    "regexp_funcs",
    (s, d) =>
      Tables(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        expr("regexp_count(p_name, '[aeiou]')").as("n_vowels"),
        col("p_name").rlike("^[a-m]").as("starts_am")),
    Some("""
      SELECT p_partkey,
             regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             CAST(LENGTH(regexp_extract_all(p_name, '[aeiou]')) AS INT)
               AS n_vowels,
             regexp_matches(p_name, '^[a-m]') AS starts_am
      FROM part"""))

  /** year/month/quarter/date_trunc/datediff rollup (GA ga:date →
    * ga:month). Grouping on the derived year/month keeps the output
    * small; at scale this is the classic date-rollup cube. */
  val dateFuncs = Op(
    "date_funcs",
    (s, d) =>
      Tables(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"),
          max(datediff(col("o_orderdate"), lit("1995-01-01")))
            .as("max_day_off"))
        .withColumn("month_start", make_date(col("yr"), col("mo"), lit(1))),
    Some("""
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(quarter(o_orderdate) AS INT) AS qtr,
             COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS total,
             CAST(MAX(date_diff('day', DATE '1995-01-01',
                                 CAST(o_orderdate AS DATE))) AS INT)
               AS max_day_off,
             make_date(CAST(year(o_orderdate) AS INT),
                       CAST(month(o_orderdate) AS INT), 1) AS month_start
      FROM orders
      GROUP BY 1, 2, 3"""))

  /** Per-row math: ceil/floor/abs/greatest exact; sqrt/ln/power are
    * transcendental (JVM vs libm may differ in the last ulp) so they
    * are rounded to 6 dp, where a decision-boundary hit is
    * improbable for irrational results. */
  val mathFuncs = Op(
    "math_funcs",
    (s, d) =>
      Tables(s, d, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        ceil(col("l_extendedprice")).as("ceil_p"),
        floor(col("l_extendedprice")).as("floor_p"),
        abs(col("l_discount") - lit(0.05)).as("abs_d"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
        round(log(col("l_extendedprice")), 6).as("ln_p"),
        round(pow(lit(1.0) + col("l_discount"), 2), 6).as("pow_d")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_p,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_p,
             ABS(l_discount - 0.05) AS abs_d,
             GREATEST(l_tax, l_discount) AS max_rate,
             ROUND(SQRT(l_quantity), 6) AS sqrt_q,
             ROUND(LN(l_extendedprice), 6) AS ln_p,
             ROUND(POWER(1.0 + l_discount, 2), 6) AS pow_d
      FROM lineitem"""))

  /** JSON payload extraction (GA custom dimensions): props is exactly
    * {"k": N}. */
  val jsonFuncs = Op(
    "json_funcs",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(
          round(avg(col("k")), 4).as("avg_k"),
          max(col("k")).as("max_k"),
          min(col("k")).as("min_k"),
          count(lit(1)).as("n")),
    Some("""
      SELECT event_type,
             ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4)
               AS avg_k,
             MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
             MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
             COUNT(*) AS n
      FROM events GROUP BY event_type"""))

  /** Array basics over the embedding column: size / element_at /
    * explicit head-8 sum (explicit adds, not a fold, so both engines
    * accumulate in the same order; floats widened to double first). */
  val arrayBasic = Op(
    "array_basic",
    (s, d) => {
      val sum8 = (1 to 8)
        .map(i => element_at(col("embedding"), i).cast("double"))
        .reduce(_ + _)
      Tables(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
        round(element_at(col("embedding"), 64).cast("double"), 6).as("e64"),
        round(sum8, 6).as("sum8"))
    },
    Some("""
      SELECT vec_id,
             CAST(len(embedding) AS INT) AS dim,
             ROUND(CAST(embedding[1] AS DOUBLE), 6) AS e1,
             ROUND(CAST(embedding[64] AS DOUBLE), 6) AS e64,
             ROUND(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                 + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)
                 + CAST(embedding[5] AS DOUBLE) + CAST(embedding[6] AS DOUBLE)
                 + CAST(embedding[7] AS DOUBLE) + CAST(embedding[8] AS DOUBLE),
               6) AS sum8
      FROM embeddings"""))

  /** Map functions over the props payload (SURVEY §2.8 map surface):
    * from_json→map, map_concat with a column-built map, sorted-key
    * projection (map entry order is never part of the contract — the
    * deterministic read is array_sort(map_keys) + element_at lookups),
    * element_at, size. The oracle mirrors the VALUES (DuckDB's JSON
    * path + the same constant keys), not Spark's map layout.
    *
    * Keys/vals are emitted pipe-JOINED STRINGS, not arrays: the
    * driver's pandas compare cannot sort/hash ndarray cells
    * (CORRECTNESS_r03 `unhashable type: numpy.ndarray`). Values are
    * coalesced to a sentinel first so neither engine's join-skips-null
    * behavior is ever exercised. */
  val mapFuncs = Op(
    "map_funcs",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("event_id") < 500)
      val m = map_concat(
        from_json(col("props"), MapType(StringType, StringType)),
        map(lit("type"), col("event_type"),
          lit("uid"), col("user_id").cast("string")))
      ev.withColumn("m", m)
        .select(
          col("event_id"),
          concat_ws("|", array_sort(map_keys(col("m")))).as("keys"),
          concat_ws("|",
            transform(array_sort(map_keys(col("m"))),
              k => coalesce(element_at(col("m"), k), lit("<null>"))))
            .as("vals"),
          element_at(col("m"), "k").as("k_val"),
          size(col("m")).as("n_entries"))
    },
    Some("""
      SELECT event_id,
             'k|type|uid' AS keys,
             concat_ws('|',
               COALESCE(json_extract_string(props, '$.k'), '<null>'),
               COALESCE(event_type, '<null>'),
               COALESCE(CAST(user_id AS VARCHAR), '<null>')) AS vals,
             json_extract_string(props, '$.k') AS k_val,
             3 AS n_entries
      FROM events WHERE event_id < 500"""))

  override def ops: Seq[Op] =
    Seq(stringFuncs, regexpFuncs, dateFuncs, mathFuncs, jsonFuncs,
      arrayBasic, mapFuncs)
}
