"""Scalar-function surface, oracle-checked per category (SURVEY.md §2.B.7).

Each suite query routes through ``docker_neo4j_spark.functions.cypher`` (the
engine's Cypher→Spark mapping layer) and carries a DuckDB oracle twin.

Cross-engine exactness notes:
- transcendentals (exp/log/sin/...) are 1-ulp engine-dependent → exercised in
  pytest self-consistency tests, not oracle rows; sqrt/abs/round are IEEE-exact;
- all counts/sizes cast to BIGINT on the SQL side (Spark size() is INT, the
  canon step compares stringified ints so INT vs BIGINT is fine, but SUMs over
  lists differ in width — DuckDB list sums go HUGEINT);
- Cypher substring() is 0-based, SQL substr 1-based — the functions layer owns
  the shift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import cypher as cy
from ..sources.tpch import build_graph, load_tables
from . import register


@register(
    "fn_string_suite",
    """
    SELECT p_partkey,
           upper(p_name) AS u,
           lower(p_brand) AS lo,
           substr(p_name, 1, 5) AS sub5,
           replace(p_name, ' ', '_') AS repl,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
           left(p_type, 3) AS l3,
           right(p_type, 2) AS r2,
           reverse(p_brand) AS rev,
           CAST(length(p_name) AS BIGINT) AS n_chars,
           p_brand || ':' || p_type AS tag
    FROM part
    """,
)
def fn_string_suite(spark, sf_dir):
    """toUpper/toLower/substring/replace/split/left/right/reverse/size/concat."""
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        cy.toUpper("p_name").alias("u"),
        cy.toLower("p_brand").alias("lo"),
        cy.substring("p_name", 0, 5).alias("sub5"),
        cy.replace("p_name", " ", "_").alias("repl"),
        cy.size_list(cy.split("p_name", " ")).cast("long").alias("n_tokens"),
        cy.left("p_type", 3).alias("l3"),
        cy.right("p_type", 2).alias("r2"),
        cy.reverse("p_brand").alias("rev"),
        cy.size("p_name").cast("long").alias("n_chars"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("tag"),
    )


@register(
    "fn_math_suite",
    """
    SELECT o_orderkey,
           abs(o_totalprice - 100000) AS a,
           CAST(ceil(o_totalprice) AS BIGINT) AS ce,
           CAST(floor(o_totalprice) AS BIGINT) AS fl,
           round(o_totalprice, 1) AS r1,
           CAST(sign(o_totalprice - 30000) AS BIGINT) AS sg,
           sqrt(o_totalprice) AS sq
    FROM orders
    """,
)
def fn_math_suite(spark, sf_dir):
    """abs/ceil/floor/round/sign/sqrt — the IEEE-exact math core."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        cy.abs_(F.col("o_totalprice") - 100000).alias("a"),
        cy.ceil("o_totalprice").alias("ce"),
        cy.floor("o_totalprice").alias("fl"),
        cy.round_("o_totalprice", 1).alias("r1"),
        cy.sign(F.col("o_totalprice") - 30000).cast("long").alias("sg"),
        cy.sqrt("o_totalprice").alias("sq"),
    )


@register(
    "fn_casts_tostring",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_back,
           CAST('3.5' AS DOUBLE) + o_totalprice * 0 AS f,
           strftime(o_orderdate, '%Y-%m-%d') AS d_str
    FROM orders
    """,
)
def fn_casts_tostring(spark, sf_dir):
    """toString/toInteger/toFloat + date formatting."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        cy.toString("o_orderkey").alias("key_str"),
        cy.toInteger(cy.toString("o_orderkey")).alias("key_back"),
        (cy.toFloat(F.lit("3.5")) + F.col("o_totalprice") * 0).alias("f"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d_str"),
    )


@register(
    "fn_list_suite",
    """
    SELECT doc_id,
           string_split(text, ' ')[1] AS head_tok,
           string_split(text, ' ')[-1] AS last_tok,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(len(string_split(text, ' ')) - 1 AS BIGINT) AS n_tail,
           CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x)), 'sum') AS BIGINT) AS sum_len,
           CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS BIGINT) AS n_long
    FROM documents
    """,
)
def fn_list_suite(spark, sf_dir):
    """head/last/size/tail/reduce/[x IN l WHERE p] over split tokens."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = cy.split("text", " ")
    return d.select(
        "doc_id",
        cy.head(toks).alias("head_tok"),
        cy.last(toks).alias("last_tok"),
        cy.size_list(toks).cast("long").alias("n_tok"),
        cy.size_list(cy.tail(toks)).cast("long").alias("n_tail"),
        cy.reduce_(
            cy.list_comprehension(toks, extract=lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        cy.size_list(cy.list_comprehension(toks, predicate=lambda x: F.length(x) > 4))
        .cast("long")
        .alias("n_long"),
    )


@register(
    "fn_range_reduce",
    """
    SELECT p_partkey,
           CAST(list_aggregate(generate_series(1, p_size), 'sum') AS BIGINT) AS tri,
           CAST(len(generate_series(1, p_size, 2)) AS BIGINT) AS n_odd
    FROM part
    """,
)
def fn_range_reduce(spark, sf_dir):
    """range(a,b[,step]) + reduce — sequence arithmetic."""
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        cy.reduce_(
            cy.range_(1, F.col("p_size")), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("tri"),
        cy.size_list(cy.range_(1, F.col("p_size"), 2)).cast("long").alias("n_odd"),
    )


@register(
    "fn_map_json_suite",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           array_to_string(json_keys(props), ',') AS keys_csv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS m_k
    FROM events
    """,
)
def fn_map_json_suite(spark, sf_dir):
    """JSON path extract + fromJsonMap + map keys()/m[key] accessors."""
    ev = load_tables(spark, sf_dir)["events"]
    m = cy.from_json_map("props")
    return ev.select(
        "event_id",
        cy.json_extract("props", "$.k").cast("long").alias("k_val"),
        F.concat_ws(",", F.array_sort(cy.keys(m))).alias("keys_csv"),
        cy.map_get(m, "k").cast("long").alias("m_k"),
    )


@register(
    "fn_temporal_accessors",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(isodow(o_orderdate) AS INT) AS dow
    FROM orders
    """,
)
def fn_temporal_accessors(spark, sf_dir):
    """d.year/d.month/d.day/d.dayOfWeek (ISO: 1=Monday)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        cy.year("o_orderdate").alias("y"),
        cy.month("o_orderdate").alias("mo"),
        cy.day("o_orderdate").alias("d"),
        cy.dayOfWeek("o_orderdate").alias("dow"),
    )


@register(
    "fn_event_time_accessors",
    """
    SELECT event_id,
           CAST(hour(ts) AS INT) AS h,
           CAST(minute(ts) AS INT) AS mi,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_str
    FROM events
    """,
)
def fn_event_time_accessors(spark, sf_dir):
    """hour/minute + truncate on the nanosecond events timeline."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.select(
        "event_id",
        cy.hour("ts").alias("h"),
        cy.minute("ts").alias("mi"),
        F.date_format(cy.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day_str"),
    )


@register(
    "fn_temporal_arith",
    """
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 3 DAY, '%Y-%m-%d') AS plus3,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
    FROM orders
    """,
)
def fn_temporal_arith(spark, sf_dir):
    """datetime.truncate / + duration({days}) / duration.between().days."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.date_format(cy.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(cy.plus_days("o_orderdate", 3), "yyyy-MM-dd").alias("plus3"),
        cy.duration_between_days(F.lit("1995-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_since"
        ),
    )


@register(
    "fn_case_coalesce",
    """
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                ELSE 'other' END AS status_word,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'WAS_URGENT') AS prio
    FROM orders
    """,
)
def fn_case_coalesce(spark, sf_dir):
    """CASE WHEN + coalesce + null plumbing (nullif)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        cy.case_when(
            [
                (F.col("o_orderstatus") == "F", F.lit("finished")),
                (F.col("o_orderstatus") == "O", F.lit("open")),
            ],
            otherwise=F.lit("other"),
        ).alias("status_word"),
        cy.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("WAS_URGENT")).alias(
            "prio"
        ),
    )


@register(
    "fn_labels_type_id",
    """
    SELECT * FROM (
      SELECT 'IN_REGION' AS type, CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n,
             CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_ids
      UNION ALL SELECT 'IN_NATION',
             CAST((SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier) AS BIGINT),
             CAST((SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier) AS BIGINT)
      UNION ALL SELECT 'PLACED', CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
             CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
      UNION ALL SELECT 'CONTAINS', CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
      UNION ALL SELECT 'SUPPLIED_BY', CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    ) t
    """,
)
def fn_labels_type_id(spark, sf_dir):
    """type(r) accessor + id(r) uniqueness — distinct ids must equal rows."""
    g = build_graph(spark, sf_dir)
    return g.rels.groupBy(cy.type_().alias("type")).agg(
        F.count("*").alias("n"), F.countDistinct("id").alias("n_ids")
    )


@register(
    "fn_properties_map",
    """
    SELECT c_custkey,
           'c_custkey=' || CAST(c_custkey AS VARCHAR)
             || ';c_mktsegment=' || c_mktsegment
             || ';c_name=' || c_name AS props_str
    FROM customer
    """,
)
def fn_properties_map(spark, sf_dir):
    """properties(n) → map, surfaced as sorted k=v string."""
    c = load_tables(spark, sf_dir)["customer"]
    m = cy.properties("c_custkey", "c_mktsegment", "c_name")
    return c.select(
        "c_custkey",
        F.concat_ws(
            ";",
            F.transform(
                F.array_sort(F.map_entries(m)),
                lambda e: F.concat(e.key, F.lit("="), e.value),
            ),
        ).alias("props_str"),
    )


@register(
    "fn_approx_count_distinct",
    """
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS within_tolerance
    FROM orders
    """,
)
def fn_approx_count_distinct(spark, sf_dir):
    """approx_count_distinct — HLL estimate vs the exact count.

    The raw HLL estimate is engine-specific (Spark's HLL++ vs DuckDB's
    HLL differ), so the gradeable surface is the PIPELINE SHAPE: the
    exact count plus a boolean asserting the estimate landed within
    3×rsd of it (HLL++'s standard-error bound at rsd=0.05 → ±15%,
    comfortably satisfied at every SF). Both columns are deterministic,
    so the row is oracle-paired — this replaces the permanently
    ungradeable rows-only form whose only possible driver verdict was
    ``err: no_oracle`` (r2)."""
    o = load_tables(spark, sf_dir)["orders"]
    rsd = 0.05
    return o.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_customers"),
        cy.approx_count_distinct("o_custkey", rsd).alias("_approx"),
    ).select(
        "exact_customers",
        (
            F.abs(F.col("_approx") - F.col("exact_customers"))
            <= F.lit(3 * rsd) * F.col("exact_customers")
        ).alias("within_tolerance"),
    )


@register(
    "fn_point_suite",
    """
    SELECT c_custkey,
           CAST(c_acctbal AS DOUBLE) AS px,
           CAST(c_nationkey AS DOUBLE) AS py,
           sqrt((c_acctbal - 1000.0) * (c_acctbal - 1000.0)
                + (c_nationkey - 12.0) * (c_nationkey - 12.0)) AS dist,
           (c_acctbal >= 0.0 AND c_acctbal <= 5000.0
            AND c_nationkey >= 0.0 AND c_nationkey <= 12.0) AS in_box
    FROM customer
    """,
)
def fn_point_suite(spark, sf_dir):
    """POINT shim: MAP-form construction point({x, y}) (the documented
    Neo4j surface — r11), accessors, cartesian point.distance
    (IEEE-exact: *, −, +, sqrt only — oracle-safe), point.withinBBox."""
    c = load_tables(spark, sf_dir)["customer"]
    p = cy.point({"x": F.col("c_acctbal"), "y": F.col("c_nationkey")})
    ref = cy.point({"x": 1000.0, "y": 12.0})
    return c.select(
        "c_custkey",
        cy.point_x(p).alias("px"),
        cy.point_y(p).alias("py"),
        cy.point_distance(p, ref).alias("dist"),
        cy.point_within_bbox(
            p, cy.point({"x": 0.0, "y": 0.0}), cy.point({"x": 5000.0, "y": 12.0})
        ).alias("in_box"),
    )


@register(
    "fn_apoc_text_suite",
    """
    SELECT c_custkey,
           CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev,
           CASE WHEN greatest(length(c_name), length(c_mktsegment)) = 0
                THEN 1.0e0
                ELSE 1.0e0 - CAST(levenshtein(c_name, c_mktsegment) AS DOUBLE)
                     / greatest(length(c_name), length(c_mktsegment)) END AS lev_sim,
           upper(substr(c_name, 1, 1)) || substr(c_name, 2) AS capitalized,
           lower(regexp_replace(c_name, '[^A-Za-z0-9]+', '', 'g')) AS cleaned,
           repeat(c_mktsegment, 2) AS doubled,
           CAST(strpos(c_name, '#') - 1 AS BIGINT) AS hash_idx,
           CAST(ascii(substr(c_name, 10, 1)) AS BIGINT) AS char9
    FROM customer
    """,
)
def fn_apoc_text_suite(spark, sf_dir):
    """apoc.text.* — levenshteinDistance/levenshteinSimilarity/capitalize/
    clean/repeat/indexOf/charAt over customer rows (plugin declared at
    reference calver/coredb/neo4j-plugins.json:3-8; the repo's own test
    calls RETURN apoc.version() at TestConfSettings.java:411)."""
    from ..functions import apoc

    c = load_tables(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        apoc.text_levenshtein_distance("c_name", "c_mktsegment").alias("lev"),
        apoc.text_levenshtein_similarity("c_name", "c_mktsegment").alias("lev_sim"),
        apoc.text_capitalize("c_name").alias("capitalized"),
        apoc.text_clean("c_name").alias("cleaned"),
        apoc.text_repeat("c_mktsegment", 2).alias("doubled"),
        apoc.text_index_of("c_name", "#").alias("hash_idx"),
        apoc.text_char_at("c_name", 9).alias("char9"),
    )


@register(
    "fn_apoc_text_fuzzy_suite",
    """
    WITH s AS (
      SELECT c_custkey, c_name, c_mktsegment,
             lower(c_name) AS la, lower(c_mktsegment) AS lb,
             list_filter(regexp_split_to_array(lower(c_name), '[^a-z0-9]+'),
                         p -> p != '') AS parts
      FROM customer),
    g AS (
      SELECT *,
             CASE WHEN length(la) >= 2
                  THEN list_transform(generate_series(1, length(la) - 1),
                                      i -> substr(la, i, 2))
                  ELSE [] END AS ga,
             CASE WHEN length(lb) >= 2
                  THEN list_transform(generate_series(1, length(lb) - 1),
                                      i -> substr(lb, i, 2))
                  ELSE [] END AS gb
      FROM s)
    SELECT c_custkey,
           coalesce(parts[1], '')
             || array_to_string(list_transform(list_slice(parts, 2, len(parts)),
                  p -> upper(substr(p, 1, 1)) || substr(p, 2)), '') AS camel,
           array_to_string(list_transform(parts,
                  p -> upper(substr(p, 1, 1)) || substr(p, 2)), '') AS upper_camel,
           regexp_replace(trim(c_name), '[^A-Za-z0-9]+', '-', 'g') AS slug,
           levenshtein(c_name, c_mktsegment)
             <= (CASE WHEN length(c_name) < 3 THEN 0
                      WHEN length(c_name) <= 5 THEN 1 ELSE 2 END) AS fuzzy,
           CASE WHEN len(ga) + len(gb) = 0 THEN 1.0e0
                ELSE 2.0e0 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(list_distinct(ga),
                         gr -> CAST(least(len(list_filter(ga, x -> x = gr)),
                                          len(list_filter(gb, x -> x = gr)))
                               AS BIGINT))),
                       (acc, x) -> acc + x) AS DOUBLE)
                     / CAST(len(ga) + len(gb) AS DOUBLE) END AS sorensen_dice
    FROM g
    """,
)
def fn_apoc_text_fuzzy_suite(spark, sf_dir):
    """apoc.text.* fuzzy/case family — sorensenDiceSimilarity (multiset
    character bigrams), fuzzyMatch (Lucene length-banded edit allowance),
    camelCase / upperCamelCase / slug — over customer rows. All per-row
    HOF/builtin expressions; the Dice ratio is one exact
    2·BIGINT/BIGINT → DOUBLE division on both engines."""
    from ..functions import apoc

    c = load_tables(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        apoc.text_camel_case("c_name").alias("camel"),
        apoc.text_upper_camel_case("c_name").alias("upper_camel"),
        apoc.text_slug("c_name").alias("slug"),
        apoc.text_fuzzy_match("c_name", "c_mktsegment").alias("fuzzy"),
        apoc.text_sorensen_dice_similarity("c_name", "c_mktsegment").alias(
            "sorensen_dice"
        ),
    )


@register(
    "fn_apoc_coll_suite",
    """
    WITH per_nation AS (
      SELECT n_name,
             list_sort(list(c_custkey ORDER BY c_custkey)) AS ks
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name
    )
    SELECT n_name,
           CAST(list_aggregate(ks, 'sum') AS BIGINT) AS k_sum,
           CAST(list_aggregate(ks, 'sum') AS DOUBLE) / len(ks) AS k_avg,
           CAST(list_aggregate(ks, 'min') AS BIGINT) AS k_min,
           CAST(list_aggregate(ks, 'max') AS BIGINT) AS k_max,
           CAST(len(list_distinct(ks)) AS BIGINT) AS n_set,
           CASE WHEN len(ks) < 2 THEN ''
                ELSE array_to_string(
                  list_transform(range(1, len(ks)),
                                 i -> CAST(ks[i] AS VARCHAR) || '-' || CAST(ks[i+1] AS VARCHAR)),
                  ',') END AS pairs_str,
           COALESCE(array_to_string(
             list_sort(list_intersect(ks, [1,2,3,4,5,6,7,8,9,10])), ','), '') AS small_keys,
           CAST(len(list_filter(ks, x -> x % 2 = 0)) AS BIGINT) AS n_even
    FROM per_nation
    """,
)
def fn_apoc_coll_suite(spark, sf_dir):
    """apoc.coll.* — sum/avg/min/max/toSet/pairs/intersection plus a
    filter count, over per-nation customer-key lists (collect_list with a
    total sort order so both engines build the identical list)."""
    from ..functions import apoc

    t = load_tables(spark, sf_dir)
    c, n = t["customer"], t["nation"]
    ks = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sort_array(F.collect_list("c_custkey")).alias("ks"))
    )
    small = F.array([F.lit(i) for i in range(1, 11)])
    return ks.select(
        "n_name",
        apoc.coll_sum("ks").cast("long").alias("k_sum"),
        apoc.coll_avg("ks").alias("k_avg"),
        apoc.coll_min("ks").cast("long").alias("k_min"),
        apoc.coll_max("ks").cast("long").alias("k_max"),
        F.size(apoc.coll_to_set("ks")).cast("long").alias("n_set"),
        apoc.coll_pairs_joined("ks").alias("pairs_str"),
        F.array_join(
            apoc.coll_intersection("ks", small.cast("array<bigint>")), ","
        ).alias("small_keys"),
        F.size(F.filter(F.col("ks"), lambda x: x % 2 == 0)).cast("long").alias("n_even"),
    )


@register(
    "fn_gds_similarity_suite",
    """
    WITH pair AS (
      SELECT a.vec_id, a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    ),
    folds AS (
      SELECT vec_id,
        list_reduce(list_prepend(0.0, list_transform(range(1, len(ea) + 1),
          i -> ea[i]::DOUBLE * eb[i]::DOUBLE)), (acc, x) -> acc + x) AS dot,
        list_reduce(list_prepend(0.0, list_transform(range(1, len(ea) + 1),
          i -> ea[i]::DOUBLE * ea[i]::DOUBLE)), (acc, x) -> acc + x) AS na,
        list_reduce(list_prepend(0.0, list_transform(range(1, len(eb) + 1),
          i -> eb[i]::DOUBLE * eb[i]::DOUBLE)), (acc, x) -> acc + x) AS nb,
        list_reduce(list_prepend(0.0, list_transform(range(1, len(ea) + 1),
          i -> (ea[i]::DOUBLE - eb[i]::DOUBLE) * (ea[i]::DOUBLE - eb[i]::DOUBLE))),
          (acc, x) -> acc + x) AS sqdiff,
        list_reduce(list_prepend(0.0, list_transform(range(1, len(ea) + 1),
          i -> ea[i]::DOUBLE)), (acc, x) -> acc + x) AS sx,
        list_reduce(list_prepend(0.0, list_transform(range(1, len(eb) + 1),
          i -> eb[i]::DOUBLE)), (acc, x) -> acc + x) AS sy,
        CAST(len(ea) AS DOUBLE) AS n
      FROM pair
    )
    SELECT vec_id,
           CAST(ROUND(dot / greatest(sqrt(na) * sqrt(nb), 1e-12) * 1e6) AS BIGINT) AS cos_micro,
           CAST(ROUND(sqrt(sqdiff) * 1e6) AS BIGINT) AS dist_micro,
           CAST(ROUND(1e0 / (1e0 + sqrt(sqdiff)) * 1e6) AS BIGINT) AS euc_micro,
           CAST(ROUND((n * dot - sx * sy)
             / NULLIF(sqrt(n * na - sx * sx) * sqrt(n * nb - sy * sy), 0)
             * 1e6) AS BIGINT) AS pearson_micro
    FROM folds
    """,
)
def fn_gds_similarity_suite(spark, sf_dir):
    """gds.similarity.* scalar functions (functions/gds.py): cosine /
    euclideanDistance / euclidean / pearson over consecutive embedding pairs —
    sequential zip_with+aggregate folds, bit-matched against DuckDB
    list_reduce folds and surfaced as micro-rounded integers."""
    from ..functions import gds as G

    e = load_tables(spark, sf_dir)["embeddings"]
    a = e.select(F.col("vec_id"), F.col("embedding").alias("ea"))
    b = e.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("eb"))
    pair = a.join(b, "vec_id")
    return pair.select(
        "vec_id",
        F.round(G.cosine("ea", "eb") * F.lit(1e6)).cast("long").alias("cos_micro"),
        F.round(G.euclidean_distance("ea", "eb") * F.lit(1e6)).cast("long").alias("dist_micro"),
        F.round(G.euclidean("ea", "eb") * F.lit(1e6)).cast("long").alias("euc_micro"),
        F.round(G.pearson("ea", "eb") * F.lit(1e6)).cast("long").alias("pearson_micro"),
    )


@register(
    "fn_apoc_map_suite",
    """
    SELECT n_name,
           'id=' || CAST(n_nationkey AS VARCHAR) || ',name=' || n_name
             || ',region=' || CAST(n_regionkey AS VARCHAR) AS merged_str,
           'id=' || CAST(n_nationkey * 2 AS VARCHAR)
             || ',region=' || CAST(n_regionkey AS VARCHAR) AS setkey_str,
           'id=' || CAST(n_nationkey AS VARCHAR) || ',name=' || n_name AS removed_str,
           CAST(n_regionkey AS VARCHAR) AS got_region,
           'missing' AS got_default,
           'id,region' AS keys_str
    FROM nation
    """,
)
def fn_apoc_map_suite(spark, sf_dir):
    """apoc.map.* — fromPairs/merge/setKey/removeKey/get/keys over per-row
    maps built from nation columns, rendered through the sorted 'k=v'
    serialization (map columns don't hash across engines; strings do).
    The oracle constructs the same strings directly, so this checks the
    Spark map plumbing end-to-end against a closed form."""
    from ..functions import apoc

    n = load_tables(spark, sf_dir)["nation"]
    m1 = apoc.map_from_pairs(
        F.array(F.lit("id"), F.lit("region")),
        F.array(F.col("n_nationkey").cast("string"), F.col("n_regionkey").cast("string")),
    )
    m2 = apoc.map_from_pairs(F.array(F.lit("name")), F.array(F.col("n_name")))
    merged = apoc.map_merge(m1, m2)
    return n.select(
        "n_name",
        apoc.map_sorted_join(merged).alias("merged_str"),
        apoc.map_sorted_join(
            apoc.map_set_key(m1, "id", (F.col("n_nationkey") * 2).cast("string"))
        ).alias("setkey_str"),
        apoc.map_sorted_join(apoc.map_remove_key(merged, "region")).alias("removed_str"),
        apoc.map_get(m1, "region").alias("got_region"),
        apoc.map_get(m1, "absent", "missing").alias("got_default"),
        F.array_join(apoc.map_keys_sorted(m1), ",").alias("keys_str"),
    )


@register(
    "fn_apoc_date_suite",
    """
    SELECT o_orderkey,
           epoch_ms(o_orderdate) AS ms,
           strftime(o_orderdate, '%Y/%m/%d %H:%M') AS fmt,
           epoch_ms(strptime(strftime(o_orderdate, '%Y/%m/%d %H:%M'),
                             '%Y/%m/%d %H:%M')) // 1000 AS parsed_s,
           epoch_ms(o_orderdate) // 1000 + 45 * 86400 AS plus45d_s,
           epoch_ms(o_orderdate) // 86400000 AS in_days,
           CAST(year(o_orderdate) AS INT) AS yr,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '.000Z' AS iso,
           epoch_ms(o_orderdate) AS iso_roundtrip_ms
    FROM orders
    """,
)
def fn_apoc_date_suite(spark, sf_dir):
    """apoc.date.* — format/parse/add/convert/field/toISO8601/fromISO8601
    over order dates (epoch-integer temporal helpers; plugin manifest at
    the reference's calver/coredb/neo4j-plugins.json:3-8). Fixed-length
    TimeUnit arithmetic in UTC, all built-in Column expressions; the
    fromISO8601(toISO8601(ms)) round trip is asserted against the raw
    epoch by the oracle."""
    from ..functions import apoc

    o = load_tables(spark, sf_dir)["orders"]
    # o_orderdate is TIMESTAMP_NTZ; the session tz is pinned UTC
    # (session.py:34) so the cast to instant is the identity mapping.
    ms = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    fmt = apoc.date_format(ms, "ms", "yyyy/MM/dd HH:mm")
    return o.select(
        "o_orderkey",
        ms.alias("ms"),
        fmt.alias("fmt"),
        apoc.date_parse(fmt, "s", "yyyy/MM/dd HH:mm").alias("parsed_s"),
        apoc.date_add(apoc.date_convert(ms, "ms", "s"), "s", 45, "d").alias(
            "plus45d_s"
        ),
        apoc.date_convert(ms, "ms", "d").alias("in_days"),
        apoc.date_field(ms, "ms", "years").alias("yr"),
        apoc.date_to_iso8601(ms, "ms").alias("iso"),
        apoc.date_from_iso8601(apoc.date_to_iso8601(ms, "ms")).alias(
            "iso_roundtrip_ms"
        ),
    )


@register(
    "fn_apoc_agg_stats_suite",
    """
    SELECT l_returnflag,
           CAST(COUNT(l_quantity) AS BIGINT) AS n,
           MIN(l_quantity) AS qty_min,
           MAX(l_quantity) AS qty_max,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_sum,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(l_quantity) AS qty_mean,
           SQRT(GREATEST(
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(38,6))
                           * CAST(l_quantity AS DECIMAL(38,6))
                           AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity)
             - (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                / COUNT(l_quantity))
               * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(l_quantity)),
             0.0)) AS qty_stdev,
           quantile_cont(l_quantity, 0.5) AS qty_median,
           quantile_cont(l_quantity, 0.9) AS qty_p90,
           min_by(l_extendedprice,
                  l_linenumber * 1099511627776
                  + CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS first_price,
           max_by(l_extendedprice,
                  l_linenumber * 1099511627776
                  + CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS last_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def fn_apoc_agg_stats_suite(spark, sf_dir):
    """apoc.agg.statistics / median / percentiles / first / last over
    lineitem quantities per return flag. The first/last order key embeds
    the value itself (linenumber·2⁴⁰ + price-cents) — (orderkey,
    linenumber) is NOT unique in this corpus, and a key tie must imply an
    identical output value for min_by to be deterministic."""
    from ..functions import apoc

    li = load_tables(spark, sf_dir)["lineitem"]
    key = F.col("l_linenumber").cast("long") * F.lit(1099511627776) + F.round(
        F.col("l_extendedprice") * 100
    ).cast("long")
    st = apoc.agg_statistics(F.col("l_quantity"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            st.alias("st"),
            apoc.agg_median(F.col("l_quantity")).alias("qty_median"),
            apoc.agg_percentile(F.col("l_quantity"), 0.9).alias("qty_p90"),
            apoc.agg_first(F.col("l_extendedprice"), key).alias("first_price"),
            apoc.agg_last(F.col("l_extendedprice"), key).alias("last_price"),
        )
        .select(
            "l_returnflag",
            F.col("st.count").alias("n"),
            F.col("st.min").alias("qty_min"),
            F.col("st.max").alias("qty_max"),
            F.col("st.sum").alias("qty_sum"),
            F.col("st.mean").alias("qty_mean"),
            F.col("st.stdev").alias("qty_stdev"),
            "qty_median",
            "qty_p90",
            "first_price",
            "last_price",
        )
        .orderBy("l_returnflag")
    )


@register(
    "fn_apoc_agg_items_suite",
    """
    WITH f AS (SELECT * FROM lineitem WHERE l_orderkey % 997 = 0),
    m AS (SELECT l_orderkey, MAX(l_quantity) AS mq, MIN(l_quantity) AS nq
          FROM f GROUP BY l_orderkey)
    SELECT f.l_orderkey,
           product(f.l_linenumber) AS ln_product,
           MAX(m.mq) AS max_qty,
           STRING_AGG(CASE WHEN f.l_quantity = m.mq
                           THEN CAST(f.l_linenumber AS VARCHAR) END,
                      ',' ORDER BY f.l_linenumber) AS max_items,
           MAX(m.nq) AS min_qty,
           STRING_AGG(CASE WHEN f.l_quantity = m.nq
                           THEN CAST(f.l_linenumber AS VARCHAR) END,
                      ',' ORDER BY f.l_linenumber) AS min_items,
           COALESCE(array_to_string(
             (list(CAST(f.l_quantity AS VARCHAR)
                   ORDER BY f.l_linenumber, f.l_quantity))[2:3], ','), '')
             AS qty_slice
    FROM f JOIN m USING (l_orderkey)
    GROUP BY f.l_orderkey ORDER BY f.l_orderkey
    """,
)
def fn_apoc_agg_items_suite(spark, sf_dir):
    """apoc.agg.product / maxItems / minItems / slice per sampled order
    (orderkey ≡ 0 mod 997 keeps the output bounded at any sf). Items and
    slices surface as csv strings (the catalog's array-hash convention);
    the slice orders by (linenumber, quantity) because linenumber alone is
    not unique."""
    from ..functions import apoc

    li = load_tables(spark, sf_dir)["lineitem"].where(F.col("l_orderkey") % 997 == 0)
    csv = lambda c: F.concat_ws(",", F.transform(c, lambda i: i.cast("string")))
    return (
        li.groupBy("l_orderkey")
        .agg(
            apoc.agg_product(F.col("l_linenumber")).alias("ln_product"),
            apoc.agg_max_items(F.col("l_linenumber"), F.col("l_quantity")).alias("mx"),
            apoc.agg_min_items(F.col("l_linenumber"), F.col("l_quantity")).alias("mn"),
            apoc.agg_slice(
                F.col("l_quantity").cast("string"),
                F.struct(F.col("l_linenumber"), F.col("l_quantity")),
                1,
                2,
            ).alias("sl"),
        )
        .select(
            "l_orderkey",
            "ln_product",
            F.col("mx.value").alias("max_qty"),
            csv(F.col("mx.items")).alias("max_items"),
            F.col("mn.value").alias("min_qty"),
            csv(F.col("mn.items")).alias("min_items"),
            F.concat_ws(",", F.col("sl")).alias("qty_slice"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "fn_apoc_util_number_suite",
    """
    SELECT c_custkey,
           md5(c_name || CAST(c_custkey AS VARCHAR)) AS h_md5,
           sha256(c_name) AS h_sha256,
           printf('%.2f', c_acctbal) AS bal_fmt,
           TRY_CAST(c_name AS BIGINT) AS parsed_int,
           TRY_CAST(substr(c_name, 10) AS DOUBLE) AS parsed_tail,
           to_base64(encode(c_mktsegment)) AS seg_b64,
           c_mktsegment AS seg_roundtrip
    FROM customer ORDER BY c_custkey LIMIT 200
    """,
)
def fn_apoc_util_number_suite(spark, sf_dir):
    """apoc.util.md5/sha256, apoc.number.format/parseInt/parseFloat,
    apoc.text.base64Encode/Decode over customer rows. parseInt on a
    non-numeric name is NULL (try-cast semantics both engines);
    parsed_tail try-parses the numeric suffix of Customer#... names."""
    from ..functions import apoc

    c = load_tables(spark, sf_dir)["customer"]
    return (
        c.select(
            "c_custkey",
            apoc.util_md5([F.col("c_name"), F.col("c_custkey")]).alias("h_md5"),
            apoc.util_sha256([F.col("c_name")]).alias("h_sha256"),
            apoc.number_format(F.col("c_acctbal"), 2).alias("bal_fmt"),
            apoc.number_parse_int(F.col("c_name")).alias("parsed_int"),
            apoc.number_parse_float(F.substring(F.col("c_name"), 10, 100)).alias(
                "parsed_tail"
            ),
            apoc.text_base64_encode(F.col("c_mktsegment")).alias("seg_b64"),
            apoc.text_base64_decode(
                apoc.text_base64_encode(F.col("c_mktsegment"))
            ).alias("seg_roundtrip"),
        )
        .orderBy("c_custkey")
        .limit(200)
    )


@register(
    "fn_apoc_coll_suite2",
    """
    WITH per_nation AS (
      SELECT n_name,
             list_sort(list(c_custkey ORDER BY c_custkey)) AS ks,
             list_sort(list(c_mktsegment ORDER BY c_custkey)) AS segs
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name
    )
    SELECT n_name,
           array_to_string(
             list_transform(range(0, CAST(ceil(len(ks) / 3.0) AS BIGINT)),
               i -> array_to_string(ks[(i*3+1):(i*3+3)], ',')), ';') AS parts,
           COALESCE(array_to_string(
             list_sort(list_distinct(
               list_filter(segs, s -> len(list_filter(segs, t -> t = s)) > 1))),
             ','), '') AS dup_segs,
           CAST(len(list_filter(segs, s -> s = 'BUILDING')) AS BIGINT)
             AS n_building,
           array_to_string(list_reverse(ks)[1:4], ',') AS last4_desc
    FROM per_nation ORDER BY n_name
    """,
)
def fn_apoc_coll_suite2(spark, sf_dir):
    """apoc.coll.partition / duplicates / occurrences / reverse over
    per-nation lists (keys sorted, segments ordered by key so both
    engines fold the identical list). Partition renders as ';'-joined
    ','-sublists; duplicates over the segment list where repeats really
    occur."""
    from ..functions import apoc

    t = load_tables(spark, sf_dir)
    c, n = t["customer"], t["nation"]
    per = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sort_array(F.collect_list("c_custkey")).alias("ks"),
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("c_custkey", "c_mktsegment"))
                ),
                lambda s: s["c_mktsegment"],
            ).alias("segs"),
        )
    )
    csv = lambda col: F.concat_ws(",", F.transform(col, lambda i: i.cast("string")))
    return per.select(
        "n_name",
        F.concat_ws(
            ";", F.transform(apoc.coll_partition(F.col("ks"), 3), csv)
        ).alias("parts"),
        F.concat_ws(",", apoc.coll_duplicates(F.col("segs"))).alias("dup_segs"),
        apoc.coll_occurrences(F.col("segs"), "BUILDING").alias("n_building"),
        csv(F.slice(apoc.coll_reverse(F.col("ks")), 1, 4)).alias("last4_desc"),
    ).orderBy("n_name")


@register(
    "fn_apoc_text_phonetic",
    r"""
    WITH words AS (
      SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part
    ),
    s1 AS (
      SELECT w, upper(regexp_replace(w, '[^A-Za-z]', '', 'g')) AS L FROM words
    ),
    s2 AS (
      SELECT w, L,
             CASE WHEN L = '' THEN '' ELSE
               -- adjacent-run collapse as a linear fold (RE2 has no
               -- backreferences, so (\d)\1+ is not expressible)
               list_reduce(
                 list_prepend('', string_split(
                   translate(L[1] || regexp_replace(L[2:], '[HW]', '', 'g'),
                     'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                     '01230120022455012623010202'), '')),
                 (acc, ch) -> CASE WHEN right(acc, 1) = ch THEN acc
                              ELSE acc || ch END)
             END AS coll
      FROM s1
    )
    SELECT w,
           CASE WHEN L = '' THEN ''
                ELSE L[1] || substr(replace(coll[2:], '0', '') || '000', 1, 3)
           END AS sx,
           lower(regexp_replace(w || '-9 X', '[^A-Za-z0-9]', '', 'g')) AS cleaned
    FROM s2 ORDER BY w
    """,
)
def fn_apoc_text_phonetic(spark, sf_dir):
    """apoc.text.phonetic (US Soundex incl. the H/W adjacency rule) +
    apoc.text.clean over the distinct part-name words — the Spark side is
    the JVM soundex expression; the DuckDB side re-derives the algorithm
    from scratch (translate + run-collapse + vowel-drop), so a semantic
    drift in either implementation breaks the hash."""
    from ..functions import apoc

    p = load_tables(spark, sf_dir)["part"]
    words = p.select(F.explode(F.split("p_name", " ")).alias("w")).distinct()
    return words.select(
        "w",
        apoc.text_phonetic(F.col("w")).alias("sx"),
        apoc.text_clean(F.concat(F.col("w"), F.lit("-9 X"))).alias("cleaned"),
    ).orderBy("w")
