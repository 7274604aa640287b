"""APOC core function library → built-in Spark Column expressions.

The reference declares the apoc plugin in every manifest
(calver/coredb/neo4j-plugins.json:3-8) and its own test suite calls
``RETURN apoc.version()`` (TestConfSettings.java:411); the plugin's public
function surface (apoc.text.*, apoc.coll.*, apoc.map.*) is therefore part
of the packaged query capability. Every function here compiles to JVM-side
``pyspark.sql.functions`` expressions — no UDFs, whole-stage-codegen
friendly — and each is exercised by an oracle-paired catalog row
(``fn_apoc_text_suite`` / ``fn_apoc_coll_suite``).

Semantics follow the published APOC docs; where APOC is 0-based
(indexOf) the 0-based contract is kept even though Spark's builtins are
1-based.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# ---- apoc.text.* --------------------------------------------------------


def text_levenshtein_distance(a, b) -> Column:
    """apoc.text.levenshteinDistance — edit distance (JVM built-in)."""
    return F.levenshtein(_c(a), _c(b)).cast("long")


def text_levenshtein_similarity(a, b) -> Column:
    """apoc.text.levenshteinSimilarity = 1 - dist/maxLen."""
    dist = F.levenshtein(_c(a), _c(b)).cast("double")
    mx = F.greatest(F.length(_c(a)), F.length(_c(b))).cast("double")
    return F.when(mx == 0, F.lit(1.0)).otherwise(F.lit(1.0) - dist / mx)


def text_hamming_distance(a, b) -> Column:
    """apoc.text.hammingDistance — differing positions; length diff counts."""
    ca, cb = _c(a), _c(b)
    n = F.least(F.length(ca), F.length(cb))
    same = F.when(n <= 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: ca.substr(i, F.lit(1)) == cb.substr(i, F.lit(1)),
            )
        )
    )
    return (F.greatest(F.length(ca), F.length(cb)) - same).cast("long")


def text_capitalize(x) -> Column:
    """apoc.text.capitalize — first char uppercased, rest untouched."""
    c = _c(x)
    return F.concat(
        F.upper(F.substring(c, 1, 1)), F.substring(c, F.lit(2), F.length(c))
    )


def text_clean(x) -> Column:
    """apoc.text.clean — lowercase, strip everything non-alphanumeric."""
    return F.lower(F.regexp_replace(_c(x), "[^A-Za-z0-9]+", ""))


def text_join(parts: Column, delim: str) -> Column:
    """apoc.text.join(list, delim)."""
    return F.array_join(parts, delim)


def text_repeat(x, times: int) -> Column:
    """apoc.text.repeat(item, count)."""
    return F.repeat(_c(x), times)


def text_index_of(x, lookup: str) -> Column:
    """apoc.text.indexOf — 0-based, -1 when absent (Spark instr is
    1-based with 0-absent; shift by one)."""
    return (F.instr(_c(x), lookup) - 1).cast("long")


def text_char_at(x, index: int) -> Column:
    """apoc.text.charAt — 0-based character code at index."""
    return F.ascii(F.substring(_c(x), index + 1, 1)).cast("long")


def text_swap_case(x) -> Column:
    """apoc.text.swapCase — per-char case flip (regexp-free builtin mix)."""
    c = _c(x)
    chars = F.split(c, "")
    flipped = F.transform(
        chars,
        lambda ch: F.when(ch == F.upper(ch), F.lower(ch)).otherwise(F.upper(ch)),
    )
    return F.array_join(flipped, "")


def _char_bigrams(c: Column) -> Column:
    """Multiset of character bigrams (empty below length 2)."""
    return F.when(
        F.length(c) >= 2,
        F.transform(F.sequence(F.lit(1), F.length(c) - 1), lambda i: c.substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))


def text_sorensen_dice_similarity(a, b) -> Column:
    """apoc.text.sorensenDiceSimilarity — 2·|A∩B| / (|A|+|B|) over the
    MULTISET of character bigrams of the lowercased strings (the
    published short-string similarity); 1.0 when neither side has a
    bigram. Per-row HOF arithmetic — quadratic only in the string's own
    bigram count."""
    ga, gb = _char_bigrams(F.lower(_c(a))), _char_bigrams(F.lower(_c(b)))
    inter2 = F.aggregate(
        F.array_distinct(ga),
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.least(
            F.size(F.filter(ga, lambda x: x == g)),
            F.size(F.filter(gb, lambda x: x == g)),
        ).cast("long"),
    )
    denom = (F.size(ga) + F.size(gb)).cast("long")
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.lit(2.0) * inter2.cast("double") / denom.cast("double")
    )


def text_fuzzy_match(a, b) -> Column:
    """apoc.text.fuzzyMatch — Lucene FuzzyQuery rule: edits allowed by
    first-term length (<3 → 0, 3–5 → 1, >5 → 2); true when the edit
    distance fits."""
    ca, cb = _c(a), _c(b)
    n = F.length(ca)
    allowed = F.when(n < 3, F.lit(0)).when(n <= 5, F.lit(1)).otherwise(F.lit(2))
    return F.levenshtein(ca, cb) <= allowed


def _words_lower(x) -> Column:
    return F.filter(
        F.split(F.lower(_c(x)), "[^a-z0-9]+"), lambda p: p != F.lit("")
    )


def text_camel_case(x) -> Column:
    """apoc.text.camelCase — 'FOO BAR' → 'fooBar': split on
    non-alphanumerics, lowercase, capitalize every part but the first."""
    parts = _words_lower(x)
    first = F.coalesce(F.element_at(parts, 1), F.lit(""))
    rest = F.transform(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
        lambda p: F.concat(F.upper(p.substr(F.lit(1), F.lit(1))), p.substr(F.lit(2), F.length(p))),
    )
    return F.concat(first, F.array_join(rest, ""))


def text_upper_camel_case(x) -> Column:
    """apoc.text.upperCamelCase — 'FOO BAR' → 'FooBar'."""
    parts = F.transform(
        _words_lower(x),
        lambda p: F.concat(F.upper(p.substr(F.lit(1), F.lit(1))), p.substr(F.lit(2), F.length(p))),
    )
    return F.array_join(parts, "")


def text_slug(x, sep: str = "-") -> Column:
    """apoc.text.slug — trim, collapse every non-alphanumeric run to the
    separator (case preserved, per the APOC doc)."""
    return F.regexp_replace(F.trim(_c(x)), "[^A-Za-z0-9]+", sep)


# ---- apoc.coll.* --------------------------------------------------------


def coll_sum(l) -> Column:
    """apoc.coll.sum — list sum via fold (no explode/shuffle). Accumulates
    as DOUBLE (APOC's sum returns float; the old long accumulator
    silently truncated float elements — r9 fix). Integer callers cast
    the whole-valued result back."""
    return F.aggregate(
        _c(l), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )


def coll_avg(l) -> Column:
    """apoc.coll.avg."""
    c = _c(l)
    return F.when(F.size(c) > 0, coll_sum(c) / F.size(c))


def coll_min(l) -> Column:
    """apoc.coll.min."""
    return F.array_min(_c(l))


def coll_max(l) -> Column:
    """apoc.coll.max."""
    return F.array_max(_c(l))


def coll_to_set(l) -> Column:
    """apoc.coll.toSet — order-preserving distinct."""
    return F.array_distinct(_c(l))


def coll_sort(l) -> Column:
    """apoc.coll.sort."""
    return F.array_sort(_c(l))


def coll_contains(l, value) -> Column:
    """apoc.coll.contains."""
    return F.array_contains(_c(l), value)


def coll_index_of(l, value) -> Column:
    """apoc.coll.indexOf — 0-based, -1 when absent."""
    return (
        F.coalesce(F.array_position(_c(l), value), F.lit(0)) - 1
    ).cast("long")


def coll_pairs_joined(l, sep: str = ",") -> Column:
    """apoc.coll.pairs rendered as 'a-b'-joined string — consecutive
    pairs [a,b],[b,c],… (string form keeps the cross-engine compare
    struct-free)."""
    c = _c(l)
    return F.when(F.size(c) < 2, F.lit("")).otherwise(
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.size(c) - 1),
                lambda i: F.concat(
                    F.element_at(c, i).cast("string"),
                    F.lit("-"),
                    F.element_at(c, i + 1).cast("string"),
                ),
            ),
            sep,
        )
    )


def coll_flatten(ll) -> Column:
    """apoc.coll.flatten — one nesting level."""
    return F.flatten(_c(ll))


def coll_union(a, b) -> Column:
    """apoc.coll.union — distinct union, sorted for determinism."""
    return F.array_sort(F.array_distinct(F.concat(_c(a), _c(b))))


def coll_intersection(a, b) -> Column:
    """apoc.coll.intersection — sorted distinct intersection."""
    return F.array_sort(F.array_intersect(_c(a), _c(b)))


def coll_subtract(a, b) -> Column:
    """apoc.coll.subtract — sorted distinct difference."""
    return F.array_sort(F.array_except(_c(a), _c(b)))


def coll_zip_joined(a, b, sep: str = ",") -> Column:
    """apoc.coll.zip rendered as 'a:b'-joined string (pads nothing —
    stops at the shorter list, like APOC)."""
    ca, cb = _c(a), _c(b)
    n = F.least(F.size(ca), F.size(cb))
    return F.when(n <= 0, F.lit("")).otherwise(
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat(
                    F.element_at(ca, i).cast("string"),
                    F.lit(":"),
                    F.element_at(cb, i).cast("string"),
                ),
            ),
            sep,
        )
    )


def coll_frequencies_joined(l) -> Column:
    """apoc.coll.frequencies rendered as sorted 'item:count' string."""
    c = _c(l)
    uniq = F.array_sort(F.array_distinct(c))
    return F.array_join(
        F.transform(
            uniq,
            lambda u: F.concat(
                u.cast("string"),
                F.lit(":"),
                F.size(F.filter(c, lambda x: x == u)).cast("string"),
            ),
        ),
        ",",
    )


# ---- apoc.map.* ---------------------------------------------------------


def map_from_pairs(keys, values) -> Column:
    """apoc.map.fromPairs / fromLists — build a map from two parallel
    arrays (the APOC pair-list collapses to this once unzipped)."""
    return F.map_from_arrays(_c(keys), _c(values))


def map_merge(a, b) -> Column:
    """apoc.map.merge — right side wins on duplicate keys (APOC contract).
    The left is pre-filtered so the merge never trips Spark's default
    EXCEPTION dedup policy and stays policy-independent."""
    left, right = _c(a), _c(b)
    rk = F.map_keys(right)
    return F.map_concat(
        F.map_filter(left, lambda k, _: ~F.array_contains(rk, k)), right
    )


def map_set_key(m, key: str, value) -> Column:
    """apoc.map.setKey — upsert one entry."""
    val = value if isinstance(value, Column) else F.lit(value)
    return F.map_concat(
        F.map_filter(_c(m), lambda k, _: k != F.lit(key)),
        F.map_from_arrays(F.array(F.lit(key)), F.array(val)),
    )


def map_remove_key(m, key: str) -> Column:
    """apoc.map.removeKey."""
    return F.map_filter(_c(m), lambda k, _: k != F.lit(key))


def map_get(m, key: str, default=None) -> Column:
    """apoc.map.get with a default (APOC throws without one; here the
    default is surfaced as NULL unless given)."""
    got = F.element_at(_c(m), F.lit(key))
    if default is None:
        return got
    d = default if isinstance(default, Column) else F.lit(default)
    return F.coalesce(got, d)


def map_keys_sorted(m) -> Column:
    """apoc.map.keys rendered in sorted order (APOC preserves insertion
    order; Spark maps are unordered, so a total order is the stable
    cross-engine rendering)."""
    return F.array_sort(F.map_keys(_c(m)))


def map_submap(m, keys) -> Column:
    """apoc.map.submap — keep only the listed keys."""
    ks = _c(keys)
    return F.map_filter(_c(m), lambda k, _: F.array_contains(ks, k))


def map_from_pair_list(pairs) -> Column:
    """apoc.map.fromPairs — ``[[k, v], …]`` → map (keys stringified,
    the APOC contract)."""
    c = _c(pairs)
    return F.map_from_arrays(
        F.transform(c, lambda p: F.element_at(p, 1).cast("string")),
        F.transform(c, lambda p: F.try_element_at(p, 2)),
    )


def temporal_format(value, fmt: str) -> Column:
    """apoc.temporal.format — Java DateTimeFormatter pattern over a
    date/datetime value."""
    return F.date_format(_c(value), fmt)


def text_split(s, regex: str) -> Column:
    """apoc.text.split — regex split (unlike Cypher's literal split())."""
    return F.split(_c(s), regex)


def text_url_encode(s) -> Column:
    """apoc.text.urlencode."""
    return F.url_encode(_c(s))


def text_url_decode(s) -> Column:
    """apoc.text.urldecode."""
    return F.url_decode(_c(s))


def text_lpad(s, count: int, delim: str = " ") -> Column:
    """apoc.text.lpad."""
    return F.lpad(_c(s), int(count), delim)


def text_rpad(s, count: int, delim: str = " ") -> Column:
    """apoc.text.rpad."""
    return F.rpad(_c(s), int(count), delim)


def text_snake_case(s) -> Column:
    """apoc.text.snakeCase — dash-separated lower (APOC's contract:
    'testSnakeCase' → 'test-snake-case'; camel humps split first)."""
    c = F.regexp_replace(_c(s), r"([a-z0-9])([A-Z])", r"$1 $2")
    return F.lower(
        F.regexp_replace(
            F.regexp_replace(F.trim(c), r"[^A-Za-z0-9]+", "-"), r"^-+|-+$", ""
        )
    )


def text_regex_groups(s, pattern: str) -> Column:
    """apoc.text.regexGroups — per match, [full, group1, …, groupN].
    The group count is static (compiled from the pattern Python-side);
    each match's groups re-extract from the matched span JVM-side."""
    import re as _re

    n = _re.compile(pattern).groups
    c = _c(s)
    full = F.regexp_extract_all(c, F.lit(pattern), 0)
    return F.transform(
        full,
        lambda m: F.array(
            m, *[F.regexp_extract(m, pattern, g) for g in range(1, n + 1)]
        ),
    )


def map_sorted_join(m, pair_sep: str = "=", item_sep: str = ",") -> Column:
    """Render a map as the sorted 'k=v' joined string — the hash-stable
    serialization every map-valued oracle row goes through (map column
    types don't sort/hash across engines; strings do)."""
    return F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(_c(m)),
                lambda e: F.concat(
                    e["key"].cast("string"), F.lit(pair_sep), e["value"].cast("string")
                ),
            )
        ),
        item_sep,
    )


# ---- apoc.date.* --------------------------------------------------------
#
# APOC's temporal helpers operate on integer epochs in a caller-chosen
# unit (apoc.date.format / parse / add / convert / field / toISO8601 —
# published APOC core surface; plugin declared at the reference's
# calver/coredb/neo4j-plugins.json:3-8). All arithmetic is fixed-length
# (TimeUnit semantics: 1 d = 86_400_000 ms — no calendars, no DST), so
# every helper compiles to pure integer/column expressions; the session
# timezone is pinned to UTC (session.py:34) which matches APOC's default.

_UNIT_MS: dict[str, int] = {
    "ms": 1,
    "s": 1_000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
}


def _unit_ms(unit: str) -> int:
    try:
        return _UNIT_MS[unit]
    except KeyError:
        raise ValueError(
            f"unsupported time unit {unit!r} (supported: {sorted(_UNIT_MS)})"
        ) from None


def date_format(time, unit: str, fmt: str) -> Column:
    """apoc.date.format(time, unit, format) — epoch integer in ``unit``
    rendered through a Java datetime pattern, UTC."""
    ms = _c(time).cast("long") * F.lit(_unit_ms(unit))
    return F.date_format(F.timestamp_millis(ms), fmt)


def date_parse(text, unit: str, fmt: str) -> Column:
    """apoc.date.parse(text, unit, format) — string → epoch integer in
    ``unit`` (truncating division, TimeUnit.convert semantics)."""
    ms = F.unix_millis(F.to_timestamp(_c(text), fmt))
    return (ms / F.lit(_unit_ms(unit))).cast("long")


def date_add(time, unit: str, add_value: int, add_unit: str) -> Column:
    """apoc.date.add(time, unit, addValue, addUnit) — fixed-length
    arithmetic in ``unit``."""
    ms = _c(time).cast("long") * F.lit(_unit_ms(unit))
    out = ms + F.lit(int(add_value) * _unit_ms(add_unit))
    return (out / F.lit(_unit_ms(unit))).cast("long")


def date_convert(time, unit: str, to_unit: str) -> Column:
    """apoc.date.convert(time, unit, toUnit) — truncating unit change."""
    ms = _c(time).cast("long") * F.lit(_unit_ms(unit))
    return (ms / F.lit(_unit_ms(to_unit))).cast("long")


_DATE_FIELDS = {
    "years": F.year,
    "months": F.month,
    "days": F.dayofmonth,
    "hours": F.hour,
    "minutes": F.minute,
    "seconds": F.second,
}


def date_field(time, unit: str, field: str) -> Column:
    """apoc.date.field(time, unit, field) — calendar field of the epoch,
    UTC. Fields use APOC's plural names (years/months/days/…)."""
    try:
        fn = _DATE_FIELDS[field]
    except KeyError:
        raise ValueError(
            f"unsupported field {field!r} (supported: {sorted(_DATE_FIELDS)})"
        ) from None
    ms = _c(time).cast("long") * F.lit(_unit_ms(unit))
    return fn(F.timestamp_millis(ms)).cast("int")


def date_to_iso8601(time, unit: str) -> Column:
    """apoc.date.toISO8601(time, unit) — UTC 'Z'-suffixed rendering with
    millisecond precision (APOC's yyyy-MM-dd'T'HH:mm:ss.SSS'Z')."""
    return date_format(time, unit, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")


def date_from_iso8601(text) -> Column:
    """apoc.date.fromISO8601(text) — ISO string → epoch millis."""
    return F.unix_millis(
        F.to_timestamp(_c(text), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    )


# ---- apoc.agg.* ---------------------------------------------------------
# Aggregate-position functions (used inside groupBy().agg(...)). All are
# built-in aggregate expressions; the item-collecting ones materialize one
# group's items in the aggregation buffer (bounded by group size — same
# contract as APOC's own collecting aggregates).


def agg_statistics(x) -> Column:
    """apoc.agg.statistics — {count,min,max,sum,mean,stdev} in one pass.

    Sums go through DECIMAL so the result is partition-order independent;
    mean/stdev (population) derive from those exact sums — the catalog's
    oracle-exactness convention."""
    c = _c(x)
    d = c.cast("decimal(38,6)")
    n = F.count(c)
    s = F.sum(d).cast("double")
    s2 = F.sum((d * d).cast("decimal(38,6)")).cast("double")
    mean = s / n
    var = s2 / n - mean * mean
    return F.struct(
        n.alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        s.alias("sum"),
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("stdev"),
    )


def agg_median(x) -> Column:
    """apoc.agg.median — linear-interpolated (continuous) median."""
    return F.percentile(_c(x), F.lit(0.5))


def agg_percentile(x, p: float) -> Column:
    """apoc.agg.percentiles — one continuous percentile (call per p)."""
    return F.percentile(_c(x), F.lit(p))


def agg_first(value, order) -> Column:
    """apoc.agg.first with an explicit total order (APOC's first() follows
    stream order, which a distributed engine must replace with a
    deterministic key): the value at the minimum order key."""
    return F.min_by(_c(value), _c(order))


def agg_last(value, order) -> Column:
    """apoc.agg.last — the value at the maximum order key."""
    return F.max_by(_c(value), _c(order))


def agg_max_items(item, value) -> Column:
    """apoc.agg.maxItems — {value: max, items: [every item at the max]},
    items ascending (APOC returns them in an unspecified order; sorted is
    the deterministic choice)."""
    lst = F.sort_array(
        F.collect_list(F.struct(_c(value).alias("v"), _c(item).alias("i"))),
        asc=False,
    )
    top = F.element_at(lst, 1)["v"]
    items = F.sort_array(
        F.transform(F.filter(lst, lambda s: s["v"] == top), lambda s: s["i"])
    )
    return F.struct(top.alias("value"), items.alias("items"))


def agg_min_items(item, value) -> Column:
    """apoc.agg.minItems — {value: min, items: [...]}, items ascending."""
    lst = F.sort_array(
        F.collect_list(F.struct(_c(value).alias("v"), _c(item).alias("i")))
    )
    bot = F.element_at(lst, 1)["v"]
    items = F.sort_array(
        F.transform(F.filter(lst, lambda s: s["v"] == bot), lambda s: s["i"])
    )
    return F.struct(bot.alias("value"), items.alias("items"))


def agg_product(x) -> Column:
    """apoc.agg.product — product of the group's values. Folded over the
    SORTED value list so the fp rounding order is deterministic (exact
    whenever the values and running products are integers < 2^53)."""
    return F.aggregate(
        F.sort_array(F.collect_list(_c(x).cast("double"))),
        F.lit(1.0),
        lambda acc, v: acc * v,
    )


def agg_slice(item, order, frm: int, count: int) -> Column:
    """apoc.agg.slice — ``count`` items starting at 0-based ``frm`` of the
    group's items under an explicit total order."""
    lst = F.sort_array(
        F.collect_list(F.struct(_c(order).alias("o"), _c(item).alias("i")))
    )
    return F.transform(F.slice(lst, frm + 1, count), lambda s: s["i"])


# ---- apoc.util.* / apoc.number.* ----------------------------------------


def util_md5(parts: list) -> Column:
    """apoc.util.md5 — md5 over the concatenated string forms of the
    values (APOC concatenates with no separator)."""
    return F.md5(F.concat(*[_c(p).cast("string") for p in parts]))


def util_sha256(parts: list) -> Column:
    """apoc.util.sha256 — sha-256 hex over the concatenated values."""
    return F.sha2(F.concat(*[_c(p).cast("string") for p in parts]), 256)


def util_sha1(parts: list) -> Column:
    """apoc.util.sha1 — sha-1 hex over the concatenated values."""
    return F.sha1(F.concat(*[_c(p).cast("string") for p in parts]))


def number_format(x, decimals: int = 0) -> Column:
    """apoc.number.format, fixed-decimals subset ('#.##'-family patterns
    expressed as a decimals count). Grouping separators are deliberately
    NOT offered — DuckDB's formatter cannot reproduce them for floats, so
    the surface is restricted to what replays engine-exactly."""
    return F.format_string(f"%.{int(decimals)}f", _c(x).cast("double"))


def number_parse_int(s) -> Column:
    """apoc.number.parseInt — NULL on unparseable input (try-cast)."""
    return _c(s).try_cast("long")


def number_parse_float(s) -> Column:
    """apoc.number.parseFloat — NULL on unparseable input."""
    return _c(s).try_cast("double")


def text_base64_encode(s) -> Column:
    """apoc.text.base64Encode."""
    return F.base64(_c(s).cast("binary"))


def text_base64_decode(s) -> Column:
    """apoc.text.base64Decode."""
    return F.unbase64(_c(s)).cast("string")


def coll_partition(l, size: int) -> Column:
    """apoc.coll.partition — split into consecutive sublists of ``size``
    (trailing partial kept)."""
    if size <= 0:
        raise ValueError("apoc.coll.partition: size must be positive")
    c = _c(l)
    n_parts = F.ceil(F.size(c) / F.lit(float(size))).cast("int")
    parts = F.transform(
        F.sequence(F.lit(0), F.greatest(n_parts - 1, F.lit(0))),
        lambda i: F.slice(c, i * size + 1, size),
    )
    # Empty input yields NO partitions (APOC), not one empty partition —
    # sequence(0, greatest(-1,0)) above would still emit index 0; a
    # zero-length slice keeps the array<array<T>> type without naming T.
    return F.when(F.size(c) == 0, F.slice(parts, 1, 0)).otherwise(parts)


def coll_duplicates(l) -> Column:
    """apoc.coll.duplicates — distinct values occurring more than once,
    ascending (APOC leaves order unspecified; sorted is deterministic)."""
    c = _c(l)
    return F.sort_array(
        F.array_distinct(
            F.filter(
                c,
                lambda x: F.size(F.filter(c, lambda y: y == x)) > 1,
            )
        )
    )


def coll_occurrences(l, value) -> Column:
    """apoc.coll.occurrences — how many times ``value`` appears."""
    v = value if isinstance(value, Column) else F.lit(value)
    return F.size(F.filter(_c(l), lambda x: x == v)).cast("long")


def coll_reverse(l) -> Column:
    """apoc.coll.reverse."""
    return F.reverse(_c(l))


def coll_zip(a, b) -> Column:
    """apoc.coll.zip — pairwise [a[i], b[i]] (struct-typed pairs: Spark
    arrays are homogeneous, a struct carries mixed element types)."""
    return F.arrays_zip(_c(a), _c(b))


def coll_pairs(l) -> Column:
    """apoc.coll.pairs — adjacent pairs [x0,x1],[x1,x2],…,[xn,null]."""
    c = _c(l)
    return F.transform(
        c,
        lambda x, i: F.struct(
            x.alias("first"), F.try_element_at(c, i + 2).alias("second")
        ),
    )


def coll_frequencies(l) -> Column:
    """apoc.coll.frequencies — {item, count} structs, item-ascending
    (APOC leaves order unspecified; sorted is deterministic)."""
    c = _c(l)
    return F.transform(
        F.array_sort(F.array_distinct(c)),
        lambda u: F.struct(
            u.alias("item"),
            F.size(F.filter(c, lambda x: x == u)).cast("long").alias("count"),
        ),
    )


def text_phonetic(s) -> Column:
    """apoc.text.phonetic — US-English Soundex of the letters (non-letter
    characters stripped first, so 'Mc Donald' codes as MCDONALD; empty /
    letterless input → ''). Delegates to the JVM soundex expression;
    the oracle replays the exact algorithm (first letter + H/W-deleted
    code string, adjacent-run collapse, vowel separators dropped,
    zero-padded to 4)."""
    letters = F.regexp_replace(_c(s), "[^A-Za-z]", "")
    return F.when(letters == F.lit(""), F.lit("")).otherwise(F.soundex(letters))



def create_uuid() -> Column:
    """apoc.create.uuid — v4 UUID text."""
    return F.uuid()


def text_format(fmt: str, args: list) -> Column:
    """apoc.text.format — printf-style formatting (%s/%d/%f)."""
    cooked = [a if isinstance(a, Column) else F.lit(a) for a in (args or [])]
    return F.format_string(fmt, *cooked)


# ---- r13: doc-name alias sweep (VERDICT r12 missing #2) ------------------
# apoc.text.distance is the canonical docs alias of levenshteinDistance;
# the rest are documented APOC functions users reach for alongside it,
# all expressible as builtin Column compositions (no UDFs).


def text_distance(a, b) -> Column:
    """apoc.text.distance — docs alias of apoc.text.levenshteinDistance."""
    return text_levenshtein_distance(a, b)


def text_compare_cleaned(a, b) -> Column:
    """apoc.text.compareCleaned — equality after apoc.text.clean on both."""
    return text_clean(a) == text_clean(b)


def text_replace(s, regex: str, replacement: str) -> Column:
    """apoc.text.replace — regex replace (alias: apoc.text.regreplace)."""
    return F.regexp_replace(_c(s), regex, replacement)


def text_byte_count(s, charset: str = "UTF-8") -> Column:
    """apoc.text.byteCount — encoded byte length (UTF-8)."""
    return F.octet_length(_c(s)).cast("long")


def coll_sum_longs(l) -> Column:
    """apoc.coll.sumLongs — integer sum (truncating float elements)."""
    return coll_sum(l).cast("long")


def coll_remove_all(l, values) -> Column:
    """apoc.coll.removeAll — drop every occurrence of each value (keeps
    duplicates of the survivors, unlike array_except which dedups)."""
    vals = _c(values)
    return F.filter(_c(l), lambda x: ~F.array_contains(vals, x))


def coll_contains_all(l, values) -> Column:
    """apoc.coll.containsAll — every value present in the collection."""
    vals, c = _c(values), _c(l)
    return F.size(F.filter(vals, lambda v: F.array_contains(c, v))) == F.size(vals)


def coll_fill(item, count: int) -> Column:
    """apoc.coll.fill — list of `count` copies of the item."""
    return F.array_repeat(_c(item) if isinstance(item, Column) else F.lit(item), count)


def coll_different(l) -> Column:
    """apoc.coll.different — true when all elements are distinct."""
    c = _c(l)
    return F.size(F.array_distinct(c)) == F.size(c)


def coll_drop_duplicate_neighbors(l) -> Column:
    """apoc.coll.dropDuplicateNeighbors — collapse adjacent duplicates."""
    c = _c(l)
    idx = F.sequence(F.lit(1), F.size(c))
    keep = F.filter(
        idx, lambda i: (i == 1) | (F.element_at(c, i) != F.element_at(c, i - 1))
    )
    return F.transform(keep, lambda i: F.element_at(c, i))


def map_clean(m, keys, values) -> Column:
    """apoc.map.clean — drop entries whose key is in `keys` or value in
    `values` (null values always dropped when listed)."""
    ks, vs = _c(keys), _c(values)
    return F.map_filter(
        _c(m),
        lambda k, v: ~F.array_contains(ks, k)
        & ~F.coalesce(F.array_contains(vs, v.cast("string")), F.lit(False)),
    )
