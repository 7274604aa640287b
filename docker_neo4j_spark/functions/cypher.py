"""Cypher scalar-function surface → pyspark.sql.functions (SURVEY.md §2.B.7).

Every Cypher built-in the reference's packaged engine exposes maps to a
JVM-side Spark expression — zero Python UDFs, so the whole surface stays
inside whole-stage codegen. Names follow Cypher (camelCase) so a planner can
resolve them 1:1; each returns a ``Column``.

Reference anchor: the scalar surface is the openCypher function library the
packaged engine serves (the repo itself only invokes ``apoc.version()`` at
/root/reference/src/test/java/com/neo4j/docker/coredb/configurations/
TestConfSettings.java:411 and procedure YIELDs); categories enumerated in
SURVEY.md §2.B.7.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# ---------------------------------------------------------------- string ----

def toUpper(x) -> Column:
    return F.upper(_c(x))


def toLower(x) -> Column:
    return F.lower(_c(x))


def trim(x, chars=None) -> Column:
    # Neo4j 5.20+: trim(s, chars) strips the given characters both sides
    if chars is None:
        return F.trim(_c(x))
    return F.trim(_c(x), _c(chars))


def lTrim(x, chars=None) -> Column:
    if chars is None:
        return F.ltrim(_c(x))
    return F.ltrim(_c(x), _c(chars))


def rTrim(x, chars=None) -> Column:
    if chars is None:
        return F.rtrim(_c(x))
    return F.rtrim(_c(x), _c(chars))


def btrim(x, chars=None) -> Column:
    # Neo4j 5.20 btrim(s[, chars])
    return trim(x, chars)


def substring(x, start, length=None) -> Column:
    # Cypher substring(s, start[, length]) is 0-based; Spark is 1-based.
    if length is None:
        length = 2**31 - 1
    return F.substring(_c(x), start + 1, length)


def replace(x, search: str, repl: str) -> Column:
    # Cypher replace is literal (not regex) — translate to regexp-quoted form.
    return F.replace(_c(x), F.lit(search), F.lit(repl))


def split(x, delim: str) -> Column:
    # Cypher split is literal; Spark split takes a regex → quote it.
    import re

    return F.split(_c(x), re.escape(delim))


def left(x, n: int) -> Column:
    return F.substring(_c(x), 1, n)


def right(x, n: int) -> Column:
    return F.substring(_c(x), -n, n)


def reverse(x) -> Column:
    return F.reverse(_c(x))


def size(x) -> Column:
    """size(string) → character count (use :func:`size_list` for lists)."""
    return F.length(_c(x))


def size_list(x) -> Column:
    return F.size(_c(x))


def toString(x) -> Column:
    return _c(x).cast("string")


# ------------------------------------------------------------------ math ----

def abs_(x) -> Column:
    return F.abs(_c(x))


def ceil(x) -> Column:
    return F.ceil(_c(x))


def floor(x) -> Column:
    return F.floor(_c(x))


def round_(x, scale: int = 0, mode: str = "HALF_UP") -> Column:
    """Cypher ``round(x[, precision[, mode]])`` — Neo4j's seven rounding
    modes over JVM expressions (no UDF): HALF_UP is Spark's F.round,
    HALF_EVEN its F.bround; the directed modes compose sign/ceil/floor."""
    c = _c(x).cast("double")
    mode = (mode or "HALF_UP").upper()
    if mode == "HALF_UP":
        return F.round(c, scale)
    if mode == "HALF_EVEN":
        return F.bround(c, scale)
    m = F.lit(float(10 ** scale))
    scaled = c * m
    if mode == "UP":
        out = F.signum(scaled) * F.ceil(F.abs(scaled))
    elif mode == "DOWN":
        out = F.signum(scaled) * F.floor(F.abs(scaled))
    elif mode == "CEILING":
        out = F.ceil(scaled)
    elif mode == "FLOOR":
        out = F.floor(scaled)
    elif mode == "HALF_DOWN":
        # ties round toward zero: UP when the fraction is strictly > .5
        frac = F.abs(scaled) - F.floor(F.abs(scaled))
        out = F.signum(scaled) * F.when(
            frac > 0.5, F.ceil(F.abs(scaled))
        ).otherwise(F.floor(F.abs(scaled)))
    else:
        raise ValueError(f"unknown rounding mode {mode!r}")
    return (out.cast("double") / m).cast("double")


def sign(x) -> Column:
    return F.signum(_c(x))


def sqrt(x) -> Column:
    return F.sqrt(_c(x))


def exp(x) -> Column:
    return F.exp(_c(x))


def log(x) -> Column:
    return F.log(_c(x))


def log10(x) -> Column:
    return F.log10(_c(x))


def sin(x) -> Column:
    return F.sin(_c(x))


def cos(x) -> Column:
    return F.cos(_c(x))


def atan2(y, x) -> Column:
    return F.atan2(_c(y), _c(x))


def pi() -> Column:
    return F.lit(3.141592653589793)


def tan(x) -> Column:
    return F.tan(_c(x))


def asin(x) -> Column:
    return F.asin(_c(x))


def acos(x) -> Column:
    return F.acos(_c(x))


def atan(x) -> Column:
    return F.atan(_c(x))


def cot(x) -> Column:
    """Cypher cot(x) = 1/tan(x) (Spark has no cot builtin)."""
    return F.lit(1.0) / F.tan(_c(x))


def degrees(x) -> Column:
    return F.degrees(_c(x))


def radians(x) -> Column:
    return F.radians(_c(x))


def e() -> Column:
    return F.lit(2.718281828459045)


def haversin(x) -> Column:
    """Cypher haversin(x) = sin²(x/2)."""
    h = F.sin(_c(x) / F.lit(2.0))
    return h * h


def rand() -> Column:
    """Cypher rand() — uniform [0,1); non-deterministic by contract."""
    return F.rand()


def randomUUID() -> Column:
    """Cypher randomUUID() — v4 UUID string per row."""
    return F.uuid()


def timestamp() -> Column:
    """Cypher timestamp() — current epoch MILLIS (Neo4j's unit).
    unix_millis keeps sub-second precision (unix_timestamp truncates
    to whole seconds)."""
    return F.unix_millis(F.current_timestamp())


def toBoolean(x) -> Column:
    """Cypher toBoolean: 'true'/'false' (case-insensitive), booleans pass
    through, anything else NULL."""
    c = _c(x)
    low = F.lower(c.cast("string"))
    return F.when(low == "true", F.lit(True)).when(low == "false", F.lit(False))


def toBooleanOrNull(x) -> Column:
    return toBoolean(x)


def toIntegerOrNull(x) -> Column:
    return toInteger(x)


def toFloatOrNull(x) -> Column:
    return toFloat(x)


def toInteger(x) -> Column:
    """Cypher toInteger: float STRINGS parse then truncate toward zero
    ('3.7' → 3, like toInteger(3.7) → 3); unparseable strings → null
    (never Spark's ANSI CAST_INVALID_INPUT — r13)."""
    c = _c(x)
    return F.coalesce(
        c.try_cast("long"), c.try_cast("double").try_cast("long")
    )


def toFloat(x) -> Column:
    """Cypher toFloat: unparseable strings → null, never an ANSI error."""
    return _c(x).try_cast("double")


def isNaN(x) -> Column:
    """Neo4j 5 isNaN(): true iff the value is the floating-point NaN;
    null in → null out (Spark's isnan(null) is false — guard it)."""
    c = _c(x)
    return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.isnan(c.cast("double"))
    )


# ------------------------------------------------------------------ list ----

def range_(start, stop, step: int = 1) -> Column:
    """Cypher range(a, b[, step]) — inclusive both ends. An empty span
    (start past stop in the step's direction) is the EMPTY LIST, where
    Spark's sequence would raise on sign-mismatched bounds (r14)."""
    a = F.lit(start) if isinstance(start, int) else _c(start)
    b = F.lit(stop) if isinstance(stop, int) else _c(stop)
    st = F.lit(step) if isinstance(step, int) else _c(step)
    empty = F.when(st > 0, a > b).when(st < 0, a < b).otherwise(F.lit(False))
    return F.when(empty, F.array().cast("array<bigint>")).otherwise(
        F.sequence(a, b, st)
    )


def head(x) -> Column:
    return F.element_at(_c(x), 1)


def last(x) -> Column:
    return F.element_at(_c(x), -1)


def tail(x) -> Column:
    c = _c(x)
    return F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0)))


def reduce_(x, zero, merge) -> Column:
    """Cypher reduce(acc = zero, v IN list | merge) → F.aggregate."""
    return F.aggregate(_c(x), zero, merge)


def list_comprehension(x, predicate=None, extract=None) -> Column:
    """[v IN list WHERE p | f(v)] → filter + transform."""
    c = _c(x)
    if predicate is not None:
        c = F.filter(c, predicate)
    if extract is not None:
        c = F.transform(c, extract)
    return c


# ------------------------------------------------------------------- map ----

def keys(m) -> Column:
    return F.map_keys(_c(m))


def map_get(m, key: str) -> Column:
    return F.element_at(_c(m), key)


# -------------------------------------------------------------- temporal ----

_ISO_DURATION_RE = None  # compiled lazily (module imports stay cheap)


def _temporal_arg(x) -> Column:
    # str args that start with a digit are ISO literals ('1995-03-15');
    # other strs follow the library's column-name convention.
    if isinstance(x, str) and x[:1].isdigit():
        return F.lit(x)
    return _c(x)


def _temporal_map_fields(spec: dict, ctx: str, allowed: frozenset) -> dict:
    bad = set(spec) - allowed
    if bad:
        raise ValueError(f"{ctx}() map has unknown keys {sorted(bad)}")
    return spec


_DATE_KEYS = frozenset({"year", "month", "day"})
_TIME_KEYS = frozenset({"hour", "minute", "second", "millisecond", "nanosecond"})


def _seconds_of(spec: dict) -> float:
    return (
        float(spec.get("second", 0))
        + float(spec.get("millisecond", 0)) / 1e3
        + float(spec.get("nanosecond", 0)) / 1e9
    )


def date(x=None) -> Column:
    """Cypher ``date()`` / ``date(expr)`` / ``date({year, month, day})``
    construction → DATE column (map form — r10). r12: the ISO week-date
    (``{year, week, dayOfWeek}``), ordinal (``{year, ordinalDay}``) and
    quarter (``{year, quarter, dayOfQuarter}``) forms — literal
    arithmetic Python-side, one DATE literal out."""
    if isinstance(x, dict):
        import datetime as _dt

        if {"week", "dayOfWeek"} & set(x):
            s = _temporal_map_fields(
                x, "date", frozenset({"year", "week", "dayOfWeek"})
            )
            return F.lit(
                _dt.date.fromisocalendar(
                    int(s.get("year", 1970)),
                    int(s.get("week", 1)),
                    int(s.get("dayOfWeek", 1)),
                )
            )
        if "ordinalDay" in x:
            s = _temporal_map_fields(
                x, "date", frozenset({"year", "ordinalDay"})
            )
            return F.lit(
                _dt.date(int(s.get("year", 1970)), 1, 1)
                + _dt.timedelta(days=int(s.get("ordinalDay", 1)) - 1)
            )
        if {"quarter", "dayOfQuarter"} & set(x):
            s = _temporal_map_fields(
                x, "date", frozenset({"year", "quarter", "dayOfQuarter"})
            )
            q0 = _dt.date(
                int(s.get("year", 1970)),
                3 * (int(s.get("quarter", 1)) - 1) + 1,
                1,
            )
            return F.lit(q0 + _dt.timedelta(days=int(s.get("dayOfQuarter", 1)) - 1))
        s = _temporal_map_fields(x, "date", _DATE_KEYS)
        return F.make_date(
            F.lit(int(s.get("year", 1970))),
            F.lit(int(s.get("month", 1))),
            F.lit(int(s.get("day", 1))),
        )
    return F.current_date() if x is None else F.to_date(_temporal_arg(x))


def datetime(x=None) -> Column:
    """Cypher ``datetime()`` / ``datetime(expr)`` /
    ``datetime({year, …, second[, timezone]})`` / ``datetime({epochMillis})``
    / ``datetime({epochSeconds})`` → TIMESTAMP column.

    Zones are INSTANT-faithful: an offset ('+02:00') or bracket zone
    ('[Europe/Stockholm]') shifts the stored instant so epoch accessors
    and comparisons match Neo4j; component accessors read UTC (the
    engine's timestamps are zone-less — documented divergence; Neo4j
    reads them in the original zone)."""
    if isinstance(x, dict):
        if set(x) == {"epochMillis"}:
            return F.timestamp_millis(F.lit(int(x["epochMillis"])))
        if set(x) == {"epochSeconds"}:
            return F.timestamp_seconds(F.lit(int(x["epochSeconds"])))
        if "date" in x or "time" in x:
            # composite form: datetime({date: d, time: t}) /
            # datetime({date: d, hour: …}) (r12) — date and time values
            # concatenate textually (times serialize as 'HH:mm:ss')
            x2 = dict(x)
            tz2 = x2.pop("timezone", None)
            d = x2.pop("date", None)
            t = x2.pop("time", None)
            s2 = _temporal_map_fields(x2, "datetime", _TIME_KEYS)
            if d is None:
                raise ValueError("datetime({time: …}) requires a date key")
            dcol = (d if isinstance(d, Column) else F.lit(d)).cast("string")
            if t is not None:
                tcol = (t if isinstance(t, Column) else F.lit(t)).cast("string")
            else:
                tcol = F.lit(
                    "%02d:%02d:%06.3f"
                    % (
                        int(s2.get("hour", 0)),
                        int(s2.get("minute", 0)),
                        _seconds_of(s2),
                    )
                )
            out = F.to_timestamp(F.concat(dcol, F.lit(" "), tcol))
            if tz2:
                out = F.to_utc_timestamp(out, str(tz2))
            return out
        tz = None
        if "timezone" in x:
            x = dict(x)
            tz = x.pop("timezone")
        s = _temporal_map_fields(x, "datetime", _DATE_KEYS | _TIME_KEYS)
        out = F.make_timestamp(
            F.lit(int(s.get("year", 1970))),
            F.lit(int(s.get("month", 1))),
            F.lit(int(s.get("day", 1))),
            F.lit(int(s.get("hour", 0))),
            F.lit(int(s.get("minute", 0))),
            F.lit(_seconds_of(s)),
        )
        if tz:
            out = F.to_utc_timestamp(out, str(tz))
        return out
    if x is None:
        return F.current_timestamp()
    c = _temporal_arg(x)
    # bracket zone form '2024-03-15T10:00:00[Europe/Stockholm]' — local
    # wall time in that zone → UTC instant; zone-less strings take the
    # plain branch (one codegen'd conditional, no extra job)
    txt = c.cast("string")
    zone = F.regexp_extract(txt, r"\[([^\]]+)\]$", 1)
    body = F.regexp_replace(txt, r"\[[^\]]+\]$", "")
    return F.when(
        zone != "", F.to_utc_timestamp(F.to_timestamp(body), zone)
    ).otherwise(F.to_timestamp(c))


def localdatetime(x=None) -> Column:
    return datetime(x)


def time(x=None) -> Column:
    """Cypher ``time()`` / ``time('10:30:00')`` / ``time({hour, …})`` —
    Spark has no TIME type, so times serialize as 'HH:mm:ss' strings
    (documented deviation; ordering and equality still behave)."""
    if isinstance(x, dict):
        s = _temporal_map_fields(x, "time", _TIME_KEYS)
        return F.lit(
            "%02d:%02d:%02d"
            % (int(s.get("hour", 0)), int(s.get("minute", 0)), int(_seconds_of(s)))
        )
    if x is None:
        return F.date_format(F.current_timestamp(), "HH:mm:ss")
    c = _temporal_arg(x)
    ts = F.coalesce(
        F.to_timestamp(c),
        # bare clock strings ('10:30:00') need a date to parse
        F.to_timestamp(F.concat(F.lit("1970-01-01T"), c.cast("string"))),
    )
    return F.date_format(ts, "HH:mm:ss")


def localtime(x=None) -> Column:
    return time(x)


def _duration_from_parts(
    years: int, months: int, weeks: int, days: int,
    hours: int, minutes: int, seconds: float,
) -> Column:
    """Component-dependent interval type (r11 — SURVEY §1.2 DURATION) so
    values COLLECT instead of hitting CalendarIntervalType's missing
    ``fromInternal``:

    - day/time-only → ``DayTimeIntervalType`` (client value: timedelta;
      day-only additionally casts to ``INTERVAL DAY`` so ``date + d``
      stays a DATE, not a timestamp),
    - month-only → ``YearMonthIntervalType`` (date arithmetic JVM-side;
      the façade projection renders it as ISO-8601 text for clients —
      PySpark lacks its ``fromInternal`` too),
    - mixed month+day → ``CalendarInterval``: the one Spark type that
      adds both components; arithmetic-only, projected as text.
    """
    has_ym = bool(years or months)
    has_d = bool(weeks or days)
    has_t = bool(hours or minutes or seconds)
    if has_ym and (has_d or has_t):
        return F.make_interval(
            F.lit(years), F.lit(months), F.lit(weeks), F.lit(days),
            F.lit(hours), F.lit(minutes), F.lit(float(seconds)),
        )
    if has_ym:
        return F.make_ym_interval(F.lit(years), F.lit(months))
    if has_t:
        return F.make_dt_interval(
            F.lit(weeks * 7 + days), F.lit(hours), F.lit(minutes),
            F.lit(float(seconds)),
        )
    return F.make_dt_interval(F.lit(weeks * 7 + days)).cast("interval day")


def duration(spec: str) -> Column:
    """Cypher ``duration('P1Y2M3DT4H5M6S')`` / unit-map form → interval
    column, so ``date()/datetime() + duration()`` arithmetic runs
    JVM-side; the interval TYPE depends on the components so the value
    collects (see :func:`_duration_from_parts`). Accepts the ISO-8601
    subset Cypher uses: Y/M/W/D date parts, H/M/S time parts (S may be
    fractional)."""
    global _ISO_DURATION_RE
    import re as _re

    if _ISO_DURATION_RE is None:
        _ISO_DURATION_RE = _re.compile(
            r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
            r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
        )
    if isinstance(spec, dict):
        # Cypher's map form: duration({years, months, weeks, days,
        # hours, minutes, seconds, milliseconds}) — r10
        units = {
            "years", "months", "weeks", "days", "hours", "minutes",
            "seconds", "milliseconds",
        }
        bad = set(spec) - units
        if bad:
            raise ValueError(f"duration() map has unknown keys {sorted(bad)}")
        secs = float(spec.get("seconds", 0)) + float(
            spec.get("milliseconds", 0)
        ) / 1000.0
        return _duration_from_parts(
            int(spec.get("years", 0)), int(spec.get("months", 0)),
            int(spec.get("weeks", 0)), int(spec.get("days", 0)),
            int(spec.get("hours", 0)), int(spec.get("minutes", 0)), secs,
        )
    if not isinstance(spec, str):
        raise TypeError(
            "duration() takes an ISO-8601 string literal or a unit map"
        )
    m = _ISO_DURATION_RE.match(spec.strip())
    if m is None or spec.strip() == "P":
        raise ValueError(f"invalid ISO-8601 duration: {spec!r}")
    y, mo, w, d, h, mi, s = m.groups()
    return _duration_from_parts(
        int(y or 0), int(mo or 0), int(w or 0), int(d or 0),
        int(h or 0), int(mi or 0), float(s or 0),
    )


def iso_duration_text(c, kind: str) -> Column:
    """Interval column → ISO-8601 duration text (r11): 'P2DT3H30M',
    zero components omitted, all-zero → 'PT0S'; ``kind`` is 'dt'
    (day-time) or 'ym' (year-month). The Neo4j ``toString(duration)``
    rendering, built from JVM date_part extracts — no Python row path."""
    c = _c(c)
    if kind == "ym":
        y = F.date_part(F.lit("YEAR"), c).cast("long")
        m = F.date_part(F.lit("MONTH"), c).cast("long")
        return F.concat(
            F.lit("P"), y.cast("string"), F.lit("Y"), m.cast("string"), F.lit("M")
        )
    c = c.cast("interval day to second")
    d = F.date_part(F.lit("DAY"), c).cast("long")
    h = F.date_part(F.lit("HOUR"), c).cast("long")
    mi = F.date_part(F.lit("MINUTE"), c).cast("long")
    s = F.date_part(F.lit("SECOND"), c).cast("decimal(18,6)")
    s_txt = F.regexp_replace(s.cast("string"), r"\.?0+$", "")
    date_p = F.when(d != 0, F.concat(d.cast("string"), F.lit("D"))).otherwise(F.lit(""))
    th = F.when(h != 0, F.concat(h.cast("string"), F.lit("H"))).otherwise(F.lit(""))
    tm = F.when(mi != 0, F.concat(mi.cast("string"), F.lit("M"))).otherwise(F.lit(""))
    ts = F.when(s != 0, F.concat(s_txt, F.lit("S"))).otherwise(F.lit(""))
    tpart = F.concat(th, tm, ts)
    body = F.concat(
        date_p,
        F.when(tpart != "", F.concat(F.lit("T"), tpart)).otherwise(F.lit("")),
    )
    return F.when(body == "", F.lit("PT0S")).otherwise(F.concat(F.lit("P"), body))


def date_trunc(unit: str, x) -> Column:
    return F.date_trunc(unit, _c(x))


def plus_days(x, n) -> Column:
    """datetime + duration({days: n})."""
    return F.timestamp_add("DAY", F.lit(n) if isinstance(n, int) else _c(n), _c(x))


def duration_between_days(a, b) -> Column:
    """duration.inDays(a, b).days."""
    return F.datediff(_c(b), _c(a)).cast("long")


def duration_between(a, b) -> Column:
    """``duration.between(a, b)`` → DayTimeIntervalType (r11): the same
    collectable day/time shape :func:`duration` returns — timestamp
    subtraction is a day-to-second interval JVM-side, clients get a
    timedelta / ISO-8601 text on the wire."""
    return F.to_timestamp(_c(b)) - F.to_timestamp(_c(a))


# ---------------------------------------------------------------- spatial ----
# POINT as a plain struct + function shims (SURVEY §7.2 "custom types").

def point(x, y=None) -> Column:
    """``point({x: …, y: …})`` (the documented Neo4j surface — r11) or
    positional ``point(x, y)`` → struct<x double, y double> (cartesian
    CRS). The map form also accepts WGS-84 names ({longitude, latitude}
    → x/y). Non-map single arguments fail as a semantic error, not a
    Python TypeError."""
    if isinstance(x, dict) and y is None:
        keys = set(x)
        if keys >= {"x", "y"}:
            x, y = x["x"], x["y"]
        elif keys >= {"longitude", "latitude"}:
            x, y = x["longitude"], x["latitude"]
        else:
            raise ValueError(
                "point() map needs x/y or longitude/latitude keys, "
                f"got {sorted(keys)}"
            )
    if y is None:
        raise ValueError("point() takes (x, y) or a {x, y} map")

    def lift(v) -> Column:
        c = _c(v)
        return c if isinstance(c, Column) else F.lit(c)

    return F.struct(lift(x).cast("double").alias("x"), lift(y).cast("double").alias("y"))


def point_x(p) -> Column:
    return _c(p)["x"]


def point_y(p) -> Column:
    return _c(p)["y"]


def point_within_bbox(p, lower_left, upper_right) -> Column:
    """point.withinBBox(p, ll, ur) — inclusive cartesian bounding box."""
    return (
        (point_x(p) >= point_x(lower_left))
        & (point_x(p) <= point_x(upper_right))
        & (point_y(p) >= point_y(lower_left))
        & (point_y(p) <= point_y(upper_right))
    )


def point_distance(a, b) -> Column:
    """point.distance(a, b) for cartesian points: √(Δx²+Δy²).

    Uses only correctly-rounded IEEE ops (*, −, +, sqrt), so the result is
    bit-identical across engines — oracle-safe, unlike trig-based
    geographic distance (libm-dependent; see ``haversine_m``)."""
    dx = point_x(a) - point_x(b)
    dy = point_y(a) - point_y(b)
    return F.sqrt(dx * dx + dy * dy)


def haversine_m(lat1, lon1, lat2, lon2) -> Column:
    """Geographic (WGS-84 sphere) distance in meters between lat/lon
    degree pairs — the point.distance geographic-CRS analog. Trig results
    are libm-dependent in the last ulp, so this is pytest-graded (known
    city pairs ± tolerance), never hash-compared against another engine."""
    r = 6_371_008.8  # mean earth radius, meters
    la1, lo1, la2, lo2 = (F.radians(_c(c).cast("double")) for c in (lat1, lon1, lat2, lon2))
    a = (
        F.sin((la2 - la1) / 2) ** 2
        + F.cos(la1) * F.cos(la2) * F.sin((lo2 - lo1) / 2) ** 2
    )
    return F.lit(2.0 * r) * F.asin(F.sqrt(a))


def year(x) -> Column:
    return F.year(_c(x))


def month(x) -> Column:
    return F.month(_c(x))


def day(x) -> Column:
    return F.dayofmonth(_c(x))


def hour(x) -> Column:
    return F.hour(_c(x))


def minute(x) -> Column:
    return F.minute(_c(x))


def dayOfWeek(x) -> Column:
    """ISO day-of-week 1=Monday..7=Sunday (Cypher date.dayOfWeek)."""
    return F.weekday(_c(x)) + 1


# ------------------------------------------------------------------ JSON ----

def json_extract(x, path: str) -> Column:
    """apoc.json.path(s, '$.k') → get_json_object."""
    return F.get_json_object(_c(x), path)


def from_json_map(x, value_type: str = "string") -> Column:
    """apoc.convert.fromJsonMap → from_json to map<string, T>."""
    return F.from_json(_c(x), f"map<string,{value_type}>")


def from_json_map_typed(x) -> Column:
    """apoc.convert.fromJsonMap with NATIVE value types (r12): a
    map<string, variant> — numbers stay numbers through key access and
    the wire layers decode VariantVal like any entity property."""
    return F.from_json(_c(x), "map<string,variant>")


def to_json_text(x) -> Column:
    """apoc.convert.toJson → one JSON text per map/struct/array value."""
    return F.to_json(_c(x))


def map_from_lists(keys, values) -> Column:
    """apoc.map.fromLists(keys, values)."""
    return F.map_from_arrays(_c(keys), _c(values))


def date_trunc_date(unit: str, x) -> Column:
    """date.truncate(unit, d) → DATE (datetime.truncate covers
    timestamps); 'day' is the identity on dates."""
    u = unit.lower()
    if u == "day":
        return F.to_date(_c(x))
    return F.trunc(_c(x), u)


# ------------------------------------------------- null / CASE / identity ----

def coalesce(*cols) -> Column:
    return F.coalesce(*[_c(c) for c in cols])


def case_when(pairs, otherwise=None) -> Column:
    out = None
    for cond, val in pairs:
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return out.otherwise(otherwise) if otherwise is not None else out


def labels(node_labels_col="labels") -> Column:
    return _c(node_labels_col)


def type_(rel_type_col="type") -> Column:
    return _c(rel_type_col)


def properties(*prop_cols: str) -> Column:
    """properties(n) → map of the node's property columns."""
    pairs = []
    for p in prop_cols:
        pairs += [F.lit(p), F.col(p).cast("string")]
    return F.create_map(*pairs)


def approx_count_distinct(x, rsd: float = 0.05) -> Column:
    return F.approx_count_distinct(_c(x), rsd)


def toStringOrNull(x) -> Column:
    """Cypher 5 toStringOrNull — cast-to-string never throws, so this is
    an exact alias of toString (the other OrNull casts use try_cast)."""
    return toString(x)


def char_length(x) -> Column:
    """Cypher ``char_length`` / ``character_length`` — string length."""
    return F.length(_c(x))


def character_length(x) -> Column:
    return F.length(_c(x))


def normalize(x) -> Column:
    """Cypher ``normalize(str)`` — Unicode NFC normalization. The engine
    stores and compares UTF-8 text directly; precomposed/decomposed
    divergence is passed through unchanged (no JVM-side normalizer is
    exposed as a Spark function; a Pandas UDF here would put every string
    through Python for an almost-always-identity transform)."""
    return _c(x).cast("string")


def nullIf(a, b) -> Column:
    """``nullIf(a, b)`` — null when the values are equal, else ``a``."""
    ca, cb = _c(a), _c(b)
    return F.when(ca == cb, F.lit(None)).otherwise(ca)


def toIntegerList(x) -> Column:
    return F.transform(_c(x), lambda e: e.cast("long"))


def toFloatList(x) -> Column:
    return F.transform(_c(x), lambda e: e.cast("double"))


def toStringList(x) -> Column:
    return F.transform(_c(x), lambda e: e.cast("string"))


def toBooleanList(x) -> Column:
    return F.transform(_c(x), lambda e: e.cast("boolean"))


def duration_between_months(a, b) -> Column:
    """``duration.inMonths(a, b)`` consumed bare — whole calendar months
    (the accessor idiom routes through the parser's component hook)."""
    return F.floor(F.months_between(_temporal_arg(b), _temporal_arg(a))).cast("long")


def duration_between_seconds(a, b) -> Column:
    """``duration.inSeconds(a, b)`` consumed bare — whole seconds."""
    return (
        F.unix_timestamp(F.to_timestamp(_temporal_arg(b)))
        - F.unix_timestamp(F.to_timestamp(_temporal_arg(a)))
    ).cast("long")
