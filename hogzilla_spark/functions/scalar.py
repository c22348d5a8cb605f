"""Scalar function library (SURVEY.md §2.8 F1-F15).

All implemented as native Column expressions (JVM-side, codegen-able) —
no Python UDFs in the hot path.  Semantics match the reference where it
matters (sentinels, error defaults), with citations.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column
from pyspark.sql import functions as F

def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c

def round6u(c: Column, digits: int = 6) -> Column:
    """Engine-portable half-up rounding for NONNEGATIVE doubles:
    floor(x·10^d + 0.5) / 10^d.

    Why not F.round: Spark's round is BigDecimal HALF_UP over the
    double's EXACT decimal expansion, while DuckDB's ROUND goes through
    float math — at a value whose decimal expansion sits at an exact
    half (e.g. 19/640 = 0.0296875, whose nearest double is just BELOW
    the half while ×1e6 rounds to exactly 29687.5) the two engines
    round to DIFFERENT 6-digit values.  Found by the sf100 doc_quality
    digest (r11): 1 026 of 5 M docs diverged, all small-integer ratios.
    floor(x·1e6 + 0.5)/1e6 is the same IEEE multiply/add/floor/divide
    in both engines — bit-identical at any scale — and matches the
    convention the numpy kernels already use (_round6_select).  Use it
    for any oracle-compared column whose value is a ratio of small
    integers; the SQL twin must spell floor(x*1e6 + 0.5)/1e6.
    Half-up (toward +inf), so for NONNEGATIVE inputs only — negative
    inputs would round toward zero at halves, unlike ROUND's
    half-away."""
    p = float(10 ** digits)
    return F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(p)

# --- F1: humanBytes (HogSFlow.scala:744-752) --------------------------------

_UNITS = ["b", "K", "M", "G", "T", "P"]

def human_bytes(c: Column | str) -> Column:
    """bytes → "1.5G"-style display string (presentation only).

    Mirrors HogSFlow.humanBytes: log-1024 bucket, one decimal.
    """
    c = _col(c).cast("double")
    exp = F.when(c < 1024, F.lit(0)).otherwise(
        F.floor(F.log(c) / F.log(F.lit(1024.0)))
    )
    exp = F.least(exp, F.lit(len(_UNITS) - 1)).cast("int")
    unit = F.element_at(F.array(*[F.lit(u) for u in _UNITS]), exp + 1)
    scaled = c / F.pow(F.lit(1024.0), exp.cast("double"))
    return F.concat(F.format_number(scaled, 1), unit)

def sql_quote(s: str) -> str:
    """Python string → Spark SQL single-quoted literal (default
    escapedStringLiterals=false backslash escaping)."""
    return (
        "'"
        + s.replace("\\", "\\\\").replace("'", "\\'").replace("\n", "\\n")
        + "'"
    )

def human_bytes_sql(x: str) -> str:
    """SQL-text twin of `human_bytes` over the expression text `x` —
    same functions on the same doubles, so values are identical.

    Exists because mk_alert builds its whole projection as ONE parsed
    selectExpr (a Column-API humanBytes chain costs ~50 py4j driver
    round trips per call site — ~0.1 s of pure build time, r12
    profile).  `human_bytes` stays the reference the twin test
    (tests/test_scalar_sql_twins.py) compares against.
    """
    c = f"CAST({x} AS DOUBLE)"
    exp = (
        f"CAST(least(CASE WHEN {c} < 1024 THEN 0 ELSE "
        f"floor(ln({c}) / ln(1024.0D)) END, {len(_UNITS) - 1}) AS INT)"
    )
    units = "array(" + ", ".join(sql_quote(u) for u in _UNITS) + ")"
    scaled = f"{c} / power(1024.0D, CAST({exp} AS DOUBLE))"
    return (
        f"concat(format_number({scaled}, 1), element_at({units}, {exp} + 1))"
    )

# --- F2: formatIPtoBytes (HogSFlow.scala:715-722, HogEvent.scala:44-58) -----

def ip_to_bytes(c: Column | str) -> Column:
    """Dotted-quad → 4-byte binary; IPv6 → 255.255.6.6; bogus → 255.255.1.1.

    Keeps the reference's sentinel semantics exactly.
    """
    c = _col(c)
    parts = F.split(c, r"\.")
    is_v4 = c.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    is_v6 = c.contains(":")
    def octets_to_bin(o1, o2, o3, o4):
        # build via conv to hex then unhex for a pure-expression binary
        hx = F.concat(
            *[F.lpad(F.conv(o.cast("string"), 10, 16), 2, "0") for o in (o1, o2, o3, o4)]
        )
        return F.unhex(hx)
    v4 = octets_to_bin(
        # F.get: 0-indexed and null-tolerant under ANSI mode
        F.get(parts, 0).try_cast("int"),
        F.get(parts, 1).try_cast("int"),
        F.get(parts, 2).try_cast("int"),
        F.get(parts, 3).try_cast("int"),
    )
    v6_sentinel = F.unhex(F.lit("FFFF0606"))
    bogus_sentinel = F.unhex(F.lit("FFFF0101"))
    return F.when(is_v4, v4).when(is_v6, v6_sentinel).otherwise(bogus_sentinel)

def ip_to_bytes_sql(x: str) -> str:
    """SQL-text twin of `ip_to_bytes` over the expression text `x` —
    same function tree (rlike gate, per-octet try_cast→conv→lpad,
    unhex, sentinel branches), so values are identical.  Same
    build-time rationale as `human_bytes_sql`; twin-tested against the
    Column form."""
    octets = ", ".join(
        f"lpad(conv(CAST(try_cast(get(split({x}, '\\\\.'), {i}) AS INT) "
        f"AS STRING), 10, 16), 2, '0')"
        for i in range(4)
    )
    v4_pat = sql_quote(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    return (
        f"CASE WHEN {x} RLIKE {v4_pat} THEN unhex(concat({octets})) "
        f"WHEN contains({x}, ':') THEN unhex('FFFF0606') "
        f"ELSE unhex('FFFF0101') END"
    )

# --- F3: ipSignificantNetwork (HogSFlow.scala:733-742) ----------------------

def ip_significant_network(c: Column | str) -> Column:
    """Drop the last octet (IPv4) / last hextet (IPv6) → "/24-ish" prefix.

    "10.1.2.3" → "10.1.2."; "a:b::c:d" → "a:b::c:"; other → unchanged.
    """
    c = _col(c)
    v4 = F.regexp_replace(c, r"[^.]*$", "")  # strip text after last '.'
    v6 = F.regexp_replace(c, r"[^:]*$", "")
    return (
        F.when(c.contains("."), v4).when(c.contains(":"), v6).otherwise(c)
    )

# --- F4/P6: isMyIP prefix test (HogSFlow.scala:725-731) ---------------------

def is_my_ip(c: Column | str, my_nets: list[str]) -> Column:
    """ip startsWith any(myNets).  For small operator-managed prefix lists
    this folds to an OR chain of startswith — Catalyst keeps it codegen'd.
    For large lists use operators.joins.prefix_match_join instead.
    """
    c = _col(c)
    if not my_nets:
        return F.lit(False)
    return reduce(or_, [c.startswith(p) for p in my_nets])

# --- F5: log-scale binning (HogSFlow.scala:1791,1898,2009) ------------------

def log_bin(c: Column | str, scale: float = 1.0) -> Column:
    """floor(ln(x*scale + 1)) — the reference's histogram bucketing."""
    return F.floor(F.log(_col(c).cast("double") * F.lit(scale) + F.lit(1.0)))

# --- F6: haversine (HogGeograph.scala:35-58) --------------------------------

EARTH_RADIUS_KM = 6371.0
HAVERSINE_ERROR_SENTINEL = 999999999.0

def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, native trig expressions."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))

def haversine_from_coords(c1: Column | str, c2: Column | str) -> Column:
    """Distance between two "lat,lon" strings; parse failure → 999999999
    (reference error sentinel, HogGeograph.scala:55-57)."""
    c1, c2 = _col(c1), _col(c2)
    def latlon(c):
        # F.get is null-tolerant (no ANSI out-of-bounds error on bad input)
        parts = F.split(c, ",")
        return (
            F.get(parts, 0).try_cast("double"),
            F.get(parts, 1).try_cast("double"),
        )
    lat1, lon1 = latlon(c1)
    lat2, lon2 = latlon(c2)
    d = haversine_km(lat1, lon1, lat2, lon2)
    return F.coalesce(d, F.lit(HAVERSINE_ERROR_SENTINEL))

# --- F7: MD5 hex (HogStringUtils.scala:32-35) -------------------------------

def md5_hex(c: Column | str) -> Column:
    return F.md5(_col(c).cast("string"))

# --- F8: accent stripping (HogAuth.scala:299-303) ---------------------------

_ACCENTED = "áàâãäéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
_PLAIN = "aaaaaeeeeiiiiooooouuuucnyAAAAAEEEEIIIIOOOOOUUUUCNY"

def strip_accents(c: Column | str) -> Column:
    """Latin-1-range accent folding via translate (covers the pt-BR data the
    reference targets; full NFD folding would need a UDF)."""
    return F.translate(_col(c), _ACCENTED, _PLAIN)

# --- F9: user-agent family (HogAuth.scala:293-298) --------------------------

# The reference runs uap-scala's Parser.default over the public
# uap-core regexes.yaml data set and keeps only `family`
# (HogAuth.scala:293-298).  Here the same model is DATA-DRIVEN: the
# ordered parser tables live in functions/ua_data.py in uap-core's
# regexes.yaml shape ({regex, family_replacement?/os_replacement?},
# first match wins, missing replacement -> first capture group, "$1"
# substitutes it), and compile at plan-build time into one chained
# CASE of `rlike`s / `regexp_extract`s — whole-stage codegen, no UDF.
# Swapping in the full uap-core dataset is a ua_data.py-only change.

def _compile_parsers(
    c: Column, parsers: list[dict[str, str]], replacement_key: str
) -> Column:
    out = F.lit("Other")
    for p in reversed(parsers):
        rx = p["regex"]
        repl = p.get(replacement_key)
        if repl is None:
            fam: Column = F.regexp_extract(c, rx, 1)
        elif "$1" in repl:
            pre, post = repl.split("$1", 1)
            fam = F.concat(
                F.lit(pre), F.regexp_extract(c, rx, 1), F.lit(post)
            )
        else:
            fam = F.lit(repl)
        out = F.when(c.rlike(rx), fam).otherwise(out)
    return out

def ua_family(c: Column | str) -> Column:
    """Raw user-agent → "OS family/browser family" label, the value the
    reference stores per auth event (uap-scala Parser.default → family
    only, HogAuth.scala:293-298).  Ordered first-match-wins regex rules
    in the uap-core style; unknown sides → "Other"; empty/null → ""
    (the reference short-circuits length==0 to "")."""
    from hogzilla_spark.functions.ua_data import OS_PARSERS, USER_AGENT_PARSERS

    c = _col(c)
    return F.when(
        c.isNull() | (c == ""), F.lit("")
    ).otherwise(
        F.concat(
            _compile_parsers(c, OS_PARSERS, "os_replacement"),
            F.lit("/"),
            _compile_parsers(c, USER_AGENT_PARSERS, "family_replacement"),
        )
    )

def _compile_parsers_sql(
    x: str, parsers: list[dict[str, str]], replacement_key: str
) -> str:
    """SQL-text twin of `_compile_parsers` over the expression text
    `x`: the identical nested first-match-wins CASE tree, parsed in
    one round trip instead of ~10 py4j calls per rule (171 rules =
    ~0.56 s of driver build time per compile, r12 profile).  Twin
    value-identity pinned by tests/test_scalar_sql_twins.py against
    the vendored uap-core vectors."""
    out = "'Other'"
    for p in reversed(parsers):
        rx = sql_quote(p["regex"])
        repl = p.get(replacement_key)
        if repl is None:
            fam = f"regexp_extract({x}, {rx}, 1)"
        elif "$1" in repl:
            pre, post = repl.split("$1", 1)
            fam = (
                f"concat({sql_quote(pre)}, regexp_extract({x}, {rx}, 1), "
                f"{sql_quote(post)})"
            )
        else:
            fam = sql_quote(repl)
        out = f"CASE WHEN {x} RLIKE {rx} THEN {fam} ELSE {out} END"
    return out

def ua_family_sql(x: str) -> str:
    """SQL-text twin of `ua_family` over the expression text `x` —
    same rule tables, same nested CASE trees, same empty/null
    short-circuit; `ua_family` stays the Column reference the twin
    test compares against."""
    from hogzilla_spark.functions.ua_data import OS_PARSERS, USER_AGENT_PARSERS

    os_side = _compile_parsers_sql(x, OS_PARSERS, "os_replacement")
    ua_side = _compile_parsers_sql(x, USER_AGENT_PARSERS, "family_replacement")
    return (
        f"CASE WHEN ({x} IS NULL OR {x} = '') THEN '' "
        f"ELSE concat({os_side}, '/', {ua_side}) END"
    )

def _compile_device(
    c: Column, parsers: list[dict[str, str]], key: str, unmatched: str
) -> Column:
    """Device-table compiler: like _compile_parsers but with uap-core's
    device defaults (device/model fall back to capture group 1, brand
    to empty when the replacement key is absent)."""
    out = F.lit(unmatched)
    for p in reversed(parsers):
        rx = p["regex"]
        repl = p.get(key)
        if repl is None:
            fam: Column = (
                F.regexp_extract(c, rx, 1) if "(" in rx else F.lit("")
            ) if key != "brand_replacement" else F.lit("")
        elif "$1" in repl:
            pre, post = repl.split("$1", 1)
            fam = F.concat(F.lit(pre), F.regexp_extract(c, rx, 1), F.lit(post))
        else:
            fam = F.lit(repl)
        out = F.when(c.rlike(rx), fam).otherwise(out)
    return out

def ua_device(c: Column | str) -> Column:
    """Raw user-agent → struct(family, brand, model) per uap-core's
    ``device_parsers`` semantics (ordered first-match-wins; Spider rule
    first; device/model default to capture group 1, brand to empty;
    unmatched → family 'Other').  The reference keys alerts only on
    "os/browser" families (HogAuth.scala:293-298) — this closes the
    remaining uap-core surface for pipelines that segment by handset."""
    from hogzilla_spark.functions.ua_data import DEVICE_PARSERS

    c = _col(c)
    empty = c.isNull() | (c == "")
    return F.struct(
        F.when(empty, F.lit("")).otherwise(
            _compile_device(c, DEVICE_PARSERS, "device_replacement", "Other")
        ).alias("family"),
        F.when(empty, F.lit("")).otherwise(
            _compile_device(c, DEVICE_PARSERS, "brand_replacement", "")
        ).alias("brand"),
        F.when(empty, F.lit("")).otherwise(
            _compile_device(c, DEVICE_PARSERS, "model_replacement", "")
        ).alias("model"),
    )

# --- F10: date formatting (HogAuth.scala:236-237) ---------------------------

def format_event_time(epoch_s: Column | str) -> Column:
    """epoch seconds → "dd/MM/yyyy, HH'h'mm'm'" display format."""
    t = F.from_unixtime(_col(epoch_s).try_cast("long"))
    return F.date_format(t, "dd/MM/yyyy, HH'h'mm'm'")

# --- F12: location label (HogAuth.scala:217-226) ----------------------------

def location_label(city: Column | str, region: Column | str, country: Column | str) -> Column:
    """"city/region/country" with N/A fallbacks for blank components."""
    def or_na(c):
        c = _col(c)
        return F.when(F.trim(c) == "", F.lit("N/A")).otherwise(F.coalesce(c, F.lit("N/A")))
    return F.concat_ws("/", or_na(city), or_na(region), or_na(country))

# --- F13: numeric parsing with error default (HogSnort.scala:51-74) ---------

def parse_long(c: Column | str, default: int = 0) -> Column:
    """string → long; unparsable/missing → default (cast yields null →
    coalesce), matching the reference's try/catch-default converters."""
    return F.coalesce(_col(c).try_cast("long"), F.lit(default))

def parse_double(c: Column | str, default: float = 0.0) -> Column:
    return F.coalesce(_col(c).try_cast("double"), F.lit(default))

# --- F14: hex tcpFlags equality (HogSFlow.scala:818-831) --------------------

TCP_SYN = "0x02"
TCP_SYNACK = "0x12"
TCP_PSHACK = "0x18"
TCP_ACK = "0x10"

def tcp_flag_is(c: Column | str, flag: str) -> Column:
    """Exact string match on the hex literal — the reference compares the
    raw string, not a bitmask, so so do we."""
    return _col(c) == F.lit(flag)
