"""Grok pattern -> regex compilation.

The reference's ``ExtractGrokPatterns`` uses elastic/go-grok with its default
pattern library (`pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:17-22`).
This module re-implements the %{NAME} / %{NAME:alias} expansion over a core
subset of the public grok base patterns, producing a plain regex with named
capture groups that runs JVM-side via regexp_extract (or inside a vectorized
pandas UDF for single-pass many-group extraction — see
operators/parse.py:grok_parse_pandas).
"""

from __future__ import annotations

import re

# Core grok base patterns (public logstash/elastic pattern definitions)
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?(?:[0-9]+)",
    "NONNEGINT": r"\b[0-9]+\b",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NUMBER": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?)",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "EMAILLOCALPART": r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,64}(?:\.[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,62}){0,63}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:25[0-5]|2[0-4][0-9]|[0-1]?[0-9]{1,2})(?:\.(?:25[0-5]|2[0-4][0-9]|[0-1]?[0-9]{1,2})){3}",
    "IP": r"(?:25[0-5]|2[0-4][0-9]|[0-1]?[0-9]{1,2})(?:\.(?:25[0-5]|2[0-4][0-9]|[0-1]?[0-9]{1,2})){3}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "TIMESTAMP_ISO8601": r"(?:\d\d){1,2}-(?:0[1-9]|1[0-2])-(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[T ](?:2[0123]|[01]?[0-9]):?(?:[0-5][0-9])(?::?(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))?",
    "SYSLOGTIMESTAMP": r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?) +(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9]) (?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"])*\")",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+\-.]+",
    "PATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\]'
        r' "(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})"'
        r" %{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)"
    ),
    "IPORHOST": r"(?:(?:25[0-5]|2[0-4][0-9]|[0-1]?[0-9]{1,2})(?:\.(?:25[0-5]|2[0-4][0-9]|[0-1]?[0-9]{1,2})){3}|\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b)",
    # --- calendar / time components (public logstash grok-patterns) ---
    "MONTH": r"\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm]ar(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a[yi]?|[Jj]un[ei]?|[Jj]ul[yi]?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo][ck]t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e[cz](?:ember)?)\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE": r"(?:%{DATE_US}|%{DATE_EU})",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"%{SECOND}",
    # --- network ---
    "IPV6": r"(?:(?:(?:[0-9A-Fa-f]{1,4}:){7}(?:[0-9A-Fa-f]{1,4}|:))|(?:(?:[0-9A-Fa-f]{1,4}:){1,7}:)|(?:(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4})|(?:(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2})|(?:(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3})|(?:(?:[0-9A-Fa-f]{1,4}:){1,3}(?::[0-9A-Fa-f]{1,4}){1,4})|(?:(?:[0-9A-Fa-f]{1,4}:){1,2}(?::[0-9A-Fa-f]{1,4}){1,5})|(?:[0-9A-Fa-f]{1,4}:(?::[0-9A-Fa-f]{1,4}){1,6})|(?::(?:(?::[0-9A-Fa-f]{1,4}){1,7}|:)))(?:%[0-9A-Za-z]+)?",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    # --- URI family ---
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPARAM": r"\?%{URIQUERY}",
    "URIPATHPARAM": r"%{URIPATH}(?:\?%{URIQUERY})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # --- ELB/ALB family (go-grok ECS aliases; func_extract_grok_patterns.go
    #     e2e case `pkg/ottl/e2e/e2e_test.go:430-440`) ---
    "ELB_URIHOST": r"%{IPORHOST:url.domain}(?::%{POSINT:url.port:int})?",
    "ELB_URIPATHQUERY": r"%{URIPATH:url.path}(?:\?%{URIQUERY:url.query})?",
    "ELB_URIPATHPARAM": r"%{ELB_URIPATHQUERY}",
    "ELB_URI": r"%{URIPROTO:url.scheme}://(?:%{USER:url.username}(?::[^@]*)?@)?(?:%{ELB_URIHOST})?(?:%{ELB_URIPATHQUERY})?",
    "ELB_REQUEST_LINE": r"(?:%{WORD:http.request.method} %{ELB_URI:url.original}(?: HTTP/%{NUMBER:http.version})?)",
    # --- HTTPD (ECS-aliased go-grok variants + classic combined) ---
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER": r"(?:%{EMAILADDRESS}|%{USER})",
    "HTTPD_COMMONLOG": (
        r'%{IPORHOST:source.address} %{HTTPDUSER:apache.access.user.identity} %{USER:user.name} \[%{HTTPDATE:timestamp}\]'
        r' "(?:%{WORD:http.request.method} %{NOTSPACE:url.original}(?: HTTP/%{NUMBER:http.version})?|%{DATA})"'
        r" (?:-|%{INT:http.response.status_code:int}) (?:-|%{INT:http.response.body.bytes:int})"
    ),
    "HTTPD_COMBINEDLOG": r'%{HTTPD_COMMONLOG} "%{DATA:http.request.referrer}" "%{DATA:user_agent.original}"',
    "COMBINEDAPACHELOG": r'%{COMMONAPACHELOG} "%{DATA:referrer}" "%{DATA:agent}"',
    # --- syslog line composites ---
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:process.name}(?:\[%{POSINT:process.pid:int}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:log.syslog.facility.code:int}.%{NONNEGINT:log.syslog.priority:int}>",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:host.hostname} %{SYSLOGPROG}:",
    # --- filesystem / misc ---
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+)",
    "QS": r"%{QUOTEDSTRING}",
}

# %{NAME}, %{NAME:alias}, %{NAME:alias:type} — the :type suffix (go-grok
# typed captures) is parsed and recorded but values stay strings in our
# map<string,string> frames (documented divergence).
_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+?))?(?::(int|long|float|double|bool|boolean|string))?\}")


class GrokError(ValueError):
    pass


def _sanitize_name(name: str) -> str:
    """Java named groups allow only [A-Za-z][A-Za-z0-9]*; grok aliases may
    contain dots — map them reversibly to a safe token."""
    return re.sub(r"[^A-Za-z0-9]", "0", name)


def grok_expand(
    pattern: str,
    named_captures_only: bool = True,
    pattern_definitions: dict[str, str] | None = None,
    _depth: int = 0,
    _names: dict[str, str] | None = None,
) -> tuple[str, dict[str, str]]:
    """Expand %{NAME}/%{NAME:alias}/%{NAME:alias:type} references.

    Returns (regex, {sanitized_group_name: original_alias}) — regex group
    names must be [A-Za-z0-9]+ for Java, but go-grok ECS aliases carry dots
    (url.scheme); the map restores the original keys on extraction.
    """
    if _depth > 20:
        raise GrokError("grok pattern recursion too deep")
    defs = dict(BASE_PATTERNS)
    if pattern_definitions:
        defs.update(pattern_definitions)
    names: dict[str, str] = {} if _names is None else _names

    def repl(m: re.Match) -> str:
        name, alias = m.group(1), m.group(2)
        if name not in defs:
            raise GrokError(f"unknown grok pattern %{{{name}}}")
        body, _ = grok_expand(
            defs[name], named_captures_only, pattern_definitions, _depth + 1, names
        )
        if alias:
            g = _sanitize_name(alias)
            names[g] = alias
            return f"(?P<{g}>{body})"
        if named_captures_only:
            return f"(?:{body})"
        g = _sanitize_name(name)
        names[g] = name
        return f"(?P<{g}>{body})"

    return _GROK_REF.sub(repl, pattern), names


def grok_to_regex(
    pattern: str,
    named_captures_only: bool = True,
    pattern_definitions: dict[str, str] | None = None,
) -> str:
    return grok_expand(pattern, named_captures_only, pattern_definitions)[0]


def grok_group_names(pattern: str, **kw) -> list[str]:
    regex = grok_to_regex(pattern, **kw)
    return re.findall(r"\(\?P<([A-Za-z0-9]+)>", regex)


def grok_parse_pandas(df, pattern: str, text_col: str = "text", prefix: str = "", **kw):
    """Single-pass grok extraction as an Arrow-batched pandas UDF.

    The native path (ottl ExtractGrokPatterns -> one regexp_extract per
    group) evaluates the regex k times per row JVM-side; this path compiles
    the expanded regex once per executor and matches each row once,
    returning all groups — the better trade once group count is large. This
    is the reference's ExtractGrokPatterns execution model
    (`pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:17-22`) vectorized
    over Arrow batches.

    Returns df + one string column per named group (prefix + group name).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    regex = grok_to_regex(pattern, **kw)
    names = re.findall(r"\(\?P<([A-Za-z0-9]+)>", regex)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(prefix + n, T.StringType()) for n in names]
    )

    def batches(it):
        compiled = re.compile(regex)
        for pdf in it:
            extracted = pdf[text_col].str.extract(compiled)
            extracted.columns = [prefix + n for n in names]
            yield pd.concat([pdf.reset_index(drop=True), extracted.reset_index(drop=True)], axis=1)

    return df.mapInPandas(batches, out_schema)


def grok_extract_map_udf(text_col, pattern: str, **kw):
    """Single-pass grok extraction returning a map<string,string> Column.

    One compiled regex match per row inside an Arrow-batched pandas UDF —
    the fast path the OTTL ExtractGrokPatterns converter auto-selects for
    many-group composite patterns, where k JVM-side regexp_extract calls
    re-match the (large) expanded regex k times per row (measured ~3.5x
    slower at 6 groups). Empty groups are omitted and dotted ECS aliases
    restored, matching the JVM path exactly.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    regex, names = grok_expand(pattern, **kw)

    def batch(s):
        compiled = re.compile(regex)
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            m = compiled.search(v)
            if m is None:
                out.append({})
                continue
            d = m.groupdict()
            out.append(
                {names.get(k, k): g for k, g in d.items() if g is not None and g != ""}
            )
        return pd.Series(out)

    udf = F.pandas_udf(batch, T.MapType(T.StringType(), T.StringType()))
    return udf(text_col)
