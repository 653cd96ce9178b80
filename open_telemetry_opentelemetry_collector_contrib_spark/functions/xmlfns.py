"""XML converters — ParseSimplifiedXML / GetXML analogs.

The reference's XML family (`pkg/ottl/ottlfuncs/func_parse_simplified_xml.go`,
`func_get_xml.go`) has no native Spark column functions; these run stdlib
``xml.etree`` inside Arrow-batched pandas UDFs (the documented UDF escape
hatch). Simplified-XML semantics: element tree collapses to nested dicts,
text-only elements become values; we flatten to a dotted-key
map<string,string> (matching our flat attribute model).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_element(elem, prefix: str, out: dict) -> None:
    children = list(elem)
    if not children:
        out[prefix] = elem.text or ""
        return
    counts: dict[str, int] = {}
    for child in children:
        tag = child.tag
        counts[tag] = counts.get(tag, 0) + 1
    seen: dict[str, int] = {}
    for child in children:
        tag = child.tag
        if counts[tag] > 1:
            idx = seen.get(tag, 0)
            seen[tag] = idx + 1
            key = f"{prefix}.{tag}[{idx}]" if prefix else f"{tag}[{idx}]"
        else:
            key = f"{prefix}.{tag}" if prefix else tag
        _flatten_element(child, key, out)


def parse_simplified_xml(col: Column) -> Column:
    """XML document string -> dotted-key map<string,string> (None on bad XML,
    matching error_mode=ignore leaving the target unset)."""
    import pandas as pd

    def fn(s):
        import xml.etree.ElementTree as ET

        out = []
        for v in s:
            try:
                root = ET.fromstring(v)
                d: dict = {}
                _flatten_element(root, root.tag, d)
                out.append(d)
            except Exception:
                out.append(None)
        return pd.Series(out)

    udf = F.pandas_udf(fn, T.MapType(T.StringType(), T.StringType()))
    return udf(col)


def get_xml(col: Column, xpath: str) -> Column:
    """First match of an ElementTree-supported XPath -> text (GetXML)."""
    import pandas as pd

    def fn(s):
        import xml.etree.ElementTree as ET

        out = []
        for v in s:
            try:
                root = ET.fromstring(v)
                hit = root.find(xpath)
                out.append(None if hit is None else (hit.text or ""))
            except Exception:
                out.append(None)
        return pd.Series(out)

    udf = F.pandas_udf(fn, T.StringType())
    return udf(col)
