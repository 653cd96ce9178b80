"""XML converter family — ParseSimplifiedXML / ParseXML / GetXML /
InsertXML / RemoveXML / ConvertAttributesToElementsXML /
ConvertTextToElementsXML analogs.

The reference's XML converters (`pkg/ottl/ottlfuncs/func_parse_xml.go`,
`func_get_xml.go`, `func_insert_xml.go`, `func_remove_xml.go`,
`func_convert_attributes_to_elements_xml.go`,
`func_convert_text_to_elements_xml.go`) wrap antchfx/xmlquery; there is no
native Spark column function for XML, so these run stdlib ``xml.etree``
inside Arrow-batched pandas UDFs (the documented UDF escape hatch — one
Python roundtrip per batch, never per row).

Multi-root documents are handled by parsing inside a synthetic wrapper
element (the analog of xmlquery's DocumentNode); a leading XML declaration
is stripped before parsing and re-attached on serialize, mirroring
``parseNodesXML`` (`func_remove_xml.go:84-96`).

Typed divergence (documented): ParseXML's recursive pcommon.Map becomes a
flat map<string,string> whose ``attributes`` / ``children`` entries are
JSON-encoded (our frames are statically typed; `String()` of the reference
result renders the same JSON nesting).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WRAP = "ottl-xml-wrapper"
_DECL_RE = re.compile(r"^\s*<\?xml[^>]*\?>")


# ---------------------------------------------------------------------------
# plain-Python document model helpers (run inside pandas UDF batches)
# ---------------------------------------------------------------------------


def _parse_wrapped(s: str):
    """Parse a possibly-multi-root document -> (wrapper Element, decl str)."""
    import xml.etree.ElementTree as ET

    decl = ""
    m = _DECL_RE.match(s)
    if m:
        decl = m.group(0).strip()
        s = s[m.end():]
    return ET.fromstring(f"<{_WRAP}>{s}</{_WRAP}>"), decl


def _serialize_wrapped(wrapper, decl: str) -> str:
    import xml.etree.ElementTree as ET

    parts = [decl] if decl else []
    if wrapper.text:
        parts.append(wrapper.text)
    for child in wrapper:
        parts.append(ET.tostring(child, encoding="unicode", short_empty_elements=False))
    return "".join(parts)


def _parent_map(wrapper) -> dict:
    return {id(c): p for p in wrapper.iter() for c in p}


def _resolve_base(wrapper, base: str):
    """Element selection for an absolute/descendant path ('' = wrapper)."""
    if base in ("", "/"):
        return [wrapper]
    if base.startswith("//"):
        pat = ".//" + base[2:] if base[2:] else ".//*"
        return wrapper.findall(pat)
    if base.startswith("/"):
        return wrapper.findall("./" + base[1:])
    return wrapper.findall(".//" + base)


def _split_xpath(xpath: str):
    """-> (base_path, kind, attr_name) where kind in element|attr|text."""
    if xpath.endswith("/text()"):
        return xpath[: -len("/text()")], "text", None
    m = re.search(r"/@([A-Za-z_*][\w.\-]*)$", xpath)
    if m:
        base = xpath[: m.start()]
        if xpath.startswith("//") and m.start() <= 1:
            base = "//"  # '//@x' = the attribute on ANY element
        return base, "attr", m.group(1)
    return xpath, "element", None


def _remove_element(parent, elem) -> None:
    # the tail is a sibling text node in the reference model — keep it
    kids = list(parent)
    idx = kids.index(elem)
    tail = elem.tail or ""
    if tail:
        if idx > 0:
            kids[idx - 1].tail = (kids[idx - 1].tail or "") + tail
        else:
            parent.text = (parent.text or "") + tail
    parent.remove(elem)


def _xml_str_udf(fn):
    """Wrap a str -> str|None document transform as an Arrow-batched UDF."""
    import pandas as pd

    def batch(s):
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(fn(v))
            except Exception:
                out.append(None)  # error_mode=ignore parity: leave target unset
        return pd.Series(out, dtype=object)

    return F.pandas_udf(batch, T.StringType())


# ---------------------------------------------------------------------------
# ParseSimplifiedXML (func_parse_simplified_xml.go)
# ---------------------------------------------------------------------------


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


# ---------------------------------------------------------------------------
# ParseXML (func_parse_xml.go:64-134): {tag, content?, attributes?, children?}
# ---------------------------------------------------------------------------


def _element_to_dict(elem) -> dict:
    d: dict = {"tag": elem.tag}
    text = (elem.text or "").strip()  # CharData is space-trimmed (ref :95-97)
    for child in elem:
        text += (child.tail or "").strip()
    if text:
        d["content"] = text
    if elem.attrib:
        d["attributes"] = dict(elem.attrib)
    kids = [_element_to_dict(c) for c in elem]
    if kids:
        d["children"] = kids
    return d


def parse_xml(col: Column) -> Column:
    """Strict single-root XML -> map with JSON-encoded nested parts.

    Keys: tag (string), content (concatenated trimmed CharData),
    attributes (JSON object string), children (JSON array string).
    """
    import pandas as pd

    def fn(s):
        import xml.etree.ElementTree as ET

        out = []
        for v in s:
            try:
                d = _element_to_dict(ET.fromstring(v))
                flat = {"tag": d["tag"]}
                if "content" in d:
                    flat["content"] = d["content"]
                if "attributes" in d:
                    flat["attributes"] = json.dumps(d["attributes"], separators=(",", ":"))
                if "children" in d:
                    flat["children"] = json.dumps(d["children"], separators=(",", ":"))
                out.append(flat)
            except Exception:
                out.append(None)
        return pd.Series(out)

    udf = F.pandas_udf(fn, T.MapType(T.StringType(), T.StringType()))
    return udf(col)


# ---------------------------------------------------------------------------
# GetXML (func_get_xml.go:40-62): serialize all matched ELEMENT nodes
# ---------------------------------------------------------------------------


def get_xml(col: Column, xpath: str) -> Column:
    base, kind, _attr = _split_xpath(xpath)
    if kind != "element":
        raise ValueError("GetXML supports element selection only (ref parity)")

    def fn(v: str):
        import copy
        import xml.etree.ElementTree as ET

        wrapper, _decl = _parse_wrapped(v)
        parts = []
        for n in _resolve_base(wrapper, base):
            if n is wrapper:
                continue
            c = copy.deepcopy(n)
            c.tail = None
            parts.append(ET.tostring(c, encoding="unicode", short_empty_elements=False))
        return "".join(parts)

    return _xml_str_udf(fn)(col)


# ---------------------------------------------------------------------------
# InsertXML (func_insert_xml.go:60-96)
# ---------------------------------------------------------------------------


def insert_xml(col: Column, xpath: str, subdoc: Column) -> Column:
    base, kind, _attr = _split_xpath(xpath)
    if kind != "element":
        raise ValueError("InsertXML XPath must select elements")
    import pandas as pd

    def batch(docs, subs):
        import copy

        out = []
        for v, sub in zip(docs, subs):
            if v is None or sub is None:
                out.append(None)
                continue
            try:
                wrapper, decl = _parse_wrapped(v)
                sub_wrapper, _ = _parse_wrapped(sub)
                targets = _resolve_base(wrapper, base)
                for t in targets:
                    for child in sub_wrapper:
                        t.append(copy.deepcopy(child))
                out.append(_serialize_wrapped(wrapper, decl))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    udf = F.pandas_udf(batch, T.StringType())
    return udf(col, subdoc)


# ---------------------------------------------------------------------------
# RemoveXML (func_remove_xml.go:41-72): elements, attributes, text()
# ---------------------------------------------------------------------------


def remove_xml(col: Column, xpath: str) -> Column:
    base, kind, attr = _split_xpath(xpath)

    def fn(v: str):
        wrapper, decl = _parse_wrapped(v)
        matched = _resolve_base(wrapper, base)
        if kind == "attr":
            for n in matched:
                if attr == "*":
                    n.attrib.clear()
                else:
                    n.attrib.pop(attr, None)
        elif kind == "text":
            for n in matched:
                n.text = None
                for c in n:
                    c.tail = None
        else:
            parents = _parent_map(wrapper)
            for n in matched:
                if n is wrapper:
                    continue
                _remove_element(parents[id(n)], n)
        return _serialize_wrapped(wrapper, decl)

    return _xml_str_udf(fn)(col)


# ---------------------------------------------------------------------------
# ConvertAttributesToElementsXML (func_convert_attributes_to_elements_xml.go)
# ---------------------------------------------------------------------------


def convert_attributes_to_elements_xml(col: Column, xpath: str = "//@*") -> Column:
    base, kind, attr = _split_xpath(xpath)
    if kind == "element":
        raise ValueError("ConvertAttributesToElementsXML XPath must select attributes")

    def fn(v: str):
        import xml.etree.ElementTree as ET

        wrapper, decl = _parse_wrapped(v)
        for n in _resolve_base(wrapper, base):
            if n is wrapper:
                continue
            names = list(n.attrib) if attr == "*" else ([attr] if attr in n.attrib else [])
            for name in names:
                child = ET.SubElement(n, name)
                child.text = n.attrib[name]
            for name in names:
                del n.attrib[name]
        return _serialize_wrapped(wrapper, decl)

    return _xml_str_udf(fn)(col)


# ---------------------------------------------------------------------------
# ConvertTextToElementsXML (func_convert_text_to_elements_xml.go:48-109)
# ---------------------------------------------------------------------------


def _wrap_text_nodes(elem, name: str) -> None:
    import xml.etree.ElementTree as ET

    kids = list(elem)
    for c in kids:
        _wrap_text_nodes(c, name)  # children convert first (ref :77-84)
    value_count = (1 if elem.text else 0) + sum(1 for c in kids if c.tail)
    if value_count == 0 or len(kids) + value_count <= 1:
        return
    rebuilt = []
    if elem.text:
        w = ET.Element(name)
        w.text = elem.text
        elem.text = None
        rebuilt.append(w)
    for c in kids:
        rebuilt.append(c)
        if c.tail:
            w = ET.Element(name)
            w.text = c.tail
            c.tail = None
            rebuilt.append(w)
    for c in kids:
        elem.remove(c)
    for c in rebuilt:
        elem.append(c)


def convert_text_to_elements_xml(
    col: Column, xpath: str = "/", element_name: str = "value"
) -> Column:
    base, kind, _attr = _split_xpath(xpath)
    if kind != "element":
        raise ValueError("ConvertTextToElementsXML XPath must select elements")

    def fn(v: str):
        wrapper, decl = _parse_wrapped(v)
        for n in _resolve_base(wrapper, base):
            _wrap_text_nodes(n, element_name)
        return _serialize_wrapped(wrapper, decl)

    return _xml_str_udf(fn)(col)
