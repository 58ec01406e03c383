"""Dependency-free YAML subset parser for config files.

The reference accepts the same configuration tree in TOML or YAML
(`spi/config/unmarshall.go`); PyYAML is not part of this pinned
environment, so `config.load_raw` previously raised on `.yaml` paths.
Config files only ever use the plain subset — nested mappings by
indentation, scalar values, scalar lists (block `- item` or inline
`[a, b]`), quotes and comments — which parses in ~100 lines of
stdlib Python. Anything outside that subset (anchors/aliases, block
scalars, flow mappings, multi-document streams, tabs) raises
ValueError naming the construct, so an exotic file fails loudly
instead of mis-parsing.

PyYAML, when present, still wins (config.load_raw tries it first);
this module is the fallback that keeps the YAML surface working in
minimal environments.
"""

from __future__ import annotations

from typing import Any

_BOOLS = {"true": True, "false": False, "yes": True, "no": False,
          "on": True, "off": False}


def _strip_comment(line: str) -> str:
    """Drop a trailing comment, respecting quoted strings.

    YAML only starts a comment at a '#' that sits at line start or is
    preceded by whitespace — an unquoted value like ``p#ss`` is a
    plain scalar, not ``p`` plus a comment. (PyYAML wins when
    installed, so truncating here would make the same file parse
    differently across environments.)
    """
    out = []
    quote = None
    prev = None
    for ch in line:
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
            prev = ch
            continue
        if ch in "'\"":
            quote = ch
            out.append(ch)
            prev = ch
            continue
        if ch == "#" and (prev is None or prev in " \t"):
            break
        out.append(ch)
        prev = ch
    return "".join(out).rstrip()


_DQ_ESCAPES = {
    "\\": "\\", '"': '"', "'": "'", "n": "\n", "t": "\t", "r": "\r",
    "0": "\0", "a": "\a", "b": "\b", "f": "\f", "v": "\v", "e": "\x1b",
    " ": " ", "N": "\x85", "_": "\xa0", "L": "\u2028", "P": "\u2029",
}


def _unescape_double(body: str) -> str:
    """Decode YAML double-quote escapes explicitly. The previous
    ``encode().decode('unicode_escape')`` round-trips through latin-1
    and mojibakes any non-ASCII content ("héllo" -> 'hÃ©llo'),
    diverging from PyYAML for the same file; here non-ASCII text
    passes through untouched and only escape sequences decode."""
    out: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        if i + 1 >= len(body):
            raise ValueError(f"dangling backslash in double-quoted scalar: {body!r}")
        esc = body[i + 1]
        if esc in _DQ_ESCAPES:
            out.append(_DQ_ESCAPES[esc])
            i += 2
        elif esc in "xuU":
            width = {"x": 2, "u": 4, "U": 8}[esc]
            hexdig = body[i + 2 : i + 2 + width]
            if len(hexdig) != width:
                raise ValueError(
                    f"truncated \\{esc} escape in double-quoted scalar: {body!r}"
                )
            try:
                out.append(chr(int(hexdig, 16)))
            except ValueError:
                raise ValueError(
                    f"invalid \\{esc} escape in double-quoted scalar: {body!r}"
                ) from None
            i += 2 + width
        else:
            raise ValueError(
                f"unsupported escape \\{esc} in double-quoted scalar "
                "(outside the YAML subset)"
            )
    return "".join(out)


def _scalar(tok: str) -> Any:
    tok = tok.strip()
    if tok == "" or tok in ("~", "null", "Null", "NULL"):
        return None
    if tok[0] in "'\"":
        if len(tok) < 2 or tok[-1] != tok[0]:
            raise ValueError(f"unterminated quoted scalar: {tok!r}")
        body = tok[1:-1]
        if tok[0] == "'":
            return body.replace("''", "'")
        return _unescape_double(body)
    if tok.startswith("[") :
        if not tok.endswith("]"):
            raise ValueError(f"unterminated inline list: {tok!r}")
        inner = tok[1:-1].strip()
        if not inner:
            return []
        return [_scalar(t) for t in _split_inline(inner)]
    if tok.startswith("{"):
        raise ValueError("flow mappings ({...}) are outside the YAML subset")
    if tok.startswith(("&", "*", "|", ">")):
        raise ValueError(
            f"{tok[0]!r} (anchor/alias/block scalar) is outside the subset"
        )
    low = tok.lower()
    if low in _BOOLS:
        return _BOOLS[low]
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


def _split_inline(inner: str) -> list[str]:
    parts, buf, quote = [], [], None
    for ch in inner:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == ",":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if quote:
        raise ValueError(f"unterminated quote in inline list: {inner!r}")
    parts.append("".join(buf))
    return parts


def _split_key(line: str) -> tuple[str, str] | None:
    """Split `key: value` at the first unquoted colon(+space/EOL)."""
    quote = None
    for i, ch in enumerate(line):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == ":" and (i + 1 == len(line) or line[i + 1] in " \t"):
            return line[:i].strip(), line[i + 1 :].strip()
    return None


def parse_yaml_subset(text: str) -> dict:
    lines: list[tuple[int, str]] = []  # (indent, content)
    for raw in text.splitlines():
        if "\t" in raw[: len(raw) - len(raw.lstrip())]:
            raise ValueError("tab indentation is outside the YAML subset")
        line = _strip_comment(raw)
        if not line.strip():
            continue
        if line.strip() == "---":
            if lines:
                raise ValueError("multi-document YAML is outside the subset")
            continue
        lines.append((len(line) - len(line.lstrip()), line.strip()))

    pos = 0

    def parse_block(indent: int) -> Any:
        nonlocal pos
        if pos < len(lines) and lines[pos][1].startswith("- "):
            items = []
            while pos < len(lines) and lines[pos][0] == indent and lines[
                pos
            ][1].startswith("- "):
                body = lines[pos][1][2:].strip()
                if _split_key(body) is not None:
                    raise ValueError(
                        "lists of mappings are outside the YAML subset"
                    )
                items.append(_scalar(body))
                pos += 1
            return items
        out: dict = {}
        while pos < len(lines):
            ind, content = lines[pos]
            if ind < indent:
                break
            if ind > indent:
                raise ValueError(
                    f"unexpected indentation at {content!r}"
                )
            kv = _split_key(content)
            if kv is None:
                raise ValueError(f"expected 'key: value', got {content!r}")
            key, val = kv
            key = _scalar(key)
            pos += 1
            if val == "":
                if pos < len(lines) and lines[pos][0] > ind:
                    out[key] = parse_block(lines[pos][0])
                else:
                    out[key] = None
            else:
                out[key] = _scalar(val)
        return out

    result = parse_block(lines[0][0]) if lines else {}
    if pos != len(lines):
        raise ValueError(f"trailing content at {lines[pos][1]!r}")
    if not isinstance(result, dict):
        raise ValueError("top-level YAML value must be a mapping")
    return result
