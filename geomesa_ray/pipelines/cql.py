"""(E)CQL text → the filter algebra of :mod:`geomesa_ray.pipelines.filters`.

The reference's user-facing query syntax IS (E)CQL — every GeoMesa query
string goes through GeoTools' ECQL parser into a Filter tree that
FilterHelper/FilterSplitter then decompose (geomesa-filter/.../
FilterHelper.scala:100-169, planning/FilterSplitter.scala:25-121). This is
a from-scratch recursive-descent parser for the subset those pipelines
consume, derived from the public OGC CQL / GeoTools ECQL grammar — it
produces exactly our ``Filter`` leaves, so ``plan`` / ``scan_with_filter``
work unchanged on parsed strings.

Supported grammar (case-insensitive keywords)::

    expr        := or
    or          := and (OR and)*
    and         := unary (AND unary)*
    unary       := NOT unary | '(' expr ')' | predicate
    predicate   :=
        BBOX '(' attr ',' num ',' num ',' num ',' num ')'
      | (INTERSECTS|CONTAINS|WITHIN) '(' attr ',' wkt ')'
      | attr DURING instant '/' instant
      | attr (AFTER|BEFORE) instant
      | attr (=|<>|<|<=|>|>=) literal
      | attr BETWEEN literal AND literal
      | attr IN '(' literal (',' literal)* ')'
      | attr LIKE 'pattern'            -- % any run, _ any char

Instants are ISO-8601 (``2024-01-05T00:00:00Z`` / ``...Z`` optional,
date-only allowed) and compile to ``During`` epoch-ms bounds. Point data
makes INTERSECTS/CONTAINS/WITHIN coincide with our boundary-inclusive
``GeomPredicate``. Unsupported constructs raise ``CqlParseError`` with
the offending position — never a silent mis-parse.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from geomesa_ray.pipelines.filters import (
    And,
    AttrCmp,
    AttrEq,
    AttrIn,
    AttrLike,
    BBox,
    During,
    Filter,
    GeomPredicate,
    Not,
    Or,
)

_MAX_MS = 253_402_300_800_000  # year 9999: open upper bound sentinel
_MIN_MS = -62_135_596_800_000  # year 1: open lower bound sentinel


class CqlParseError(ValueError):
    pass


_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<instant>\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z?)?)
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><=|>=|<>|=|<|>)
      | (?P<punct>[(),/])
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "BBOX", "INTERSECTS", "CONTAINS", "WITHIN",
    "DWITHIN", "BEYOND", "DURING", "AFTER", "BEFORE", "BETWEEN", "IN",
    "LIKE",
}

_UNIT_M = {"METERS": 1.0, "METRE": 1.0, "METRES": 1.0, "M": 1.0,
           "KILOMETERS": 1000.0, "KM": 1000.0, "FEET": 0.3048,
           "STATUTE_MILES": 1609.344, "NAUTICAL_MILES": 1852.0}


def _tokenize(text: str) -> list[tuple[str, object, int]]:
    """→ [(kind, value, pos)]; kind ∈ instant num str op punct word kw."""
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RX.match(text, pos)
        if m is None:
            if text[pos:].strip() == "":
                break
            raise CqlParseError(f"unexpected character at {pos}: {text[pos:pos+12]!r}")
        pos = m.end()
        for kind in ("instant", "num", "str", "op", "punct", "word"):
            v = m.group(kind)
            if v is not None:
                # token position = start of the CAPTURE, not the whole
                # match (which includes consumed leading whitespace —
                # that off-by-whitespace truncated WKT slices and skewed
                # every error position)
                at = m.start(kind)
                if kind == "word" and v.upper() in _KEYWORDS:
                    out.append(("kw", v.upper(), at))
                elif kind == "num":
                    out.append(("num", float(v) if ("." in v or "e" in v.lower()) else int(v), at))
                elif kind == "str":
                    out.append(("str", v[1:-1].replace("''", "'"), at))
                else:
                    out.append((kind, v, at))
                break
    return out


def _instant_ms(s: str, pos: int) -> int:
    try:
        iso = s[:-1] if s.endswith("Z") else s
        if "T" not in iso:
            iso += "T00:00:00"
        dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    except ValueError as e:
        raise CqlParseError(f"bad instant at {pos}: {s!r} ({e})") from None


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    # -- token helpers ------------------------------------------------------

    def _peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", None, len(self.text))

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, kind: str, value=None):
        k, v, pos = self._next()
        if k != kind or (value is not None and v != value):
            raise CqlParseError(
                f"expected {value or kind} at {pos}, got {v!r} in {self.text!r}"
            )
        return v

    def _expect_kw(self, word: str):
        k, v, pos = self._next()
        if k != "kw" or v != word:
            raise CqlParseError(f"expected {word} at {pos}, got {v!r}")

    # -- grammar ------------------------------------------------------------

    def parse(self) -> Filter:
        f = self._or()
        k, v, pos = self._peek()
        if k != "eof":
            raise CqlParseError(f"trailing input at {pos}: {v!r}")
        return f

    def _or(self) -> Filter:
        parts = [self._and()]
        while self._peek()[:2] == ("kw", "OR"):
            self._next()
            parts.append(self._and())
        return parts[0] if len(parts) == 1 else Or(*parts)

    def _and(self) -> Filter:
        parts = [self._unary()]
        while self._peek()[:2] == ("kw", "AND"):
            self._next()
            parts.append(self._unary())
        return parts[0] if len(parts) == 1 else And(*parts)

    def _unary(self) -> Filter:
        k, v, _pos = self._peek()
        if (k, v) == ("kw", "NOT"):
            self._next()
            return Not(self._unary())
        if (k, v) == ("punct", "("):
            self._next()
            f = self._or()
            self._expect("punct", ")")
            return f
        return self._predicate()

    def _literal(self):
        k, v, pos = self._next()
        if k in ("num", "str"):
            return v
        raise CqlParseError(f"expected literal at {pos}, got {v!r}")

    def _wkt(self) -> str:
        """Consume a WKT geometry: WORD '(' ... balanced ... ')'."""
        k, v, pos = self._next()
        if k != "word":
            raise CqlParseError(f"expected WKT at {pos}, got {v!r}")
        start = pos
        depth = 0
        # consume raw text from the token stream until parens balance
        j = self.i
        while j < len(self.toks):
            kk, vv, pp = self.toks[j]
            if (kk, vv) == ("punct", "("):
                depth += 1
            elif (kk, vv) == ("punct", ")"):
                depth -= 1
                if depth == 0:
                    end = pp + 1
                    self.i = j + 1
                    return self.text[start:end]
            j += 1
        raise CqlParseError(f"unbalanced WKT starting at {start}")

    def _predicate(self) -> Filter:
        k, v, pos = self._next()
        if k == "kw" and v == "BBOX":
            self._expect("punct", "(")
            self._expect_geom_attr()
            vals = []
            for _ in range(4):
                self._expect("punct", ",")
                kk, vv, pp = self._next()
                if kk != "num":
                    raise CqlParseError(f"expected number at {pp}, got {vv!r}")
                vals.append(float(vv))
            self._expect("punct", ")")
            return BBox(*vals)
        if k == "kw" and v in ("DWITHIN", "BEYOND"):
            from geomesa_ray.geometry.wkt import from_wkt
            from geomesa_ray.pipelines.filters import DWithin

            self._expect("punct", "(")
            self._expect_geom_attr()
            self._expect("punct", ",")
            wkt = self._wkt()
            self._expect("punct", ",")
            dk, dv, dp = self._next()
            if dk != "num":
                raise CqlParseError(f"expected distance at {dp}, got {dv!r}")
            self._expect("punct", ",")
            uk, uv, up = self._next()
            unit = _UNIT_M.get(str(uv).upper()) if uk == "word" else None
            if unit is None:
                raise CqlParseError(
                    f"unknown distance unit at {up}: {uv!r} "
                    f"(one of {sorted(_UNIT_M)})"
                )
            self._expect("punct", ")")
            try:
                geom = from_wkt(wkt)
            except Exception as e:
                raise CqlParseError(f"bad WKT at {pos}: {e}") from None
            dw = DWithin(geom, float(dv) * unit)
            return dw if v == "DWITHIN" else Not(dw)
        if k == "kw" and v in ("INTERSECTS", "CONTAINS", "WITHIN"):
            from geomesa_ray.geometry.wkt import from_wkt

            self._expect("punct", "(")
            self._expect_geom_attr()
            self._expect("punct", ",")
            wkt = self._wkt()
            self._expect("punct", ")")
            try:
                geom = from_wkt(wkt)
            except Exception as e:
                raise CqlParseError(f"bad WKT at {pos}: {e}") from None
            return GeomPredicate(geom)
        if k != "word":
            raise CqlParseError(f"expected predicate at {pos}, got {v!r}")
        attr = v

        k2, v2, pos2 = self._next()
        if k2 == "op":
            val = self._literal()
            return AttrEq(attr, val) if v2 == "=" else AttrCmp(attr, v2, val)
        if (k2, v2) == ("kw", "DURING"):
            ik, iv, ip = self._next()
            if ik != "instant":
                raise CqlParseError(f"expected instant at {ip}, got {iv!r}")
            lo = _instant_ms(iv, ip)
            self._expect("punct", "/")
            ik, iv, ip = self._next()
            if ik != "instant":
                raise CqlParseError(f"expected instant at {ip}, got {iv!r}")
            hi = _instant_ms(iv, ip)
            return During(lo, hi)
        if (k2, v2) == ("kw", "AFTER"):
            ik, iv, ip = self._next()
            if ik != "instant":
                raise CqlParseError(f"expected instant at {ip}, got {iv!r}")
            return During(_instant_ms(iv, ip) + 1, _MAX_MS)  # strictly after
        if (k2, v2) == ("kw", "BEFORE"):
            ik, iv, ip = self._next()
            if ik != "instant":
                raise CqlParseError(f"expected instant at {ip}, got {iv!r}")
            return During(_MIN_MS, _instant_ms(iv, ip))  # strictly before
        if (k2, v2) == ("kw", "BETWEEN"):
            lo = self._literal()
            self._expect_kw("AND")
            hi = self._literal()
            return And(AttrCmp(attr, ">=", lo), AttrCmp(attr, "<=", hi))
        if (k2, v2) == ("kw", "IN"):
            self._expect("punct", "(")
            vals = [self._literal()]
            while self._peek()[:2] == ("punct", ","):
                self._next()
                vals.append(self._literal())
            self._expect("punct", ")")
            return AttrIn(attr, vals)
        if (k2, v2) == ("kw", "LIKE"):
            kk, vv, pp = self._next()
            if kk != "str":
                raise CqlParseError(f"expected quoted pattern at {pp}, got {vv!r}")
            return AttrLike(attr, vv)
        raise CqlParseError(f"unexpected {v2!r} after {attr!r} at {pos2}")

    def _expect_geom_attr(self):
        k, v, pos = self._next()
        if k != "word":
            raise CqlParseError(f"expected geometry attribute at {pos}, got {v!r}")


def parse_ecql(text: str) -> Filter:
    """Parse an (E)CQL string into a :class:`Filter` tree."""
    f = _Parser(text).parse()
    return f
