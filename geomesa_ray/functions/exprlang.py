"""Converter transform-expression language (the reference's convert DSL).

GeoMesa converter configs define each field as a transform expression —
``lowercase($1)``, ``concat($name, '-', $id)``, ``date('yyyy-MM-dd', $3)``
— evaluated per record by a little expression language
(geomesa-convert-common/.../transforms/TransformerFunction.scala and the
parboiled parser in TransformerParser; ScriptingFunctionFactory.scala adds
arbitrary JSR-223 snippets as the escape hatch).

This module is the Ray-Data-native analog: a from-scratch recursive-descent
parser (the pipelines/cql.py pattern) over the SAME surface grammar —
``$field`` / ``$1`` references, string/number/bool literals, nested function
calls — compiled once into a column-at-a-time callable
``(pa.Table) -> pa.Array`` so evaluation inside ``map_batches`` is fully
vectorized (one Arrow kernel chain per batch, never per row).

The scripting escape hatch is :func:`register_expr_function`: a user
registers any Python callable (array in, array out) and calls it from an
expression by name — the idiomatic substitute for embedded JavaScript,
with user registrations taking precedence over builtins exactly like
geomesa_ray.registry.
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa

from geomesa_ray.functions import convert as _c


class ExprParseError(ValueError):
    """Loud parse failure with position context (CqlParseError contract)."""


# --- function registry ------------------------------------------------------

# reference DSL names (camelCase, per TransformerFunction registrations)
# → the vectorized implementations in functions/convert.py
_BUILTINS: dict[str, Callable] = {
    "lowercase": _c.lowercase,
    "uppercase": _c.uppercase,
    "capitalize": _c.capitalize,
    "trim": _c.trim,
    "strip": _c.strip,
    "stripPrefix": _c.strip_prefix,
    "stripSuffix": _c.strip_suffix,
    "remove": _c.remove,
    "replace": _c.replace,
    "regexReplace": _c.regex_replace,
    "concat": _c.concat,
    "concatenate": _c.concat,
    "mkstring": _c.mkstring,
    "emptyToNull": _c.empty_to_null,
    "length": _c.length,
    "substr": _c.substr,
    "substring": _c.substr,
    "millisToDate": _c.millis_to_date,
    "secsToDate": _c.secs_to_date,
    "dateToMillis": _c.date_to_millis,
    "isoDate": _c.iso_date,
    "isoDateTime": _c.iso_datetime,
    "date": lambda fmt, col: _c.date_parse(col, fmt),
    "add": _c.add,
    "subtract": _c.subtract,
    "multiply": _c.multiply,
    "divide": _c.divide,
    "mean": _c.mean,
    "min": _c.min_of,
    "max": _c.max_of,
    "base64Encode": _c.base64_encode,
    "base64Decode": _c.base64_decode,
    "md5": _c.md5,
    "murmur3_64": _c.murmur3_64,
    "murmurHash3": _c.murmur3_64,
    "hexCell": _c.hex_cell,
    "toInt": _c.to_int,
    "toInteger": _c.to_int,
    "stringToInt": _c.to_int,
    "toLong": _c.to_long,
    "stringToLong": _c.to_long,
    "toFloat": _c.to_float,
    "toDouble": _c.to_double,
    "stringToDouble": _c.to_double,
    "toString": _c.to_string,
    "toBoolean": _c.to_boolean,
    "point": _c.point_geom,
    "geometry": _c.geom_from_wkt,
    "geomFromWKT": _c.geom_from_wkt,
    "uuidZ3": _c.uuid5,
    "uuid5": _c.uuid5,
    "withDefault": _c.with_default,
    "intToBoolean": _c.int_to_boolean,
}

_USER: dict[str, Callable] = {}


def register_expr_function(name: str):
    """Decorator: expose a Python callable (Arrow array(s) in, array out)
    to transform expressions — the ScriptingFunctionFactory analog. User
    registrations shadow builtins (registry.py precedence)."""

    def deco(fn: Callable):
        _USER[name] = fn
        return fn

    return deco


def _resolve(name: str) -> Callable:
    if name in _USER:
        return _USER[name]
    if name in _BUILTINS:
        return _BUILTINS[name]
    raise ExprParseError(
        f"unknown function {name!r}; available: "
        f"{sorted(set(_BUILTINS) | set(_USER))}"
    )


# --- tokenizer / parser -----------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<ref>\$[A-Za-z_][A-Za-z0-9_]*|\$[0-9]+)
      | (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<str>'(?:[^'\\]|\\.)*')
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<punct>[(),])
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str, int]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            if text[pos:].strip() == "":
                break
            raise ExprParseError(
                f"cannot tokenize at position {pos}: {text[pos:pos + 20]!r}"
            )
        for kind in ("ref", "num", "str", "name", "punct"):
            val = m.group(kind)
            if val is not None:
                out.append((kind, val, m.start(kind)))
                break
        pos = m.end()
    return out


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None, len(self.text))

    def _next(self):
        tok = self._peek()
        self.i += 1
        return tok

    def parse(self):
        node = self._expr()
        kind, val, pos = self._peek()
        if kind is not None:
            raise ExprParseError(
                f"unexpected trailing input at {pos}: {val!r} in {self.text!r}"
            )
        return node

    def _expr(self):
        kind, val, pos = self._next()
        if kind == "ref":
            return ("ref", val[1:])
        if kind == "num":
            return ("lit", float(val) if "." in val else int(val))
        if kind == "str":
            body = val[1:-1]
            return ("lit", body.replace("\\'", "'").replace("\\\\", "\\"))
        if kind == "name":
            if val in ("true", "false"):
                return ("lit", val == "true")
            if val == "null":
                return ("lit", None)
            nk, nv, npos = self._peek()
            if nk != "punct" or nv != "(":
                raise ExprParseError(
                    f"expected '(' after function name {val!r} at {npos} "
                    f"in {self.text!r}"
                )
            self._next()  # consume (
            args = []
            k, v, p = self._peek()
            if not (k == "punct" and v == ")"):
                args.append(self._expr())
                while True:
                    k, v, p = self._peek()
                    if k == "punct" and v == ",":
                        self._next()
                        args.append(self._expr())
                    elif k == "punct" and v == ")":
                        break
                    else:
                        raise ExprParseError(
                            f"expected ',' or ')' at {p} in {self.text!r}"
                        )
            self._next()  # consume )
            return ("call", val, args)
        raise ExprParseError(
            f"unexpected {'end of input' if kind is None else repr(val)} "
            f"at {pos} in {self.text!r}"
        )


def parse_expr(text: str):
    """Expression string → AST tuple tree (loud ExprParseError)."""
    return _Parser(text).parse()


# --- compiler ---------------------------------------------------------------


def compile_expr(text: str) -> Callable[[pa.Table], "pa.Array"]:
    """Compile an expression to a vectorized ``(pa.Table) -> pa.Array``.

    ``$name`` resolves to the batch column of that name; ``$1``-style
    positional refs are 1-based column indexes (the reference's delimited
    converter convention). Functions are resolved AT COMPILE TIME so typos
    fail on the driver, not inside a Ray task."""
    ast = parse_expr(text)
    _check(ast)

    def run(batch: pa.Table):
        return _eval(ast, batch)

    return run


def _check(node) -> None:
    if node[0] == "call":
        if node[1] == "cql":
            # the CQL escape hatch (CqlFunctionFactory.scala:29-66 analog):
            # validate the embedded predicate at compile time, on the driver
            if len(node[2]) != 1 or node[2][0][0] != "lit" \
                    or not isinstance(node[2][0][1], str):
                raise ExprParseError(
                    "cql() takes exactly one literal ECQL string"
                )
            _cql_compiled(node[2][0][1])
            return
        _resolve(node[1])
        for a in node[2]:
            _check(a)


_CQL_CACHE: dict[str, object] = {}


def _cql_compiled(text: str):
    """Parse-once cache for cql() predicates (compiled on the driver AND
    once per worker process — the parse is microseconds, the cache keeps
    the per-batch path allocation-free)."""
    f = _CQL_CACHE.get(text)
    if f is None:
        from geomesa_ray.pipelines.cql import parse_ecql

        f = _CQL_CACHE[text] = parse_ecql(text)
    return f


def _eval(node, batch: pa.Table):
    tag = node[0]
    if tag == "lit":
        return node[1]
    if tag == "ref":
        name = node[1]
        if name.isdigit():
            idx = int(name) - 1
            if not 0 <= idx < batch.num_columns:
                raise ExprParseError(
                    f"positional ref ${name} out of range for "
                    f"{batch.num_columns}-column batch"
                )
            col = batch.column(idx)
        else:
            if name not in batch.schema.names:
                raise ExprParseError(
                    f"unknown field ${name}; batch has {batch.schema.names}"
                )
            col = batch[name]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    # call
    if node[1] == "cql":
        # ECQL-predicate escape hatch: ``cql('type = ''click'' AND value >
        # 100')`` → boolean column under Kleene three-valued semantics
        # (rows where the predicate is definitely TRUE). The reference's
        # CqlFunctionFactory exposes the full geotools ECQL function table
        # inside converter expressions; the predicate subset is the
        # mainstream use (filtering/flagging records during conversion) —
        # value-returning ECQL functions are covered by the DSL builtins
        # themselves (registry precedence note in the module docstring).
        from geomesa_ray.pipelines.filters import evaluate as _cql_eval

        return pa.array(_cql_eval(_cql_compiled(node[2][0][1]), batch))
    fn = _resolve(node[1])
    return fn(*[_eval(a, batch) for a in node[2]])


def derive_columns(ds, exprs: dict[str, str]):
    """Append one column per ``name → expression`` to a Dataset — each
    expression compiled ONCE on the driver, evaluated column-at-a-time per
    batch (zero-copy Arrow in, one kernel chain out)."""
    compiled = {name: compile_expr(e) for name, e in exprs.items()}

    def apply(batch: pa.Table) -> pa.Table:
        for name, fn in compiled.items():
            out = fn(batch)
            if not isinstance(out, (pa.Array, pa.ChunkedArray)):
                # infer the Arrow type from the scalar ONCE so 0-row blocks
                # (which filters legitimately emit) carry the same typed
                # column as non-empty blocks — pa.array([]) would infer
                # null and break downstream union/write schema checks
                typ = pa.scalar(out).type
                out = pa.array([out] * len(batch), type=typ)
            if name in batch.schema.names:
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name, out
                )
            else:
                batch = batch.append_column(name, out)
        return batch

    return ds.map_batches(apply, batch_format="pyarrow")
