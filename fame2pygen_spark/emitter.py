"""Emit PySpark ``Column`` expressions from FAME expression ASTs.

This replaces the reference's string-template rendering
(``/root/reference/fame2pygen/formulas_generator.py:510-917``) with a
direct interpretation against the DataFrame API: every FAME construct
maps to stock ``pyspark.sql.functions`` so the whole plan stays inside
Catalyst / whole-stage codegen — no Python UDFs anywhere on this path.

Window convention
-----------------
FAME's lag/lead (``v[t±k]``), ``pct``, ``diff`` and whole-series
aggregates (``ave``, ``firstvalue`` …) are ordered-window operations
over the DATE axis.  The reference relies on physical row order of a
single in-memory frame; we make the ordering explicit with
``Window.partitionBy(*entity_cols).orderBy(DATE)``.

``entity_cols`` is empty for reference-parity wide frames (one global
series — the window is a single partition, fine at ~10^4 rows), and
non-empty for the 100 TB long-format layout where each entity's series
is an independent partition and the windows scale out.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date as _date
from typing import Callable

from pyspark.sql import Column, Window, functions as F

from .parser import expressions as X

#: special FAME sentinel produced by dateof(..., contain, end) — reference
#: ``formulas_generator.py:1331-1338`` compiles known variants to this
#: far-future constant and leaves others undefined (null).
DATEOF_SENTINEL = _date(9999, 12, 31)

_DATEOF_KNOWN = {("BEFORE", "ENDING"), ("CONTAIN", "END")}


@dataclass
class Emitted:
    """A Spark Column plus whether it contains a window function —
    needed because Spark forbids nesting window functions, so an outer
    lag/lead over a windowed expression must be staged first."""

    col: Column
    windowed: bool = False


@dataclass
class EmitContext:
    date_col: str = "DATE"
    entity_cols: tuple[str, ...] = ()
    #: scalar name (lower) -> evaluated python value
    scalars: dict[str, object] = field(default_factory=dict)
    #: current frame columns (canonical names)
    columns: set[str] = field(default_factory=set)
    #: reference rewrites, e.g. convert target -> SOURCE+suffix
    renames: dict[str, str] = field(default_factory=dict)
    #: callback that materializes an intermediate Column as a temp
    #: column on the frame and returns a plain reference to it
    stage: Callable[[Column], Column] | None = None

    def ordered_window(self):
        return Window.partitionBy(*self.entity_cols).orderBy(self.date_col)

    def full_window(self):
        return (
            Window.partitionBy(*self.entity_cols)
            .orderBy(self.date_col)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )

    def resolve_column(self, name: str) -> str:
        col = X.column_name(name)
        return self.renames.get(col, col)


def _shift(ctx: EmitContext, col: Column, offset: int) -> Column:
    """offset>0 → lead (FAME ``v[t+k]``), offset<0 → lag."""
    if offset == 0:
        return col
    w = ctx.ordered_window()
    if offset > 0:
        return F.lead(col, offset).over(w)
    return F.lag(col, -offset).over(w)


def _as_unwindowed(ctx: EmitContext, e: Emitted) -> Column:
    """Return a column safe to wrap in another window function."""
    if not e.windowed:
        return e.col
    if ctx.stage is None:
        raise ValueError(
            "nested window expression requires staging but no stager is set"
        )
    return ctx.stage(e.col)


def emit(node: X.Expr, ctx: EmitContext) -> Emitted:
    """Interpret a FAME expression AST into a Spark Column."""
    if isinstance(node, X.Num):
        return Emitted(F.lit(int(node.value) if node.is_int else node.value))

    if isinstance(node, X.Str):
        return Emitted(F.lit(node.value))

    if isinstance(node, X.NullLit):
        return Emitted(F.lit(None))

    if isinstance(node, X.DateCol):
        return Emitted(F.col(ctx.date_col))

    if isinstance(node, X.Ref):
        key = node.name.lower()
        if key in ctx.scalars:
            if node.offset:
                raise ValueError(f"cannot time-index scalar {node.name!r}")
            return Emitted(F.lit(ctx.scalars[key]))
        col = F.col(X.quoted(ctx.resolve_column(node.name)))
        if node.offset == 0:
            return Emitted(col)
        return Emitted(_shift(ctx, col, node.offset), windowed=True)

    if isinstance(node, X.DateIndexRef):
        # value of the series at a fixed date, broadcast to every row
        col = F.col(X.quoted(ctx.resolve_column(node.name)))
        picked = F.max(
            F.when(F.col(ctx.date_col) == F.lit(node.date), col)
        ).over(ctx.full_window())
        return Emitted(picked, windowed=True)

    if isinstance(node, X.DynLookup):
        # series value at the date held in a scalar
        key = node.var.lower()
        if key not in ctx.scalars:
            raise ValueError(
                f"dynamic lookup {node.name}[{node.var}] needs scalar {node.var!r}"
            )
        col = F.col(X.quoted(ctx.resolve_column(node.name)))
        picked = F.max(
            F.when(F.col(ctx.date_col) == F.lit(ctx.scalars[key]), col)
        ).over(ctx.full_window())
        return Emitted(picked, windowed=True)

    if isinstance(node, X.UnaryOp):
        inner = emit(node.operand, ctx)
        return Emitted(-inner.col, inner.windowed)

    if isinstance(node, X.BinOp):
        left = emit(node.left, ctx)
        right = emit(node.right, ctx)
        windowed = left.windowed or right.windowed
        if node.op == "+":
            return Emitted(left.col + right.col, windowed)
        if node.op == "-":
            return Emitted(left.col - right.col, windowed)
        if node.op == "*":
            return Emitted(left.col * right.col, windowed)
        if node.op == "/":
            # FAME/oracle division semantics: x/0 → null (DuckDB NULL,
            # FAME ND), not the ANSI error Spark 4 raises by default
            return Emitted(F.try_divide(left.col, right.col), windowed)
        if node.op == "**":
            return Emitted(F.pow(left.col, right.col), windowed)
        raise ValueError(f"unknown operator {node.op!r}")

    if isinstance(node, X.Compare):
        # ``t gt 100``: Polars compares a Date with an int as
        # days-since-epoch (its physical representation); match that.
        def _num_vs_date(a: X.Expr, b: X.Expr) -> bool:
            return isinstance(a, X.DateCol) and isinstance(b, X.Num)

        if _num_vs_date(node.left, node.right) or _num_vs_date(node.right, node.left):
            epoch = F.lit(_date(1970, 1, 1))

            def as_days(e: X.Expr) -> Emitted:
                if isinstance(e, X.DateCol):
                    return Emitted(F.datediff(F.col(ctx.date_col), epoch))
                return emit(e, ctx)

            left = as_days(node.left)
            right = as_days(node.right)
        else:
            left = emit(node.left, ctx)
            right = emit(node.right, ctx)
        windowed = left.windowed or right.windowed
        ops = {
            "==": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            ">": lambda a, b: a > b,
            "<": lambda a, b: a < b,
            ">=": lambda a, b: a >= b,
            "<=": lambda a, b: a <= b,
        }
        return Emitted(ops[node.op](left.col, right.col), windowed)

    if isinstance(node, X.BoolOp):
        # FAME logicals accept numeric operands (nonzero = true); Spark
        # requires booleans — cast coerces doubles and is a no-op on
        # booleans, with null preserved (three-valued logic intact)
        emitted = [emit(item, ctx) for item in node.items]
        windowed = any(e.windowed for e in emitted)
        out = emitted[0].col.cast("boolean")
        for e in emitted[1:]:
            nxt = e.col.cast("boolean")
            out = (out | nxt) if node.op == "or" else (out & nxt)
        return Emitted(out, windowed)

    if isinstance(node, X.Not):
        inner = emit(node.operand, ctx)
        return Emitted(~inner.col.cast("boolean"), inner.windowed)

    if isinstance(node, X.IfExpr):
        cond = emit(node.cond, ctx)
        then = emit(node.then, ctx)
        other = emit(node.otherwise, ctx)
        return Emitted(
            F.when(cond.col.cast("boolean"), then.col).otherwise(other.col),
            cond.windowed or then.windowed or other.windowed,
        )

    if isinstance(node, X.Func):
        return _emit_func(node, ctx)

    raise ValueError(f"cannot emit {type(node).__name__}")


# ------------------------------------------------------------- functions


def _emit_func(node: X.Func, ctx: EmitContext) -> Emitted:
    name, args = node.name, node.args

    if name == "pct":
        return _pct(ctx, args)
    if name == "diff":
        return _diff(ctx, args)

    if name in ("sqrt", "abs", "log", "exp"):
        inner = emit(args[0], ctx)
        fn = {"sqrt": F.sqrt, "abs": F.abs, "log": F.log, "exp": F.exp}[name]
        return Emitted(fn(inner.col), inner.windowed)

    if name == "lsum":
        # null-safe sum: nulls count as 0 (reference LSUM,
        # formulas_generator.py:1299-1307)
        if not args:
            return Emitted(F.lit(0))
        total = None
        windowed = False
        for arg in args:
            e = emit(arg, ctx)
            windowed = windowed or e.windowed
            piece = F.coalesce(e.col, F.lit(0))
            total = piece if total is None else total + piece
        return Emitted(total, windowed)

    if name == "exists":
        inner = emit(args[0], ctx)
        return Emitted(inner.col.isNotNull(), inner.windowed)

    if name in ("firstvalue", "lastvalue"):
        inner = emit(args[0], ctx)
        col = _as_unwindowed(ctx, inner)
        fn = F.first if name == "firstvalue" else F.last
        return Emitted(fn(col, ignorenulls=True).over(ctx.full_window()), True)

    if name == "ave":
        inner = emit(args[0], ctx)
        col = _as_unwindowed(ctx, inner)
        return Emitted(F.avg(col).over(ctx.full_window()), True)

    if name == "sum" and len(args) == 1:
        inner = emit(args[0], ctx)
        col = _as_unwindowed(ctx, inner)
        return Emitted(F.sum(col).over(ctx.full_window()), True)

    if name in ("min", "max"):
        if len(args) >= 2:
            cols = [emit(a, ctx) for a in args]
            fn = F.least if name == "min" else F.greatest
            return Emitted(
                fn(*[c.col for c in cols]), any(c.windowed for c in cols)
            )
        inner = emit(args[0], ctx)
        col = _as_unwindowed(ctx, inner)
        fn = F.min if name == "min" else F.max
        return Emitted(fn(col).over(ctx.full_window()), True)

    if name == "dateof":
        return _dateof(ctx, args)

    if name == "make":
        # make(date(FREQ), "12jul1985") → date literal
        for arg in args:
            if isinstance(arg, X.Str):
                from .parser.dates import parse_fame_date

                return Emitted(F.lit(parse_fame_date(arg.value)))
        return Emitted(F.lit(None))

    if name == "date":
        # bare date(FREQ) constructor only appears inside make()
        return Emitted(F.lit(None))

    if name in ("convert", "chain", "mchain", "fishvol_rebase", "nlrx"):
        raise ValueError(
            f"{name}() is a frame-level operator; it must appear as the whole "
            f"right-hand side of an assignment, not inside an expression"
        )

    raise ValueError(f"unknown FAME function {name!r}")


def _arg_offset_base(ctx: EmitContext, arg: X.Expr) -> tuple[Column, int] | None:
    """If *arg* is a plain (possibly time-offset) series ref, return the
    base column and offset so shifts can be pushed into lag/lead args
    instead of nesting window functions."""
    if isinstance(arg, X.Ref) and arg.name.lower() not in ctx.scalars:
        return F.col(X.quoted(ctx.resolve_column(arg.name))), arg.offset
    return None


def _pct(ctx: EmitContext, args: tuple[X.Expr, ...]) -> Emitted:
    """pct(x[, k]) = (x - x[t-k]) / x[t-k] * 100 (reference
    ``formulas_generator.py:1285-1292``)."""
    k = 1
    if len(args) > 1:
        off = args[1]
        if isinstance(off, X.Num):
            k = int(off.value)
    base = _arg_offset_base(ctx, args[0])
    if base is not None:
        col, off = base
        cur = _shift(ctx, col, off)
        prev = _shift(ctx, col, off - k)
    else:
        inner = emit(args[0], ctx)
        cur = _as_unwindowed(ctx, inner)
        prev = F.lag(cur, k).over(ctx.ordered_window())
    return Emitted(F.try_divide(cur - prev, prev) * F.lit(100), True)


def _diff(ctx: EmitContext, args: tuple[X.Expr, ...]) -> Emitted:
    """diff(x) = x - x[t-1] (reference ``formulas_generator.py:880``)."""
    base = _arg_offset_base(ctx, args[0])
    if base is not None:
        col, off = base
        cur = _shift(ctx, col, off)
        prev = _shift(ctx, col, off - 1)
    else:
        inner = emit(args[0], ctx)
        cur = _as_unwindowed(ctx, inner)
        prev = F.lag(cur, 1).over(ctx.ordered_window())
    return Emitted(cur - prev, True)


def _dateof(ctx: EmitContext, args: tuple[X.Expr, ...]) -> Emitted:
    """FAME DATEOF — the reference stubs this: known (WHICH, WHEN)
    variants compile to the far-future sentinel 9999-12-31, unknown
    variants to null (``formulas_generator.py:1324-1338``).  We keep the
    sentinel for parity; real last-observation-date semantics are
    available via ``lastvalue`` / ``functions.core.last_observed_date``.
    """
    def suffix(a: X.Expr) -> str:
        if isinstance(a, X.Ref):
            return a.name.upper()
        if isinstance(a, X.Str):
            return a.value.upper()
        return ""

    if len(args) >= 3:
        which, when = suffix(args[-2]), suffix(args[-1])
        if (which, when) in _DATEOF_KNOWN:
            return Emitted(F.lit(DATEOF_SENTINEL))
        return Emitted(F.lit(None))
    if args:
        return emit(args[0], ctx)
    return Emitted(F.lit(None))
