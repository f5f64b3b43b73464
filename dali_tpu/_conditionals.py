"""Per-sample conditional execution (``enable_conditionals=True``).

Reference: ``dali/python/nvidia/dali/_conditionals.py`` + the vendored TF
AutoGraph fork (~12k LoC). DALI rewrites user ``if`` statements on DataNodes into
``_conditional__Split``/``Merge`` nodes and executes each branch on a dynamically
sized sub-batch.

TPU-native re-design: dynamic sub-batch shapes fight XLA, so branches are lowered
to **predicated evaluation** — both branches run on the full (padded) batch and a
per-sample ``Merge`` (``jnp.where`` on device / per-sample select on host) picks
the result (SURVEY §7 hard-parts: "per-sample conditionals on padded batches;
XLA prefers masks"). Semantics match DALI for data values; the cost model differs
(both branches evaluate — the standard TPU trade).

The source rewriting itself is a compact AST transform instead of the vendored
AutoGraph: only ``if``/``elif``/``else`` over DataNodes (+ ``not``/``and``/``or``)
are rewritten, which is exactly the subset DALI documents as supported.
"""

from __future__ import annotations

import ast
import functools
import inspect
import textwrap
from typing import Any

import numpy as np

from ._schema import DALI_SCHEMA, ArgType, register_operator
from .batch import DeviceBatch, HostBatch
from .data_node import DataNode


class _Undefined:
    """Marker for a symbol not defined in one branch (reference AutoGraph
    'undefined' symbols)."""

    __slots__ = ("name",)

    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return f"<undefined {self.name}>"


# ====================================== Merge op =================================================

DALI_SCHEMA("_conditional.Merge").DocStr(
    "Per-sample select(pred, true_val, false_val) — the merge half of DALI's "
    "split/merge conditionals (reference builtin/conditional/merge.h:29), lowered "
    "as predication."
).NumInput(3).NumOutput(1).Devices("cpu", "gpu").MakeInternal()

DALI_SCHEMA("_conditional.Validate").DocStr(
    "Validates that a value is a scalar bool per sample (reference "
    "conditional/validation.h)."
).NumInput(1).NumOutput(1).Devices("cpu").MakeInternal().Passthrough()

DALI_SCHEMA("_conditional.LogicalNot").DocStr(
    "Per-sample logical not (reference conditional/logical_not.h)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").MakeInternal()


from .backend.base import Operator as _Op


@register_operator("_conditional.Merge", "cpu")
class MergeCPU(_Op):
    def run_batch(self, ctx, true_b: HostBatch, false_b: HostBatch, pred_b: HostBatch):
        out = []
        for i in range(len(pred_b)):
            p = bool(np.asarray(pred_b.samples[i]).reshape(-1)[0])
            src = true_b.samples[i] if p else false_b.samples[i]
            if isinstance(src, _Undefined):
                raise RuntimeError(
                    f"Variable '{src.name}' is used after the conditional but was only "
                    "defined in one branch"
                )
            out.append(src)
        layout = true_b.layout or false_b.layout
        return [HostBatch(out, layout=layout)]

    def output_layout(self, j, inputs):
        return inputs[0].layout if inputs else ""


@register_operator("_conditional.Merge", "gpu")
class MergeGPU(_Op):
    def host_output_shapes(self, ctx, input_shapes, input_batches):
        # Per-sample shape select so host-side shape inference flows through
        # conditionals (without this, a device Rotate after a Merge has no
        # extents for its canvas math). The predicate reaches the host intact:
        # pred.gpu() inserts _CopyToDevice, a host-stage op whose output batch
        # is the boundary HostBatch.
        ts, fs = input_shapes[0], input_shapes[1]
        if ts is None or fs is None:
            return None
        ts, fs = np.asarray(ts), np.asarray(fs)
        if ts.shape != fs.shape:
            return None
        pred = input_batches[2] if len(input_batches) > 2 else None
        if pred is None:
            return None
        sel = np.array([bool(np.asarray(s).reshape(-1)[0]) for s in pred.samples])
        return [np.where(sel[:, None], ts, fs)]

    def lower(self, dctx, true_b: DeviceBatch, false_b: DeviceBatch, pred_b: DeviceBatch):
        import jax.numpy as jnp

        p = pred_b.data.reshape(pred_b.data.shape[0], *([1] * (true_b.data.ndim - 1)))
        t, f = true_b.data, false_b.data
        if t.shape != f.shape:
            # pad to the common canvas
            tgt = tuple(max(a, b) for a, b in zip(t.shape, f.shape))
            t = jnp.pad(t, [(0, d - s) for s, d in zip(t.shape, tgt)])
            f = jnp.pad(f, [(0, d - s) for s, d in zip(f.shape, tgt)])
        out = jnp.where(p != 0, t, f.astype(t.dtype))
        shapes = None
        if true_b.shapes is not None or false_b.shapes is not None:
            n = t.shape[0]
            ts = true_b.shapes if true_b.shapes is not None else jnp.tile(
                jnp.asarray(true_b.data.shape[1:], jnp.int32)[None], (n, 1)
            )
            fs = false_b.shapes if false_b.shapes is not None else jnp.tile(
                jnp.asarray(false_b.data.shape[1:], jnp.int32)[None], (n, 1)
            )
            shapes = jnp.where(pred_b.data.reshape(n, 1) != 0, ts, fs)
        return [DeviceBatch(out, shapes, true_b.layout or false_b.layout)]


@register_operator("_conditional.LogicalNot", "cpu")
class LogicalNotCPU(_Op):
    def run_sample(self, ctx, idx, x):
        return np.logical_not(np.asarray(x).reshape(-1)[0]).reshape(np.asarray(x).shape)


@register_operator("_conditional.LogicalNot", "gpu")
class LogicalNotGPU(_Op):
    def lower(self, dctx, inp):
        import jax.numpy as jnp

        return [inp.with_data(jnp.logical_not(inp.data != 0))]


@register_operator("_conditional.Validate", "cpu")
class ValidateCPU(_Op):
    def run_batch(self, ctx, inp: HostBatch):
        for s in inp.samples:
            a = np.asarray(s)
            if a.size != 1:
                raise ValueError(
                    "Conditions in `if` statements must be scalar per sample "
                    f"(got shape {a.shape}); reference conditional/validation.h"
                )
        return [inp]


# ================================= runtime hooks ==================================================


def _merge(pred, true_val, false_val):
    from . import _op_call

    if isinstance(true_val, _Undefined) and isinstance(false_val, _Undefined):
        return true_val
    if not isinstance(true_val, DataNode) and not isinstance(false_val, DataNode):
        # plain python values: must agree (DALI: python-side values can't branch
        # per-sample)
        if isinstance(true_val, _Undefined) or isinstance(false_val, _Undefined):
            return true_val if isinstance(false_val, _Undefined) else false_val
        if true_val is false_val or true_val == false_val:
            return true_val
        raise TypeError(
            "A non-DataNode value differs between conditional branches; only "
            "DataNodes can vary per sample"
        )
    tv, fv = true_val, false_val
    if isinstance(tv, _Undefined) or isinstance(fv, _Undefined):
        missing = tv if isinstance(tv, _Undefined) else fv
        raise RuntimeError(
            f"Variable '{missing.name}' must be defined in both branches of the conditional"
        )
    if not isinstance(tv, DataNode):
        tv = _constant_like(tv, fv)
    if not isinstance(fv, DataNode):
        fv = _constant_like(fv, tv)
    device = "gpu" if (tv.device == "gpu" or fv.device == "gpu") else "cpu"
    if device == "gpu":
        tv = tv.gpu()
        fv = fv.gpu()
        pred_in = pred.gpu()
    else:
        pred_in = pred
    return _op_call("_conditional.Merge", device=device, inputs=[tv, fv, pred_in])


def _constant_like(value, other: DataNode):
    from . import types as _t

    return _t.Constant(np.asarray(value), device="cpu")


def if_stmt(cond, body_fn, orelse_fn, init_vals):
    """Functional lowering of a rewritten ``if`` (the AutoGraph ``if_stmt``
    analogue): evaluates both branches, merges modified symbols per sample."""
    from . import _op_call

    if not isinstance(cond, DataNode):
        # plain python condition — behave like normal python
        return body_fn(*init_vals) if cond else orelse_fn(*init_vals)
    cond = _op_call("_conditional.Validate", device="cpu", inputs=[cond])
    true_vals = body_fn(*init_vals)
    false_vals = orelse_fn(*init_vals)
    return tuple(_merge(cond, t, f) for t, f in zip(true_vals, false_vals))


def not_(x):
    from . import _op_call

    if isinstance(x, DataNode):
        return _op_call("_conditional.LogicalNot", device=x.device, inputs=[x])
    return not x


def and_(lhs_fn, rhs_fn):
    lhs = lhs_fn()
    if isinstance(lhs, DataNode):
        rhs = rhs_fn()
        if not isinstance(rhs, DataNode):
            raise TypeError("`and` between a DataNode and a python value is not supported")
        # elementwise product of bools ≡ logical and (evaluated eagerly; DALI
        # documents lazy evaluation — divergence noted in module docstring)
        return (lhs != 0) & (rhs != 0)
    return lhs and rhs_fn()


def or_(lhs_fn, rhs_fn):
    lhs = lhs_fn()
    if isinstance(lhs, DataNode):
        rhs = rhs_fn()
        if not isinstance(rhs, DataNode):
            raise TypeError("`or` between a DataNode and a python value is not supported")
        return (lhs != 0) | (rhs != 0)
    return lhs or rhs_fn()


# ================================= AST transform ==================================================


class _CollectStores(ast.NodeVisitor):
    def __init__(self):
        self.names = []

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Store) and node.id not in self.names:
            self.names.append(node.id)

    def visit_FunctionDef(self, node):
        if node.name not in self.names:
            self.names.append(node.name)

    def visit_For(self, node):
        self.generic_visit(node)

    def visit_AugAssign(self, node):
        if isinstance(node.target, ast.Name) and node.target.id not in self.names:
            self.names.append(node.target.id)
        self.generic_visit(node)


def _modified_symbols(if_node: ast.If):
    c = _CollectStores()
    for stmt in if_node.body + if_node.orelse:
        c.visit(stmt)
    return c.names


class _ConditionalTransformer(ast.NodeTransformer):
    """Rewrites ``if``/``not``/``and``/``or`` into functional hooks."""

    def __init__(self):
        self._counter = 0

    def _fresh(self, base):
        self._counter += 1
        return f"__dali_{base}_{self._counter}"

    def visit_If(self, node: ast.If):
        node = self.generic_visit(node)
        symbols = _modified_symbols(node)
        body_name = self._fresh("body")
        orelse_name = self._fresh("orelse")
        args = ast.arguments(
            posonlyargs=[], args=[ast.arg(arg=s) for s in symbols], kwonlyargs=[],
            kw_defaults=[], defaults=[],
        )
        ret = ast.Return(value=ast.Tuple(elts=[ast.Name(id=s, ctx=ast.Load()) for s in symbols], ctx=ast.Load()))
        body_fn = ast.FunctionDef(
            name=body_name, args=args, body=list(node.body) + [ret], decorator_list=[],
            returns=None, type_params=[],
        )
        orelse_body = list(node.orelse) if node.orelse else [ast.Pass()]
        orelse_fn = ast.FunctionDef(
            name=orelse_name, args=args, body=orelse_body + [ast.Return(value=ret.value)],
            decorator_list=[], returns=None, type_params=[],
        )
        # init values: name if defined else _Undefined('name')
        init = ast.Tuple(
            elts=[
                ast.Call(
                    func=ast.Name(id="__dali_maybe", ctx=ast.Load()),
                    args=[
                        ast.Constant(value=s),
                        ast.Call(func=ast.Name(id="locals", ctx=ast.Load()), args=[], keywords=[]),
                        ast.Call(func=ast.Name(id="globals", ctx=ast.Load()), args=[], keywords=[]),
                    ],
                    keywords=[],
                )
                for s in symbols
            ],
            ctx=ast.Load(),
        )
        call = ast.Call(
            func=ast.Name(id="__dali_if_stmt", ctx=ast.Load()),
            args=[
                node.test,
                ast.Name(id=body_name, ctx=ast.Load()),
                ast.Name(id=orelse_name, ctx=ast.Load()),
                init,
            ],
            keywords=[],
        )
        assign = ast.Assign(
            targets=[
                ast.Tuple(elts=[ast.Name(id=s, ctx=ast.Store()) for s in symbols], ctx=ast.Store())
            ]
            if symbols
            else [ast.Name(id=self._fresh("unused"), ctx=ast.Store())],
            value=call,
        )
        return [body_fn, orelse_fn, assign]

    def visit_UnaryOp(self, node):
        node = self.generic_visit(node)
        if isinstance(node.op, ast.Not):
            return ast.Call(func=ast.Name(id="__dali_not", ctx=ast.Load()), args=[node.operand], keywords=[])
        return node

    def visit_BoolOp(self, node):
        node = self.generic_visit(node)
        fn_name = "__dali_and" if isinstance(node.op, ast.And) else "__dali_or"
        result = node.values[-1]
        result = _lambda0(result)
        for v in node.values[-2::-1]:
            result = ast.Call(
                func=ast.Name(id=fn_name, ctx=ast.Load()),
                args=[_lambda0(v), result],
                keywords=[],
            )
            result = _lambda0(result)
        # unwrap the outermost lambda: call it
        return ast.Call(func=result, args=[], keywords=[])

    def visit_While(self, node):
        raise NotImplementedError(
            "`while` over DataNodes is not supported (DALI conditionals support if/else only)"
        )


def _lambda0(expr):
    return ast.Lambda(
        args=ast.arguments(posonlyargs=[], args=[], kwonlyargs=[], kw_defaults=[], defaults=[]),
        body=expr,
    )


def _maybe(name, loc, glob):
    if name in loc:
        return loc[name]
    if name in glob:
        return glob[name]
    return _Undefined(name)


def autograph_convert(fn):
    """Source-rewrite ``fn`` for per-sample conditionals (reference
    ``pipeline.py:2179`` AutoGraph conversion when enable_conditionals=True)."""
    if getattr(fn, "_dali_do_not_convert", False):
        return fn
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (OSError, TypeError):
        raise RuntimeError(
            f"enable_conditionals requires source access to {fn.__name__}"
        )
    tree = ast.parse(src)
    fdef = tree.body[0]
    # drop decorators (pipeline_def etc. — they're applied outside)
    fdef.decorator_list = []
    transformer = _ConditionalTransformer()
    new_tree = transformer.visit(tree)
    ast.fix_missing_locations(new_tree)
    code = compile(new_tree, filename=f"<dali_tpu_autograph:{fn.__name__}>", mode="exec")
    glb = dict(fn.__globals__)
    glb["__dali_if_stmt"] = if_stmt
    glb["__dali_not"] = not_
    glb["__dali_and"] = and_
    glb["__dali_or"] = or_
    glb["__dali_maybe"] = _maybe
    # bind closure variables as globals (best effort)
    if fn.__closure__:
        for name, cell in zip(fn.__code__.co_freevars, fn.__closure__):
            try:
                glb[name] = cell.cell_contents
            except ValueError:
                pass
    loc = {}
    exec(code, glb, loc)
    converted = loc[fdef.name]
    converted = functools.wraps(fn)(converted)
    return converted
