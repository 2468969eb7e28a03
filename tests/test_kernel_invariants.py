"""Static (AST-level) invariants over the Pallas kernel sources.

Motivation (round 3, measured on v5e): an in-kernel ``jnp.dot``/``einsum``
without ``preferred_element_type`` asks Mosaic for a bf16×bf16→bf16 matmul,
which FAILS TO LOWER on TPU ("Expected matmul acc to be 32-bit") — but the
CPU interpret-mode parity tests execute it happily, so nothing in the
functional suite catches the bug before the first real-TPU run (3-8 min
remote compile on this relay).  These tests enforce the rule at CPU-test
time: every dot-like op reachable from a ``pallas_call`` kernel entry must
pin its accumulator dtype explicitly.

The XLA-twin ``*_reference`` oracles in the same files are exempt — their
bf16-output dots are *intentional* (they reproduce the unfused model path's
dtype sequence exactly), and XLA lowers them fine.
"""

from __future__ import annotations

import ast
import glob
import os

import pytest

KERNEL_DIR = os.path.join(
    os.path.dirname(__file__), "..", "multimodal_classification_tpu",
    "ops", "pallas_kernels",
)
DOT_NAMES = {"dot_general", "dot", "matmul", "einsum"}


def _call_name(node: ast.Call) -> str | None:
    fn = node.func
    if isinstance(fn, ast.Attribute):
        return fn.attr
    if isinstance(fn, ast.Name):
        return fn.id
    return None


def _name_refs(node: ast.AST) -> set[str]:
    """All bare identifiers referenced in a subtree (callees, partial args)."""
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def _load_modules():
    files = sorted(glob.glob(os.path.join(KERNEL_DIR, "*.py")))
    assert files, f"no kernel sources under {KERNEL_DIR}"
    funcs: dict[str, ast.FunctionDef] = {}
    entries: set[str] = set()
    for path in files:
        tree = ast.parse(open(path).read(), filename=path)
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef):
                # one shared namespace across the package: helpers are
                # imported between kernel modules by their def name
                funcs.setdefault(node.name, node)
            if isinstance(node, ast.Call) and _call_name(node) == "pallas_call":
                # kernel entry: first positional arg — a bare name or a
                # functools.partial(name, ...) wrapper
                if node.args:
                    entries |= _name_refs(node.args[0])
    return funcs, entries


def _kernel_closure(funcs, entries):
    """Transitive closure of module-level functions reachable from the
    pallas_call entries (nested defs are part of their parent's subtree)."""
    seen: set[str] = set()
    todo = [e for e in entries if e in funcs]
    while todo:
        name = todo.pop()
        if name in seen:
            continue
        seen.add(name)
        for ref in _name_refs(funcs[name]):
            if ref in funcs and ref not in seen:
                todo.append(ref)
    return seen


def test_pallas_call_entries_found():
    funcs, entries = _load_modules()
    kernels = _kernel_closure(funcs, entries)
    # every kernel module ships at least one pallas_call; the closure must
    # cover the known entry families or the scan below checks nothing
    assert len(kernels) >= 6, (entries, kernels)


def test_in_kernel_dots_pin_accumulator_dtype():
    funcs, entries = _load_modules()
    kernels = _kernel_closure(funcs, entries)
    violations = []
    for name in sorted(kernels):
        fn = funcs[name]
        for node in ast.walk(fn):
            if not (isinstance(node, ast.Call)
                    and _call_name(node) in DOT_NAMES):
                continue
            kwargs = {k.arg for k in node.keywords}
            if "preferred_element_type" not in kwargs:
                violations.append(f"{name}:{node.lineno} {_call_name(node)}")
    assert not violations, (
        "in-kernel dot without preferred_element_type (fails Mosaic "
        "lowering on TPU — 'Expected matmul acc to be 32-bit' — but "
        f"passes CPU interpret mode): {violations}"
    )


def test_reference_twins_are_not_swept_in():
    """The exemption holds: the XLA twins stay OUT of the kernel closure
    (if one ever gets called from inside a kernel, that's a real bug —
    a twin traced under Mosaic would hit the same lowering wall)."""
    funcs, entries = _load_modules()
    kernels = _kernel_closure(funcs, entries)
    twins = {n for n in funcs if n.endswith("_reference")
             or n.startswith("reference_")}
    assert twins, "expected XLA-twin oracles in the kernel modules"
    assert not (twins & kernels), twins & kernels


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(os.path.dirname(__file__), "..", "data",
                                   "09_bench_cache", "jax_cache")),
    reason="no committed compile cache (fresh clone without LFS?)",
)
def test_committed_compile_cache_is_populated():
    """Guard the regression that actually happened (round 3 session 2): the
    cache dir was whitelisted in .gitignore but `git add` never ran, so the
    driver's budgeted bench would have cold-compiled 3-8 min per program.
    The committed cache must hold the flagship programs, not a stub."""
    cache = os.path.join(os.path.dirname(__file__), "..", "data",
                         "09_bench_cache", "jax_cache")
    entries = os.listdir(cache)
    assert len(entries) >= 100, (
        f"compile cache at {cache} has only {len(entries)} entries — "
        "did a cleanup drop the committed warm-start entries bench.py "
        "relies on? Re-run `python bench.py` on TPU and git add the dir."
    )
