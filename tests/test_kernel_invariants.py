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
    """Per-module (funcs, entries) pairs.

    Scanning each file with its OWN namespace matches Python's actual name
    resolution: def names collide heavily across kernel modules (_kernel,
    _fwd_kernel, _run, ...), and a shared namespace would resolve a
    pallas_call entry in a later file to the first-seen def of that name —
    leaving the shadowed kernel function unscanned (advisor finding,
    round 3). Cross-module helper imports still resolve because the imported
    def exists under the same name in its home module, which has its own
    pallas_call entries sweeping it in; a fallback union pass below catches
    helpers used only from other modules."""
    files = sorted(glob.glob(os.path.join(KERNEL_DIR, "*.py")))
    assert files, f"no kernel sources under {KERNEL_DIR}"
    modules = []
    for path in files:
        tree = ast.parse(open(path).read(), filename=path)
        funcs: dict[str, ast.FunctionDef] = {}
        entries: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef):
                funcs.setdefault(node.name, node)
            if isinstance(node, ast.Call) and _call_name(node) == "pallas_call":
                # module-level kernel entry: first positional arg — a bare
                # name or a functools.partial(name, ...) wrapper
                if node.args:
                    entries |= _name_refs(node.args[0])
        # any function that (transitively) leads to a pallas_call is a kernel
        # DRIVER: every name such a function references seeds the closure.
        # This catches kernels bound through local variables
        # (kernel = functools.partial(_fwd_kernel, ...) handed to a shared
        # _call helper) that a scan of the pallas_call arg alone would miss —
        # flash's and fused_co_block's kernels escaped the old scan this way.
        drivers = {
            name for name, fn in funcs.items()
            if any(isinstance(n, ast.Call) and _call_name(n) == "pallas_call"
                   for n in ast.walk(fn))
        }
        changed = True
        while changed:
            changed = False
            for name, fn in funcs.items():
                if name not in drivers and _name_refs(fn) & drivers:
                    drivers.add(name)
                    changed = True
        for name in drivers:
            entries |= _name_refs(funcs[name])
        modules.append((os.path.basename(path), funcs, entries))
    return modules


def _kernel_closure(modules):
    """Per-module transitive closure of functions reachable from that
    module's pallas_call entries (nested defs are part of their parent's
    subtree). Returns [(module, name, FunctionDef), ...]. A name referenced
    but not defined locally (a cross-module helper import) is resolved
    conservatively against EVERY module defining it."""
    by_name: dict[str, list] = {}
    for mod, funcs, _ in modules:
        for name, fn in funcs.items():
            by_name.setdefault(name, []).append((mod, fn))

    out = []
    for mod, funcs, entries in modules:
        seen: set[str] = set()
        todo = [e for e in entries if e in funcs or e in by_name]
        while todo:
            name = todo.pop()
            if name in seen:
                continue
            seen.add(name)
            resolved = ([(mod, funcs[name])] if name in funcs
                        else by_name.get(name, []))
            for src_mod, fn in resolved:
                out.append((mod if name in funcs else src_mod, name, fn))
                for ref in _name_refs(fn):
                    if (ref in funcs or ref in by_name) and ref not in seen:
                        todo.append(ref)
    return out


def test_pallas_call_entries_found():
    kernels = _kernel_closure(_load_modules())
    # every kernel module ships at least one pallas_call; the closure must
    # cover the known entry families or the scan below checks nothing.
    # Count distinct (module, name) pairs — the per-module scan must see a
    # kernel body in EVERY kernel module, shadowed names included.
    mods_with_kernels = {m for m, _, _ in kernels}
    assert len({(m, n) for m, n, _ in kernels}) >= 12, kernels
    assert len(mods_with_kernels) >= 7, mods_with_kernels


def test_in_kernel_dots_pin_accumulator_dtype():
    kernels = _kernel_closure(_load_modules())
    violations = []
    for mod, name, fn in sorted(kernels, key=lambda t: (t[0], t[1])):
        for node in ast.walk(fn):
            if not (isinstance(node, ast.Call)
                    and _call_name(node) in DOT_NAMES):
                continue
            kwargs = {k.arg for k in node.keywords}
            if "preferred_element_type" not in kwargs:
                violations.append(f"{mod}:{name}:{node.lineno} {_call_name(node)}")
    assert not violations, (
        "in-kernel dot without preferred_element_type (fails Mosaic "
        "lowering on TPU — 'Expected matmul acc to be 32-bit' — but "
        f"passes CPU interpret mode): {sorted(set(violations))}"
    )


def test_reference_twins_are_not_swept_in():
    """The exemption holds: the XLA twins stay OUT of the kernel closure
    (if one ever gets called from inside a kernel, that's a real bug —
    a twin traced under Mosaic would hit the same lowering wall)."""
    modules = _load_modules()
    kernel_names = {n for _, n, _ in _kernel_closure(modules)}
    twins = {n for _, funcs, _ in modules for n in funcs
             if n.endswith("_reference") or n.startswith("reference_")}
    assert twins, "expected XLA-twin oracles in the kernel modules"
    assert not (twins & kernel_names), twins & kernel_names


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
