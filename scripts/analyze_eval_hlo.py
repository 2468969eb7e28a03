"""Map the eval step's hot fusion names (from profile_eval.py) to HLO shapes.

Compiles the serving eval step, dumps the optimized HLO, and for every
convolution/dot fusion prints its operand/result shapes plus a roofline
estimate (compute-ideal vs memory-ideal at v5e peaks), so profile entries
like `%convolution_add_fusion.134 @ 0.652 ms` become attributable.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/analyze_eval_hlo.py [batch]
"""

from __future__ import annotations

import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12   # v5e MXU, FLOP/s
PEAK_F32 = PEAK_BF16 / 8
HBM_BW = 819e9       # bytes/s

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "s8": 1, "u32": 4, "pred": 1}


def shape_info(s: str):
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m:
        return None, 0, 0
    dt, dims = m.group(1), m.group(2)
    shape = [int(x) for x in dims.split(",")] if dims else []
    n = 1
    for d in shape:
        n *= d
    return shape, n, n * DTYPE_BYTES.get(dt, 4)


def main() -> int:
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_classification_tpu.config import facebook_vilbert_config
    from multimodal_classification_tpu.models.vilbert import (
        ViLBERTForClassification, dummy_batch)
    from multimodal_classification_tpu.training.train import make_eval_step, model_inputs

    cfg = facebook_vilbert_config()
    model = ViLBERTForClassification(cfg)
    batch = dummy_batch(cfg, bs, 128, 100)
    rng = np.random.default_rng(0)
    batch["visual_features"] = jnp.asarray(
        rng.standard_normal(batch["visual_features"].shape), jnp.bfloat16)
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), **batch)["params"])
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    step = jax.jit(make_eval_step(model))
    compiled = step.lower(params, model_inputs(batch)).compile()
    hlo = compiled.as_text()
    print(f"HLO: {len(hlo)} chars", file=sys.stderr)

    # global symbol table: instruction name -> "dtype[shape]"
    shapes_by_name = {}
    for m in re.finditer(r"%([\w.\-]+) = (\w+\[[\d,]*\])", hlo):
        shapes_by_name[m.group(1)] = m.group(2)
    # computation parameters declare shapes inline on first use:
    for m in re.finditer(r"(\w+\[[\d,]*\])\{[\d,]*\} %([\w.\-]+)", hlo):
        shapes_by_name.setdefault(m.group(2), m.group(1))

    # fusion ops: "%NAME = SHAPE fusion(OPERANDS), kind=..., calls=%COMP"
    fusion_calls = {}
    for m in re.finditer(
        r"%([\w.]*fusion[.\d]*) = (\w+\[[\d,]*\])\S* fusion\(([^)]*)\)[^\n]*calls=%([\w.\-]+)",
        hlo,
    ):
        fusion_calls[m.group(1)] = (m.group(2), m.group(3), m.group(4))

    # computation bodies (brace-matched)
    comp_bodies = {}
    for m in re.finditer(r"%([\w.\-]+) \([^{]*\{", hlo):
        name = m.group(1)
        start = m.end()
        depth, i = 1, start
        while depth and i < len(hlo):
            depth += (hlo[i] == "{") - (hlo[i] == "}")
            i += 1
        comp_bodies[name] = hlo[start:i]

    def lookup(tok: str):
        tok = tok.strip()
        m = re.match(r"(\w+\[[\d,]*\])\S*\s+%([\w.\-]+)", tok)
        if m:
            return m.group(1)
        m = re.match(r"%([\w.\-]+)", tok)
        return shapes_by_name.get(m.group(1)) if m else None

    rows = []
    for fname, (result_shape, operands, called) in fusion_calls.items():
        body = comp_bodies.get(called, "")
        dot_lines = re.findall(
            r"%[\w.\-]+ = \w+\[[\d,]*\]\S* (?:dot|convolution)\(([^)]*)\)", body)
        dot_outs = re.findall(
            r"%[\w.\-]+ = (\w+\[[\d,]*\])\S* (?:dot|convolution)\(", body)
        if not dot_lines:
            continue
        op_shapes = [s for s in (lookup(t) for t in operands.split(","))
                     if s is not None]
        io_bytes = sum(shape_info(s)[2] for s in op_shapes)
        io_bytes += shape_info(result_shape)[2]
        flops = 0
        detail = []
        a_dtype = "bf16"
        for args, out_s in zip(dot_lines, dot_outs):
            toks = args.split(",")
            a_s = lookup(toks[0]) if toks else None
            b_s = lookup(toks[1]) if len(toks) > 1 else None
            so, no, _ = shape_info(out_s)
            detail.append(f"{a_s}x{b_s}->{out_s}")
            if a_s:
                a_dtype = a_s.split("[")[0]
            if so and a_s:
                sa, na, _ = shape_info(a_s)
                n_dim = so[-1] if so else 1
                m_dim = no // max(n_dim, 1)
                k = na // max(m_dim, 1) if na % max(m_dim, 1) == 0 else sa[-1]
                flops += 2 * no * k
        t_c = flops / (PEAK_F32 if a_dtype == "f32" else PEAK_BF16)
        t_m = io_bytes / HBM_BW
        rows.append((fname, flops / 1e9, io_bytes / 1e6,
                     max(t_c, t_m) * 1e6, detail[:2]))

    rows.sort(key=lambda r: -r[3])
    print(f"{'fusion':<34} {'GFLOP':>7} {'MB':>7} {'ideal_us':>9}  shapes")
    for fname, gf, mb, ideal, detail in rows[:40]:
        print(f"%{fname:<33} {gf:7.2f} {mb:7.1f} {ideal:9.1f}  {'; '.join(detail)}")
    total_ideal = sum(r[3] for r in rows) / 1e3
    print(f"\n{len(rows)} dot-bearing fusions; sum of per-op ideals = {total_ideal:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
