#!/usr/bin/env python3
"""Per-vreg op accounting for the wide (p>3) ME pipeline kernels.

The r4 open question (VERDICT weak #2): 371/233 fps at p=7/9 1080p —
inherent to the window growth, or headroom? The p=3 kernels have a
measured per-vreg issue-bound argument (docs/PERFORMANCE.md "Why ~3,500
fps..."); this tool extends the accounting to the wide windows so the
measured component times (tools/bench_wide_components.py) can be judged
against a model instead of a feeling.

Method: trace the EXACT jnp graph the fused detect tail runs
(fused.py::_tail_rows — the kernel calls the same function) at each p's
production strip geometry, then weight every jaxpr equation by its
output element count. Element-wise arithmetic maps 1:1 onto VPU vreg
ops; slices/concats of shifted planes map onto the lane/sublane rolls
Mosaic must issue for unaligned stencil operands (the r2 lesson: every
±shifted operand costs a roll on this ISA). Reductions count their
INPUT elements (a sublane-sum is a tree of vreg adds). The result is an
ops-per-element figure comparable ACROSS p at the same width — the
p=3 tail is the calibration anchor (0.086 ms/frame measured at 1080p,
the committed profiler-trace budget), so

    predicted_ms(p) = 0.086 * ops_per_elem(p)/ops_per_elem(3)
                            * halo_factor(p)/halo_factor(3)

is the issue-bound prediction for the wide tails. The same scaling with
the analytic lag count models the wide gram (2 ops/lag/elem + one lane
shift per distinct column lag) against its 0.062 ms/frame p=3 anchor.

Run (CPU is fine — it only traces):  python tools/roofline_wide.py
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from watermarking_gpu_tpu.ops.pallas.fused import (  # noqa: E402
    _tail_rows, pipeline_geometry)
from watermarking_gpu_tpu.ops.pallas import me_gram_wide  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.common import lane_padded  # noqa: E402

ROWS, COLS = 1080, 1920

# committed p=3 component anchors (ms/frame @1080p batch 8, profiler
# trace — docs/PERFORMANCE.md "Component budget at 0.288 ms/frame")
P3_TAIL_MS = 0.086
P3_GRAM_MS = 0.062

ARITH = {
    "add", "sub", "mul", "div", "abs", "max", "min", "neg", "sign",
    "integer_pow", "pow", "select_n", "lt", "le", "gt", "ge", "eq", "ne",
    "and", "or", "xor", "not", "convert_element_type", "floor", "ceil",
    "sqrt", "rsqrt", "exp", "log",
}
MOVE = {
    "slice", "dynamic_slice", "concatenate", "pad", "transpose", "rev",
    "gather", "squeeze", "reshape",
}
REDUCE = {"reduce_sum", "reduce_max", "reduce_min"}
FREE = {"broadcast_in_dim", "iota", "stop_gradient", "copy"}


def _count(jaxpr, scale: float):
    """ops-per-element by class for one jaxpr, outputs weighted by size."""
    out = defaultdict(float)
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                sub = _count(getattr(inner, "jaxpr", inner), scale)
                for k, v in sub.items():
                    out[k] += v
            continue
        if name in REDUCE:
            w = sum(int(np.prod(v.aval.shape)) for v in eqn.invars
                    if hasattr(v.aval, "shape"))
            out["arith"] += w * scale        # a reduction is a tree of adds
            continue
        w = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
                if hasattr(v.aval, "shape"))
        if name in ARITH:
            # scalar broadcasts are free on the VPU; only count vector work
            if w > 1:
                out["arith"] += w * scale
        elif name in MOVE:
            if w > 1:
                out["move"] += w * scale
        elif name in FREE:
            pass
        else:
            out[f"other:{name}"] += w * scale
    return out


def tail_ops(p: int, mask_type: str = "me"):
    """Trace the production tail at 1080p geometry; ops per CENTER elem."""
    pad, strip, rows_padded = pipeline_geometry(ROWS, COLS, mask_type, p)
    width = lane_padded(COLS)      # vregs tile lanes to 128
    k = (p * p - 1) if mask_type == "me" else 8
    ext = jnp.zeros((strip + 2 * pad, width + 2 * pad), jnp.float32)
    wm = jnp.zeros_like(ext)

    def run(ext, wm, coeffs_vec, row0):
        coeffs = [coeffs_vec[i] for i in range(k)]
        return _tail_rows(ext, wm, coeffs, 1, row0, pad=pad, strip=strip,
                          width=width, rows=ROWS, total_rows=ROWS,
                          mask_type=mask_type, p=p, masked=False)

    jaxpr = jax.make_jaxpr(run)(ext, wm, jnp.zeros((k,), jnp.float32),
                                jnp.int32(0))
    per_elem = _count(jaxpr.jaxpr, 1.0 / (strip * width))
    halo = (strip + 2 * (p // 2 if mask_type == "me" else 1)) / strip
    return per_elem, strip, halo


def field_ops(p: int, mask_type: str = "me"):
    """Trace the embed field's math (fused.py::_embed_field_core structure:
    _error_region + |e| + u = mask*wm + sum u^2 / max|e| partials)."""
    from watermarking_gpu_tpu.ops.pallas.fused import _error_region

    pad, strip, rows_padded = pipeline_geometry(ROWS, COLS, mask_type, p)
    width = lane_padded(COLS)
    k = p * p - 1
    ext = jnp.zeros((strip + 2 * pad, width + 2 * pad), jnp.float32)
    wm = jnp.zeros_like(ext)

    def run(ext, wm, coeffs_vec):
        coeffs = [coeffs_vec[i] for i in range(k)]
        err = _error_region(ext, coeffs, pad, strip, width, p)
        mask = jnp.abs(err)
        u_raw = mask * wm[pad:pad + strip, pad:pad + width]
        return (u_raw, jnp.sum(u_raw * u_raw, axis=0),
                jnp.max(jnp.abs(err), axis=0))

    jaxpr = jax.make_jaxpr(run)(ext, wm, jnp.zeros((k,), jnp.float32))
    per_elem = _count(jaxpr.jaxpr, 1.0 / (strip * width))
    return per_elem, strip


def gram_ops(p: int):
    """Analytic wide-gram model (me_gram_wide core structure): per lag one
    mul + one sublane-reduce add over the strip; one lane-shifted plane per
    distinct column lag (span rows live per shift)."""
    if p == 3:
        lags, shifts, pad = 13, 5, 4       # me_kernel.py's canonical lags
    else:
        h = p // 2
        lags = ((4 * h + 1) ** 2 + 1) // 2
        shifts = 4 * h + 1
        pad = me_gram_wide.wide_pad(p)
    if p > 3:
        strip, _ = me_gram_wide.wide_gram_geometry(ROWS, COLS, p)
    else:
        from watermarking_gpu_tpu.ops.pallas.common import \
            pick_strip_for_width
        strip, _ = pick_strip_for_width(ROWS, COLS, 130_000, pad)
        # 130k = me_gram_pallas's width-adaptive budget (me_kernel.py)
    span = strip + 2 * pad
    ops = 2 * lags + shifts * (span / strip)
    return ops, lags, strip


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mask", default="me")
    args = parser.parse_args()

    print(f"geometry: {ROWS}x{COLS}, mask={args.mask}; anchors: "
          f"p=3 tail {P3_TAIL_MS} ms/frame, gram {P3_GRAM_MS} ms/frame "
          f"(profiler trace, docs/PERFORMANCE.md)")
    base_total = None
    print("\n-- fused detect tail (traced from fused.py::_tail_rows) --")
    for p in (3, 5, 7, 9):
        per_elem, strip, halo = tail_ops(p, args.mask)
        arith = per_elem.get("arith", 0.0)
        move = per_elem.get("move", 0.0)
        other = {kk: round(v, 2) for kk, v in per_elem.items()
                 if kk not in ("arith", "move")}
        total = arith + move
        if p == 3:
            base_total = total * halo
        pred = P3_TAIL_MS * (total * halo) / base_total
        print(f"p={p}: strip={strip:3d} halo={halo:.3f} "
              f"arith={arith:7.1f} move={move:6.1f} ops/elem "
              f"(x{total / (base_total / halo if p == 3 else base_total * 1.0):.2f}) "
              f"-> issue-bound prediction {pred:6.3f} ms/frame"
              + (f"  other={other}" if other else ""))

    print("\n-- embed field (traced, _embed_field_core structure; "
          "p=3 anchor 0.044 ms/frame) --")
    base_f = None
    for p in (3, 5, 7, 9):
        per_elem, strip = field_ops(p, args.mask)
        total = per_elem.get("arith", 0.0) + per_elem.get("move", 0.0)
        if p == 3:
            base_f = total
        print(f"p={p}: strip={strip:3d} ops/elem={total:7.1f} "
              f"-> issue-bound prediction {0.044 * total / base_f:6.3f} "
              f"ms/frame")

    print("\n-- wide lag-Gram (analytic, me_gram_wide core structure) --")
    base_g = None
    for p in (3, 5, 7, 9):
        ops, lags, strip = gram_ops(p)
        if p == 3:
            base_g = ops
        pred = P3_GRAM_MS * ops / base_g
        print(f"p={p}: lags={lags:3d} strip={strip:3d} ops/elem={ops:7.1f} "
              f"-> issue-bound prediction {pred:6.3f} ms/frame")


if __name__ == "__main__":
    main()
