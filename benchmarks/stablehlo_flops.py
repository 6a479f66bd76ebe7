"""Analytic FLOP counter over lowered StableHLO text.

`jax.stages.Lowered.cost_analysis()` is unavailable on this backend and
`Compiled.cost_analysis()` costs a multi-minute XLA:CPU compile per config,
so we count matmul/conv FLOPs straight from `lowered.as_text()`:

* `stablehlo.dot_general`: 2 * prod(result shape) * prod(lhs contracting dims)
* `stablehlo.convolution`: 2 * prod(result shape) * prod(kernel shape) / O
  (per output element: spatial taps x input channels per group; grouped convs
  fall out of the division by the kernel 'o' dim)

matching XLA's HloCostAnalysis convention (2 FLOPs per MAC; while/cond bodies
counted once; elementwise ops ignored — they are noise next to the matmuls).
Verified against `Compiled.cost_analysis()['flops']` in
tests/test_mfu_accounting.py.
"""
from __future__ import annotations

import math
import re

_SHAPE = re.compile(r"tensor<([0-9x]*)x?[a-z][a-z0-9]*>")
_DOT = re.compile(
    r"stablehlo\.dot_general\s.*?contracting_dims\s*=\s*\[([0-9, ]*)\]\s*x\s*"
    r"\[[0-9, ]*\].*?:\s*\(([^)]*)\)\s*->\s*(tensor<[^>]*>)")
_CONV = re.compile(
    r"stablehlo\.convolution\(.*?\[([a-z0-9, ]*)\]->\[[a-z0-9, ]*\].*?"
    r":\s*\(([^)]*)\)\s*->\s*(tensor<[^>]*>)")


def _dims(tensor_type: str):
    m = _SHAPE.search(tensor_type)
    if m is None:          # scalar tensor<f32>
        return []
    return [int(d) for d in m.group(1).split("x") if d]


def _operand_types(args: str):
    return re.findall(r"tensor<[^>]*>", args)


def flops_of_lowered_text(text: str) -> float:
    total = 0.0
    for line in text.splitlines():
        if "stablehlo.dot_general" in line:
            m = _DOT.search(line)
            if not m:
                raise ValueError(f"unparsed dot_general: {line.strip()}")
            lhs_contract = [int(d) for d in m.group(1).split(",") if d.strip()]
            lhs = _dims(_operand_types(m.group(2))[0])
            out = _dims(m.group(3))
            k = math.prod(lhs[d] for d in lhs_contract)
            total += 2.0 * math.prod(out) * k
        elif "stablehlo.convolution" in line:
            m = _CONV.search(line)
            if not m:
                raise ValueError(f"unparsed convolution: {line.strip()}")
            kernel_spec = [s.strip() for s in m.group(1).split(",")]
            kernel = _dims(_operand_types(m.group(2))[1])
            out = _dims(m.group(3))
            o = kernel[kernel_spec.index("o")]
            total += 2.0 * math.prod(out) * math.prod(kernel) / o
    return total


def flops_of_lowered(lowered) -> float:
    return flops_of_lowered_text(lowered.as_text())
