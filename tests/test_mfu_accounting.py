"""The StableHLO FLOP counter behind benchmarks/mfu.py.

Matmul counts must agree exactly with XLA's own HloCostAnalysis; convolution
counts must equal the textbook 2 x output x (kernel_spatial x Cin/groups)
(XLA's *optimized*-HLO conv counts differ by backend rewrite artifacts, so
convs are pinned against the hand formula instead).
"""
import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from stablehlo_flops import flops_of_lowered  # noqa: E402


def _xla_flops(lowered):
    cost = lowered.cost_analysis()
    if cost is None:
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


@pytest.mark.parametrize("shapes", [
    ((128, 256), (256, 512)),
    ((7, 96), (96, 33)),
])
def test_dot_matches_xla(shapes):
    a = jnp.zeros(shapes[0])
    b = jnp.zeros(shapes[1])
    low = jax.jit(lambda a, b: a @ b).lower(a, b)
    assert flops_of_lowered(low) == _xla_flops(low)


def test_batched_einsum_matches_xla():
    a = jnp.zeros((4, 64, 96))
    b = jnp.zeros((4, 96, 32))
    low = jax.jit(lambda a, b: jnp.einsum("bij,bjk->bik", a, b)).lower(a, b)
    assert flops_of_lowered(low) == _xla_flops(low)


@pytest.mark.parametrize("groups,strides,padding,out_hw", [
    (1, (1, 1), "VALID", (30, 30)),
    (1, (2, 2), "SAME", (16, 16)),
    (4, (1, 1), "SAME", (32, 32)),
])
def test_conv_textbook_formula(groups, strides, padding, out_hw):
    import flax.linen as nn
    cin, cout = 8, 24 if groups == 1 else 16
    conv = nn.Conv(cout, (3, 3), strides=strides, padding=padding,
                   feature_group_count=groups)
    x = jnp.zeros((2, 32, 32, cin))
    v = conv.init(jax.random.PRNGKey(0), x)
    low = jax.jit(lambda v, x: conv.apply(v, x)).lower(v, x)
    oh, ow = out_hw
    expect = 2 * (2 * oh * ow * cout) * (3 * 3 * cin // groups)
    assert flops_of_lowered(low) == expect


def test_mixed_graph_counts_both():
    import flax.linen as nn
    conv = nn.Conv(16, (1, 1))
    x = jnp.zeros((1, 8, 8, 4))
    v = conv.init(jax.random.PRNGKey(0), x)

    def f(v, x, w):
        y = conv.apply(v, x)                      # 2*64*16*4 = 8192
        return y.reshape(64, 16) @ w              # 2*64*16*32 = 65536

    low = jax.jit(f).lower(v, x, jnp.zeros((16, 32)))
    assert flops_of_lowered(low) == 8192 + 65536
