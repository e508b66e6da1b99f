"""Flax BatchNorm module with switchable statistics core (ops/fused_bn).

Drop-in replacement for ``nn.BatchNorm`` inside ConvLayer (and the S2D
group variant): identical parameter/stat names and shapes (params
``scale``/``bias``, batch_stats ``mean``/``var``) so checkpoints and the
torch importer/exporter are oblivious, identical semantics (population
variance, momentum EMA, f32 statistics).  The batch statistics can run
either as plain reduces (what flax lowers to — measured fastest e2e on
chip, the default) or as MXU matmuls (ops/fused_bn.py; kept as the A/B
alternative bench.py times each round).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pacingpseudo_tpu.ops.fused_bn import (
    batch_norm_eval, batch_norm_train, batch_norm_train_reduce)

# Trace-time statistics implementation: "reduce" (plain jnp.mean
# reductions, autodiff — exactly what flax nn.BatchNorm lowers to; the
# default) or "matmul" (MXU products, custom VJP).  Identical numerics;
# kept switchable so bench.py can A/B the round-3 MXU-BN rework
# end-to-end.  The round-5 on-chip A/B (BENCH_r05 step_ms_by_bn_impl:
# reduce 69.21 ms vs matmul 71.22 ms at the flagship batch-12 step)
# measured the reduce path 2.8% FASTER e2e — current XLA fuses the
# channel-minor moment reductions well enough that the Gram products'
# extra structural FLOPs are a net loss — so the default flipped to
# "reduce" from data (VERDICT r4 item 1).  Settable via env
# PACING_BN_IMPL or set_bn_impl() BEFORE the train step is traced.
_BN_IMPL = None  # lazy: resolved from env on first use


def set_bn_impl(impl: str) -> None:
    global _BN_IMPL
    assert impl in ("matmul", "reduce"), impl
    _BN_IMPL = impl


def get_bn_impl() -> str:
    global _BN_IMPL
    if _BN_IMPL is None:
        import os
        _BN_IMPL = os.environ.get("PACING_BN_IMPL", "reduce")
        assert _BN_IMPL in ("matmul", "reduce"), _BN_IMPL
    return _BN_IMPL


class BNParamsOnly(nn.Module):
    """BatchNorm parameter/stat declarations WITHOUT a compute path.

    Declared under the same name ("norm") with identical param names,
    shapes and init draws as MatmulBatchNorm, so the fused Pallas
    ConvLayer (ops/pallas/fused_convbn.py) — which computes the statistics
    inside the conv kernel — shares checkpoints, the torch importer/
    exporter and the parity tests with the unfused path.  flax derives
    param init RNG from the scope path + name, so the draws are identical
    too.  ``__call__(m, v)`` applies the EMA update; ``affine()`` returns
    (scale, bias).
    """

    features: int  # logical channels
    momentum: float = 0.9

    def setup(self):
        f = self.features
        self.scale = self.param("scale", nn.initializers.ones, (f,),
                                jnp.float32)
        self.offset = self.param("bias", nn.initializers.zeros, (f,),
                                 jnp.float32)
        self.ra_mean = self.variable("batch_stats", "mean",
                                     lambda: jnp.zeros((f,), jnp.float32))
        self.ra_var = self.variable("batch_stats", "var",
                                    lambda: jnp.ones((f,), jnp.float32))

    def affine(self):
        return self.scale, self.offset

    def __call__(self, m, v):
        if not self.is_initializing():
            m = jax.lax.stop_gradient(m)
            v = jax.lax.stop_gradient(v)
            self.ra_mean.value = (self.momentum * self.ra_mean.value
                                  + (1 - self.momentum) * m)
            self.ra_var.value = (self.momentum * self.ra_var.value
                                 + (1 - self.momentum) * v)


class MatmulBatchNorm(nn.Module):
    """BatchNorm with matmul-shaped statistics.

    ``groups > 1`` selects the S2D extension: the input carries
    ``groups * C`` physical channels laid out ``g*C + i`` (jnp.tile), the
    statistics/params are per LOGICAL channel (C,).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    groups: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1] // self.groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            return batch_norm_eval(x, scale, bias, ra_mean.value, ra_var.value,
                                   self.epsilon, self.groups)
        train_fn = (batch_norm_train if get_bn_impl() == "matmul"
                    else batch_norm_train_reduce)
        y, m, v = train_fn(x, scale, bias, self.epsilon, self.groups)
        if not self.is_initializing():
            # EMA update outside the gradient (flax semantics); stop_gradient
            # honours batch_norm_train's zero-cotangent contract on (m, v).
            m = jax.lax.stop_gradient(m)
            v = jax.lax.stop_gradient(v)
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * m
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * v
        return y
