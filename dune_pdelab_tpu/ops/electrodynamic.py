"""Curl-curl operator on H(curl) edge-element spaces.

TPU-native analog of the reference kernel (reference:
dune/pdelab/localoperator/electrodynamic.hh, 257 LoC — the curl-curl form
used with Nedelec elements): the E-field / eddy-current bilinear form

    a(u, v) = ∫ nu (∇×u)·(∇×v) + beta u·v dx,   rhs ∫ f·v dx

with essential n×u constraints on boundary edges.
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from dune_pdelab_tpu.ops.base import LocalOperator, VolumeContext


class CurlCurlParameters:
    time = 0.0

    def __init__(self, nu=1.0, beta=1.0):
        self.nu = nu
        self.beta = beta

    def f(self, x):
        """Vector source (..., dim)."""
        return jnp.zeros_like(x)

    def with_time(self, t):
        p = copy.copy(self)
        p.time = t
        return p


class CurlCurl(LocalOperator):
    is_linear = True
    quadrature_factor = 2

    def __init__(self, params: CurlCurlParameters):
        self.params = params

    def set_time(self, t):
        new = copy.copy(self)
        new.params = self.params.with_time(t)
        return new

    def alpha_volume(self, ctx: VolumeContext, u):
        tab = ctx.tab
        p = self.params
        cu = self.curl_at_qp(tab, u)
        r = self.accumulate_curl(tab, ctx.factor, p.nu * cu)
        if p.beta != 0.0:
            uq = self.hdiv_value_at_qp(tab, u)   # same vec_phi contraction
            r = r + self.accumulate_hdiv(tab, ctx.factor, p.beta * uq)
        return r

    def lambda_volume(self, ctx: VolumeContext):
        tab = ctx.tab
        f = jnp.broadcast_to(
            jnp.asarray(self.params.f(ctx.x), ctx.factor.dtype), ctx.x.shape)
        return -self.accumulate_hdiv(tab, ctx.factor, f)
