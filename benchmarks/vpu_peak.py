#!/usr/bin/env python
"""Measured VPU peak: a pure-FMA Pallas microbenchmark.

The sweep kernel (ops/pallas_sweep.py) is elementwise f32 work on the VPU —
its roofline ceiling is the device's sustained f32 FMA rate, which this
script MEASURES instead of assuming (matching the evidence standard of the
reference's solver microbenchmark, reference/solve3x3.cpp:5-13).

Methodology (each step was forced by a measured failure mode of the naive
version; see PERF.md "measured VPU roofline"):

* K=16 independent one-vreg ([8,128] f32) logistic chains ``x <- a - x*x``
  (one FMA per element): enough ILP to hide the ~6-cycle FMA latency
  (measured: K=1 -> 0.34 TF/s, K=4 -> 1.4, K=16 -> 3.75, K=32+ regresses on
  register spill), all operands register-resident (wide arrays go
  VMEM-bandwidth-bound instead), non-affine recurrence (not foldable).
* SLOPE timing: t(N_big) - t(N_small) between two loop lengths of the same
  kernel removes the fixed per-dispatch cost — through this image's TPU
  tunnel a single dispatch+fetch costs ~23 ms, which drowned every
  fixed-size variant.
* each timed dispatch gets a FRESH input and fetches its result: identical
  repeated dispatches returned physically impossible rates (up to
  1400 TF/s), i.e. they were deduplicated/pipelined somewhere in the
  dispatch path rather than re-executed.

Result on this chip (TPU v5e, 1 core): ~3.7 TFLOP/s sustained f32 FMA.
bench.py uses `measure_vpu_peak()` to report the sweep stage's MFU.
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8          # one f32 vreg per chain
LANES = 128
K_CHAINS = 16     # measured ILP sweet spot (latency hidden, no spill)
N_SMALL = 65536
N_BIG = 2097152


def _make_kernel(n_iter: int):
    def kernel(a_ref, out_ref):
        a = a_ref[:]
        xs = tuple(a * (0.1 + 0.05 * i) for i in range(K_CHAINS))

        def body(_, xs):
            return tuple(a - x * x for x in xs)

        xs = jax.lax.fori_loop(0, n_iter, body, xs)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        out_ref[:] = acc

    @jax.jit
    def call(a):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * K_CHAINS * n_iter * ROWS * LANES,
                bytes_accessed=2 * ROWS * LANES * 4,
                transcendentals=0,
            ),
        )(a)

    return call


def _median_single_dispatch_time(fn, reps: int, rng) -> float:
    ts = []
    for _ in range(reps):
        a = jnp.asarray(0.5 + 0.2 * rng.random((ROWS, LANES)).astype(np.float32))
        t0 = time.perf_counter()
        np.asarray(fn(a))  # fetch forces completion
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_vpu_peak(timing_iters: int = 5,
                     interpret: bool | None = None) -> float:
    """Sustained f32 FMA rate in FLOP/s on the default device (slope method).

    On non-TPU backends returns a slope over tiny loop lengths purely so the
    code path stays testable; the number is only meaningful on hardware.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    n_small, n_big = (8, 64) if interpret else (N_SMALL, N_BIG)
    f_small, f_big = _make_kernel(n_small), _make_kernel(n_big)
    zero = jnp.zeros((ROWS, LANES), jnp.float32)
    np.asarray(f_small(zero))  # compile
    np.asarray(f_big(zero))
    rng = np.random.default_rng(0)
    t1 = _median_single_dispatch_time(f_small, timing_iters, rng)
    t2 = _median_single_dispatch_time(f_big, timing_iters, rng)
    flops = 2 * K_CHAINS * (n_big - n_small) * ROWS * LANES
    return flops / max(t2 - t1, 1e-9)


if __name__ == "__main__":
    peak = measure_vpu_peak()
    print(json.dumps({
        "metric": "measured VPU f32 FMA sustained peak",
        "value": round(peak / 1e12, 3),
        "unit": "TFLOP/s",
        "device": jax.devices()[0].device_kind,
    }))
