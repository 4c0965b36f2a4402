"""Pallas W4A16(-g) decode matmul: stream packed int4 weights ONCE.

MEASURED OUTCOME (v5e, 2026-08-19 — why this is OPT-IN, not the
default): the single stream buys nothing.  Stacked-matmul microbench at
rows=40: pallas 34.6 ms vs XLA two-plane 34.7 (tie), int4g pallas 52.7
vs XLA 34.3 (loss); B=32 serving point: kernel 1008.5 tok/s vs XLA
1069.6 (-6%).  The decode matmul is VPU-UNPACK-bound at serving M, not
HBM-bound — the int32 shift/convert arithmetic per packed byte costs
more than the DMA it saves, and Mosaic rejects int8-native shifts
(remote-compile HTTP 500), so the widening round-trip is a floor.  The
kernel, its tests, and this analysis are kept as the measured record
(BENCH_NOTES round-4 "int4 single-stream kernel"); enable with
OSPO_INT4_KERNEL=1.

The original motivation (still true, just not worth it here):

- The XLA two-plane formulation (``ops/quant.quantized_matmul_int4``)
  runs one einsum per nibble plane, and each einsum streams the packed
  byte array from HBM — so the int4 representation's weight traffic
  equals int8's (measured: int4-packed B=20 857.9 tok/s vs int8 923.0;
  the B=32 capacity win is real but the stream halving is not).
- The group-scaled variant (``quantized_matmul_int4_group``) contracts
  with the group axis as a dot BATCH dim, materialising a ``[B, T, F, G]``
  f32 intermediate per projection that pushed the B=32 decode program to
  18.59 GB AOT (round-3/4 campaigns: ``image_int4g_b32`` failed on a
  15.75 GB chip both times).

This kernel fixes both: each packed byte block is DMA'd into VMEM once,
both nibble planes are unpacked and (for the group variant) scaled
in-VMEM into bf16 weight tiles, and one MXU dot per plane produces the
output block.  HBM weight traffic is the true 0.5 byte/weight + scales,
and the only intermediates are VMEM tiles.

Decode shapes only (T == 1, M = CFG-pair rows ≤ a few hundred): the
activation block rides whole in VMEM and the grid walks output tiles, so
the weight matrix streams exactly once per call.  Prefill (T > 1) stays
on the XLA paths — it is MXU-bound, where the two-plane einsum is fine.

Numerics: the per-row variant applies scales OUTSIDE the kernel in the
caller's dtype, exactly like the XLA path.  The group variant scales the
bf16 weight tile in-VMEM (w = q·gs rounded to bf16, then an f32-
accumulated dot) where the XLA path scales f32 group partial sums — a
~2⁻⁹ relative weight perturbation, negligible against int4's own ~2⁻⁴
step (pinned in tests/test_int4_matmul.py against the XLA formulation).

Replaces the reference's cuBLAS int4 path role (the reference has none —
torch fp16 eager, ospo/wrapper/image_generation.py:110-191); this is the
TPU-native design for the same serving-capacity goal.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TF2 = 128  # output-halves tile: divides every production F/2 (gcd 128)


def _unpack(q):
    """Packed bytes → (low, high) signed nibble planes (int32 math: the
    arithmetic-shift sign extension; matches quant.unpack_int4_halves).
    int8-NATIVE shifts crash the Mosaic compiler on this backend
    (HTTP 500 from the remote compile helper, 2026-08-19) — the int32
    widening round-trip is required."""
    q = q.astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(q, 28), 28)
    high = jnp.right_shift(jnp.left_shift(q, 24), 28)
    return low, high


def _row_kernel(x_ref, q4_ref, yl_ref, yh_ref):
    low, high = _unpack(q4_ref[:])
    x = x_ref[:]
    for nib, out in ((low, yl_ref), (high, yh_ref)):
        y = jax.lax.dot_general(
            x, nib.astype(x.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out[:] = y.astype(out.dtype)


def _group_kernel(x_ref, q4_ref, gsl_ref, gsh_ref, yl_ref, yh_ref):
    low, high = _unpack(q4_ref[:])
    x = x_ref[:]
    tf2, d = q4_ref.shape
    g = gsl_ref.shape[-1]
    for nib, gs_ref, out in ((low, gsl_ref, yl_ref),
                             (high, gsh_ref, yh_ref)):
        w = nib.astype(x.dtype).reshape(tf2, g, d // g)
        w = (w * gs_ref[:][:, :, None].astype(x.dtype)).reshape(tf2, d)
        y = jax.lax.dot_general(
            x, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out[:] = y.astype(out.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_row(x2, q4, *, interpret=False):
    m, d = x2.shape
    f2 = q4.shape[0]
    nf = f2 // _TF2
    return pl.pallas_call(
        _row_kernel,
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TF2, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m, _TF2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, _TF2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, f2), x2.dtype)] * 2,
        interpret=interpret,
    )(x2, q4)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_group(x2, q4, gs, *, interpret=False):
    m, d = x2.shape
    f2 = q4.shape[0]
    g = gs.shape[-1]
    nf = f2 // _TF2
    return pl.pallas_call(
        _group_kernel,
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TF2, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # the SAME [F, G] scale array feeds both specs: block row i
            # scales the low plane, block row i + nf (= row F/2 + i·TF2)
            # the high plane — no sliced copy of the scales per call
            pl.BlockSpec((_TF2, g), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TF2, g), lambda i, _nf=nf: (i + _nf, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m, _TF2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, _TF2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, f2), x2.dtype)] * 2,
        interpret=interpret,
    )(x2, q4, gs, gs)


def supported(x: jax.Array, qw: Dict[str, jax.Array]) -> bool:
    """Decode-shape eligibility: T == 1, 2-D weight, 128-divisible
    output halves (every production projection qualifies)."""
    return (x.ndim == 3 and x.shape[1] == 1 and qw["q4"].ndim == 2
            and qw["q4"].shape[0] % _TF2 == 0)


def int4_matmul_decode(x: jax.Array, qw: Dict[str, jax.Array],
                       interpret: bool = False) -> jax.Array:
    """y = x @ Wᵀ for T = 1 with W packed int4 ({"q4", "s"} per-row or
    {"q4", "gs"} group-wise) — single-stream Pallas path.  Callers must
    check :func:`supported` first."""
    x2 = x[:, 0, :]
    f2 = qw["q4"].shape[0]
    if "gs" in qw:
        yl, yh = _call_group(x2, qw["q4"], qw["gs"], interpret=interpret)
        y = jnp.concatenate([yl, yh], axis=-1)
    else:
        yl, yh = _call_row(x2, qw["q4"], interpret=interpret)
        s = qw["s"].astype(x.dtype)
        y = jnp.concatenate([yl * s[:f2], yh * s[f2:]], axis=-1)
    return y[:, None, :]
