"""Weight-only int8 quantization (W8A16) for the decode path.

The 7B CFG decode is HBM-bandwidth-bound on weight reads (~11.4GB/step in
bf16).  Per-output-channel symmetric int8 halves that traffic and HBM
footprint — XLA fuses the ``int8 → bf16`` convert into the matmul read, so
no dequantized copy is materialised.

Representation: a quantized matrix is a dict ``{"q": int8 [..., F, D],
"s": f32 [..., F]}`` (row scales over the *output* dim, matching the
torch-layout [out, in] convention).  ``llama._maybe_lora`` consumes either
a plain array or this dict, so quantized and bf16 weights share one
forward implementation (and the stacked-layer scan just works).

Enable via ``quantize: int8`` in step configs / ``OSPO_BENCH_QUANT=int8``.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANTIZABLE = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def parse_kv_quant(value):
    """Normalize a config ``kv_quant`` spelling to False | "int8" | "int4".

    None/False/""/"false"/"none"/"0"/"off" → False (bf16 cache);
    True/"true"/"1"/"on" → "int8"; "int8"/"int4" pass through.  Anything
    else raises: the shipped batch sizes are tuned for a quantized cache,
    so a silent bf16 fallback on a typo would 2–4× the planned KV HBM
    (OOM or an unexplained serving-point change) instead of an error.
    """
    if value is None or value is False:
        return False
    if value is True:
        return "int8"
    s = str(value).strip().lower()
    if s in ("", "false", "none", "0", "off", "bf16"):
        return False  # "bf16" = the unquantized cache, documented spelling
    if s in ("true", "1", "on"):
        return "int8"
    if s in ("int8", "int4"):
        return s
    raise ValueError(
        f"unrecognized kv_quant value {value!r}: use int8, int4, "
        "true (= int8), or false/unset (bf16 cache)")


def quantize_matrix(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., F, D] → {q: int8, s: f32 [..., F]} per-output-row symmetric.

    Arithmetic stays in the input dtype (bf16) except the per-row scale —
    a full fp32 copy of a stacked 7B matrix would be a multi-GB HBM temp.
    """
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(
        jnp.round(w / s[..., None].astype(w.dtype)), -127, 127
    ).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_matrix(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (qw["q"].astype(jnp.float32) * qw["s"][..., None]).astype(dtype)


def quantized_matmul(x: jax.Array, qw: Dict[str, jax.Array]) -> jax.Array:
    """y = x @ Wᵀ with W stored int8: einsum over int8 (converted in-read),
    then the per-row scale."""
    y = jnp.einsum("btd,fd->btf", x, qw["q"].astype(x.dtype))
    return y * qw["s"].astype(x.dtype)


def quantize_matrix_w8a8(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., F, D] → {"q": int8, "sa": f32 [..., F]} — the SAME payload as
    :func:`quantize_matrix` (per-output-row symmetric int8), but the scale
    key ``"sa"`` routes the matmul dispatch to the ACTIVATION-QUANTIZED
    path (:func:`quantized_matmul_w8a8`): dynamic per-token int8
    activations and an int8×int8 dot with int32 accumulation.

    Motivation: v5e's MXU runs int8×int8 at 2× the bf16 FLOP rate
    (394 INT8 TOPS vs 197 bf16 TFLOPS), so compute-bound LARGE-M matmuls
    (scoring prefill: M ≈ rows×tokens ≈ 10k, measured 45% of bf16 peak —
    BENCH_NOTES "Cross-item batched scoring") have ~2× arithmetic
    headroom that W8A16's convert-into-read cannot reach.  The earlier
    finding that int8 dots LOSE applies only to M=1 decode shapes, where
    XLA never routes them to the MXU (BENCH_NOTES "Decode-attention
    arithmetic bench"); this mode is for prefill-bound stages (step 4b),
    not the HBM-bound decode loop.

    Quality: per-token dynamic activation scales on top of the qualified
    per-row int8 weights — the standard W8A8 serving recipe.  Gate with
    ``scripts/validate_weights.py --quantize w8a8`` before production use
    on real checkpoints (activation outliers in real 7B residual streams
    are the known risk; random-weight activations are well-behaved).
    """
    out = quantize_matrix(w)
    return {"q": out["q"], "sa": out["s"]}


def quantize_activations_int8(x: jax.Array):
    """[..., D] → (int8 values, f32 per-row scales [..., 1]) — symmetric
    per-token (row) abs-max quantization, computed in f32 and fused by XLA
    into the surrounding program (one VPU reduce + scale per row)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _w8a8_raw(x: jax.Array, q: jax.Array, sa: jax.Array) -> jax.Array:
    xq, sx = quantize_activations_int8(x)
    y = jnp.einsum("btd,fd->btf", xq, q,
                   preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sa).astype(x.dtype)


@jax.custom_vjp
def _w8a8_matmul(x: jax.Array, q: jax.Array, sa: jax.Array) -> jax.Array:
    return _w8a8_raw(x, q, sa)


def _w8a8_matmul_fwd(x, q, sa):
    return _w8a8_raw(x, q, sa), (q, sa)


def _w8a8_matmul_bwd(res, g):
    # Straight-through estimator: differentiate as if the forward were
    # the DEQUANTIZED matmul x @ (q·sa)ᵀ — without this, jnp.round's
    # zero gradient would silently kill every activation gradient
    # flowing through a w8a8 trunk (QLoRA training: LoRA layers below
    # the first w8a8 matmul would never learn).  The weight operands are
    # frozen serving constants, so their cotangents are symbolic zeros.
    import numpy as np

    q, sa = res
    gf = (g.astype(jnp.float32) * sa).astype(jnp.bfloat16)
    dx = jnp.einsum("btf,fd->btd", gf, q.astype(jnp.bfloat16))
    return (dx.astype(g.dtype), np.zeros(q.shape, jax.dtypes.float0),
            jnp.zeros_like(sa))


_w8a8_matmul.defvjp(_w8a8_matmul_fwd, _w8a8_matmul_bwd)


def quantized_matmul_w8a8(x: jax.Array, qw: Dict[str, jax.Array]) -> jax.Array:
    """y = x @ Wᵀ with BOTH sides int8: dynamic per-token activation
    quantization, int8×int8 contraction accumulated in int32 (the MXU's
    native int8 path), then the rank-1 scale correction
    ``sx[row] · sa[col]`` applied in f32.

    Differentiable w.r.t. ``x`` via a straight-through estimator (the
    dequantized-weight backward, run in bf16) so a w8a8 frozen trunk can
    serve QLoRA training (``experiment.quantize_base: w8a8``)."""
    return _w8a8_matmul(x, qw["q"], qw["sa"])


def dequantize_matrix_w8a8(qw: Dict[str, jax.Array],
                           dtype=jnp.bfloat16) -> jax.Array:
    return (qw["q"].astype(jnp.float32) * qw["sa"][..., None]).astype(dtype)


# --------------------------------------------------------------------------
# trace-time W8A16 override for w8a8 weights
# --------------------------------------------------------------------------
# A {"q","sa"} matrix is the SAME int8 payload as weight-only int8 — only
# the matmul epilogue differs (dynamic activation quantization vs a bf16
# einsum).  Inside this context, the llama matmul dispatch routes "sa"
# weights through the WEIGHT-ONLY path, so a single program can run its
# prefill in w8a8 (2× MXU int8 rate where it's compute-bound) and a
# noise-sensitive phase — e.g. the scoring suffix passes feeding the
# yes/no readout, which failed the r4 pair-agreement gate under full
# w8a8 — in W8A16.  The flag is read at TRACE time (plain Python during
# jit tracing), so the choice is baked statically into the program.
_W8A16_OVERRIDE = False


@contextlib.contextmanager
def w8a16_override():
    global _W8A16_OVERRIDE
    prev = _W8A16_OVERRIDE
    _W8A16_OVERRIDE = True
    try:
        yield
    finally:
        _W8A16_OVERRIDE = prev


def w8a16_active() -> bool:
    return _W8A16_OVERRIDE


def quantized_matmul_w8a16(x: jax.Array, qw: Dict[str, jax.Array]) -> jax.Array:
    """Weight-only matmul over a w8a8 payload: y = (x @ qᵀ) · sa — no
    activation quantization, bf16 contraction."""
    y = jnp.einsum("btd,fd->btf", x, qw["q"].astype(x.dtype))
    return y * qw["sa"].astype(x.dtype)


def quantize_matrix_int4(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., F, D] → {"q4": int8 [..., F/2, D], "s": f32 [..., F]}.

    15-level symmetric per-output-row int4 (W4A16), TWO OUTPUT ROWS
    packed per byte (row r in the low nibble, row r + F/2 in the high) —
    the same major-axis packing as the int4 KV cache
    (llama._quantize_rows_int4): the 128-lane minor dim stays untouched
    so the byte halving is real, and dequant (shift sign-extend + row
    scale) fuses into the matmul reads.  Halves the decode loop's weight
    stream vs int8 (3.3 GB/step at 7B)."""
    f = w.shape[-2]
    assert f % 2 == 0, f"int4 weight packing needs an even out dim, got {f}"
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1) / 7.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(
        jnp.round(w / s[..., None].astype(w.dtype)), -7, 7
    ).astype(jnp.int8)
    low = q[..., : f // 2, :]
    high = q[..., f // 2 :, :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(low, jnp.int8(0x0F)), jnp.left_shift(high, 4)
    ).astype(jnp.int8)
    return {"q4": packed, "s": s}


def unpack_int4_halves(q4: jax.Array):
    """Packed bytes → (low, high) signed int8 nibble planes (arithmetic
    shift sign-extension; two's-complement wrap of the left shift is the
    packing inverse)."""
    low = jnp.right_shift(jnp.left_shift(q4, 4), 4)
    high = jnp.right_shift(q4, 4)
    return low, high


def dequantize_matrix_int4(qw: Dict[str, jax.Array],
                           dtype=jnp.bfloat16) -> jax.Array:
    low, high = unpack_int4_halves(qw["q4"])
    w = jnp.concatenate([low, high], axis=-2).astype(jnp.float32)
    return (w * qw["s"][..., None]).astype(dtype)


def quantized_matmul_int4(x: jax.Array, qw: Dict[str, jax.Array]) -> jax.Array:
    """y = x @ Wᵀ with W stored packed int4: one einsum per nibble plane
    against the matching output half, rejoined on the feature axis."""
    low, high = unpack_int4_halves(qw["q4"])
    f2 = qw["q4"].shape[-2]
    y_low = jnp.einsum("btd,fd->btf", x, low.astype(x.dtype))
    y_high = jnp.einsum("btd,fd->btf", x, high.astype(x.dtype))
    return jnp.concatenate(
        [y_low * qw["s"][..., :f2].astype(x.dtype),
         y_high * qw["s"][..., f2:].astype(x.dtype)], axis=-1)


INT4_GROUP = 128  # AWQ/GPTQ-standard group size along the input dim


def quantize_matrix_int4_group(w: jax.Array,
                               group: int = INT4_GROUP) -> Dict[str, jax.Array]:
    """[..., F, D] → {"q4": int8 [..., F/2, D], "gs": f32 [..., F, D/group]}.

    GROUP-WISE 15-level int4 (W4A16-g128): one scale per ``group``
    contiguous INPUT columns of each output row, the standard fix for
    per-row int4's range problem (a single outlier column blows up the
    whole row's step size — the per-row variant measured 16.5 mean KL on
    the 7B gate vs int8's 0.24, BENCH_NOTES "weight-quantization gate").
    Same two-output-rows-per-byte packing as :func:`quantize_matrix_int4`
    (row r low nibble, row r+F/2 high), so the byte halving and the HBM
    story are identical; the scales add D/group·4 bytes per row (~6% at
    g=128) and the key "gs" (vs "s") routes the matmul dispatch.

    Arithmetic stays in the input dtype except the scales (the abs-max
    reduce fuses — no materialised fp32 copy of a stacked 7B matrix).
    ``group`` clamps to D for tiny test matrices (must then divide D).
    """
    *lead, f, d = w.shape
    group = min(group, d)
    assert f % 2 == 0, f"int4 weight packing needs an even out dim, got {f}"
    assert d % group == 0, f"group {group} must divide the in dim {d}"
    wg = w.reshape(*lead, f, d // group, group)
    s = jnp.max(jnp.abs(wg.astype(jnp.float32)), axis=-1) / 7.0
    s = jnp.maximum(s, 1e-12)                       # [..., F, D/group]
    q = jnp.clip(
        jnp.round(wg / s[..., None].astype(w.dtype)), -7, 7
    ).astype(jnp.int8).reshape(*lead, f, d)
    low = q[..., : f // 2, :]
    high = q[..., f // 2 :, :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(low, jnp.int8(0x0F)), jnp.left_shift(high, 4)
    ).astype(jnp.int8)
    return {"q4": packed, "gs": s}


def dequantize_matrix_int4_group(qw: Dict[str, jax.Array],
                                 dtype=jnp.bfloat16) -> jax.Array:
    low, high = unpack_int4_halves(qw["q4"])
    q = jnp.concatenate([low, high], axis=-2).astype(jnp.float32)
    *lead, f, d = q.shape
    g = qw["gs"].shape[-1]
    q = q.reshape(*lead, f, g, d // g) * qw["gs"][..., None]
    return q.reshape(*lead, f, d).astype(dtype)


def quantized_matmul_int4_group(x: jax.Array,
                                qw: Dict[str, jax.Array]) -> jax.Array:
    """y = x @ Wᵀ with group-scaled packed int4: per nibble plane, a
    G-batched einsum over the group-split input dim, then the [F, G]
    scales applied per group and reduced over G in f32 (the scale sits
    INSIDE the contraction, so it cannot ride the output like the
    per-row representations' ``y * s``).  The [B, T, F, G] intermediate
    stays a fusion temp at decode shapes (T = 1)."""
    low, high = unpack_int4_halves(qw["q4"])
    gs = qw["gs"]                                    # [..., F, G]
    f2, d = qw["q4"].shape[-2:]
    g = gs.shape[-1]
    b, t, _ = x.shape
    xg = x.reshape(b, t, g, d // g)

    def plane(p, s):
        y = jnp.einsum("btgc,fgc->btfg", xg,
                       p.reshape(f2, g, d // g).astype(x.dtype))
        return (y.astype(jnp.float32) * s.astype(jnp.float32)).sum(-1)

    return jnp.concatenate(
        [plane(low, gs[..., :f2, :]), plane(high, gs[..., f2:, :])],
        axis=-1).astype(x.dtype)


def quantize_matrix_int4_native(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., F, D] → {"q": s4, "s": f32 [..., F]} — native ``jnp.int4``
    storage (0.5 byte/weight in HBM) with the SAME dict contract as the
    int8 representation, so the single-einsum matmul path, sharding
    specs, and LoRA dispatch apply verbatim (llama._maybe_lora int8
    branch: convert fused into the dot read).

    This is the fix for the packed two-plane representation's hidden
    cost: its two einsums each stream the packed array, so HBM traffic
    equals int8 (measured: int4-packed B=20 857.9 tok/s vs int8 923.0).
    One dot over s4 storage halves the actual stream — when the backend
    lowers s4 (guarded in quantize_llama_params)."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1) / 7.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(
        jnp.round(w / s[..., None].astype(w.dtype)), -7, 7
    ).astype(jnp.int4)
    return {"q": q, "s": s}


_QUANT_FNS = {
    "int8": quantize_matrix,
    "w8a8": quantize_matrix_w8a8,
    "int4": quantize_matrix_int4,
    "int4g": quantize_matrix_int4_group,
    "int4n": quantize_matrix_int4_native,
}

_S4_OK = None


def _assert_s4_supported():
    """``quantize: int4n`` needs a backend that accepts ``jnp.int4`` jit
    arguments; the tunneled v5e backend trips a RecursionError inside
    jax's s4 handling (scripts/int4_matmul_bench.py, BENCH_NOTES "int4
    weight-representation microbench").  Probe once and fail with a
    clear message instead of an opaque crash deep inside the first
    decode jit."""
    global _S4_OK
    if _S4_OK is None:
        try:
            x = jnp.zeros((8,), dtype=jnp.int4)
            jax.jit(lambda a: a.astype(jnp.int8).sum())(x).block_until_ready()
            _S4_OK = True
        except RecursionError:
            _S4_OK = False
    if not _S4_OK:
        raise RuntimeError(
            "quantize: int4n requires native s4 jit-argument support, "
            "which this jax backend lacks (RecursionError at the jit "
            "boundary). Use quantize: int8 (quality-qualified) or int4 "
            "(packed, works everywhere).")


def quant_fn(mode: str):
    """The per-matrix quantize fn for ``mode`` (s4 support asserted for
    int4n) — for callers composing their own quantize programs (the
    per-matrix fused init in ``JanusModel.init``)."""
    if mode == "int4n":
        _assert_s4_supported()
    return _QUANT_FNS[mode]


def quantize_llama_params(params: Dict[str, Any],
                          mode: str = "int8") -> Dict[str, Any]:
    """Quantize the stacked layer projections (embed/norms/lm_head stay
    bf16 — the embedding is a lookup, not a matmul read)."""
    if mode == "int4n":
        _assert_s4_supported()
    qfn = _QUANT_FNS[mode]
    layers = dict(params["layers"])
    for name in QUANTIZABLE:
        layers[name] = qfn(layers[name])
    out = dict(params)
    out["layers"] = layers
    return out


def quantize_llama_params_incremental(params: Dict[str, Any],
                                      mode: str = "int8") -> Dict[str, Any]:
    """Like :func:`quantize_llama_params`, but quantizes one stacked
    matrix at a time in its own donated jit and drops the bf16 original
    before the next — peak HBM = base model + ONE stacked matrix (~1.8 GB
    at 7B) instead of base + a full second copy.

    Needed for quantize-after-build paths (model factory: random-init or
    checkpoint load, then ``quantize: int8``): a whole-tree quantize jit
    double-resides bf16+int8 (~23 GB at 7B) because buffer donation is
    not honoured on every backend (observed on the tunneled v5e — every
    later allocation then fails with RESOURCE_EXHAUSTED).  Fused
    init-time quantization (``JanusModel.init(quantize=True)``) remains
    the better path when the weights don't pre-exist on device."""
    if mode == "int4n":
        _assert_s4_supported()
    quantize_one = jax.jit(_QUANT_FNS[mode], donate_argnums=0)
    layers = dict(params["layers"])
    for name in QUANTIZABLE:
        w = layers[name]
        layers[name] = jax.block_until_ready(quantize_one(w))
        # drop the bf16 stacked matrix before quantizing the next one —
        # without the explicit delete (and even with donation) the old
        # leaf can stay alive until python GC runs
        w.delete()
    out = dict(params)
    out["layers"] = layers
    return out


def quantize_janus_params(params: Dict[str, Any],
                          quantize_gen_head: bool = True) -> Dict[str, Any]:
    out = dict(params)
    out["language_model"] = quantize_llama_params(params["language_model"])
    if quantize_gen_head:
        gh = {k: dict(v) for k, v in params["gen_head"].items()}
        for blk in ("proj", "head"):
            gh[blk]["w"] = quantize_matrix(gh[blk]["w"])
        out["gen_head"] = gh
    return out


def hbm_bytes(tree) -> int:
    """Device-footprint bytes, int4-aware: ml_dtypes reports itemsize 1
    for jnp.int4 but the HBM representation packs two nibbles per byte
    (quantize_matrix_int4_native's whole point)."""
    total = 0
    for x in jax.tree.leaves(tree):
        if str(x.dtype) in ("int4", "uint4"):
            total += (x.size + 1) // 2
        else:
            total += x.size * x.dtype.itemsize
    return total
