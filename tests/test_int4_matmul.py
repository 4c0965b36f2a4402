"""Pallas single-stream int4 decode matmul ≡ the XLA two-plane paths.

The kernel (ops/int4_matmul.py) is the TPU serving path for T = 1
forwards on {"q4","s"}/{"q4","gs"} weights; these tests pin it (interpret
mode on CPU) against the XLA formulations it replaces and against the
exact dequantized matmul, at production-divisor shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ospo_tpu.ops import int4_matmul, quant


def _mk(key, m, f, d, dtype=jnp.bfloat16):
    kw, kx = jax.random.split(jax.random.PRNGKey(key))
    w = jax.random.normal(kw, (f, d), jnp.float32) * 0.05
    # plant outlier columns so per-row vs group scales actually differ
    w = w.at[:, :3].mul(8.0)
    x = (jax.random.normal(kx, (m, 1, d), jnp.float32) * 0.5).astype(dtype)
    return w.astype(dtype), x


@pytest.mark.parametrize("f,d", [(256, 256), (512, 384)])
def test_row_kernel_matches_xla(f, d):
    w, x = _mk(0, 8, f, d)
    qw = quant.quantize_matrix_int4(w)
    ref = quant.quantized_matmul_int4(x, qw)
    got = int4_matmul.int4_matmul_decode(x, qw, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=2e-2)


@pytest.mark.parametrize("f,d", [(256, 256), (512, 384)])
def test_group_kernel_matches_xla(f, d):
    w, x = _mk(1, 8, f, d)
    qw = quant.quantize_matrix_int4_group(w)
    ref = quant.quantized_matmul_int4_group(x, qw)
    got = int4_matmul.int4_matmul_decode(x, qw, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    # group scales ride the bf16 weight tile in-kernel (vs f32 partial
    # sums in XLA) and outputs are bf16: compare at bf16-output atol
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=3e-2)


def test_group_kernel_close_to_exact_dequant():
    """The kernel must be as faithful to the exact dequantized matmul as
    the XLA path is (the quality gate's property, not just formulation
    parity)."""
    w, x = _mk(2, 8, 256, 256)
    qw = quant.quantize_matrix_int4_group(w)
    wd = quant.dequantize_matrix_int4_group(qw)
    exact = jnp.einsum("btd,fd->btf", x, wd)
    got = int4_matmul.int4_matmul_decode(x, qw, interpret=True)
    err_kernel = float(jnp.abs(got - exact).max())
    ref = quant.quantized_matmul_int4_group(x, qw)
    err_xla = float(jnp.abs(ref - exact).max())
    assert err_kernel <= max(2 * err_xla, 1e-2), (err_kernel, err_xla)


def test_supported_predicate():
    w, x = _mk(3, 4, 256, 256)
    qw = quant.quantize_matrix_int4(w)
    assert int4_matmul.supported(x, qw)
    # prefill shape: T > 1
    xt = jnp.concatenate([x, x], axis=1)
    assert not int4_matmul.supported(xt, qw)
    # stacked (3-D) weights: per-layer slices only
    q3 = {"q4": qw["q4"][None], "s": qw["s"][None]}
    assert not int4_matmul.supported(x, q3)
    # non-128-divisible output halves
    w2, _ = _mk(4, 4, 120, 256)
    assert not int4_matmul.supported(x, quant.quantize_matrix_int4(w2))


def test_ragged_batch_rows():
    """M that is no multiple of the sublane tile (CFG rows like 40)."""
    w, x = _mk(5, 40, 256, 256)
    qw = quant.quantize_matrix_int4_group(w)
    ref = quant.quantized_matmul_int4_group(x, qw)
    got = int4_matmul.int4_matmul_decode(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=3e-2)
