"""Weight-only int8: quantization error bounds and forward equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ospo_tpu.models import janus, llama
from ospo_tpu.ops import quant


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 32)) * 0.1
    qw = quant.quantize_matrix(w)
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (4, 64)
    back = quant.dequantize_matrix(qw, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # per-row max error ≤ scale/2 (+eps)
    assert (err <= np.asarray(qw["s"])[..., None] * 0.51).all()


def test_quantized_llama_forward_close():
    cfg = llama.tiny_config(hidden_size=128, intermediate_size=256, num_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quant.quantize_llama_params(params)

    ids = jnp.arange(24).reshape(2, 12) % cfg.vocab_size
    mask = jnp.ones((2, 12), jnp.int32)
    pos = llama.positions_from_mask(mask)
    x = llama.embed_tokens(params, ids)

    ref, _ = llama.forward(params, cfg, x, mask, pos)
    out, _ = llama.forward(qparams, cfg, x, mask, pos)
    ref, out = np.asarray(ref), np.asarray(out)
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.05  # W8 relative error budget


def test_quantized_janus_gen_path():
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    qparams = quant.quantize_janus_params(model.params)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cfg.n_embed)) * 0.3
    ref = np.asarray(janus.gen_logits(model.params, hidden))
    out = np.asarray(janus.gen_logits(qparams, hidden))
    # logit ordering preserved in the bulk (sampling-tolerance criterion)
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree > 0.9
    assert quant.hbm_bytes(qparams["language_model"]["layers"]) < quant.hbm_bytes(
        model.params["language_model"]["layers"]
    )


def test_incremental_quantize_matches_whole_tree():
    """quantize_llama_params_incremental (per-leaf donated jits, used by
    the model factory to avoid bf16+int8 double-residency at 7B) must be
    numerically identical to the whole-tree quantize."""
    import numpy as np

    from ospo_tpu.models import llama
    from ospo_tpu.ops import quant

    cfg = llama.tiny_config()
    ref_params = llama.init_params(cfg, jax.random.PRNGKey(3))
    inc_params = llama.init_params(cfg, jax.random.PRNGKey(3))
    ref = quant.quantize_llama_params(ref_params)
    inc = quant.quantize_llama_params_incremental(inc_params)
    for name in quant.QUANTIZABLE:
        np.testing.assert_array_equal(
            np.asarray(ref["layers"][name]["q"]),
            np.asarray(inc["layers"][name]["q"]), err_msg=name)
        np.testing.assert_allclose(
            np.asarray(ref["layers"][name]["s"]),
            np.asarray(inc["layers"][name]["s"]), rtol=1e-6, err_msg=name)


def test_int4_weight_pack_roundtrip():
    """Packed int4 → unpack must recover the exact 15-level code, and the
    dequantized matrix must be the per-row-scaled code."""
    from ospo_tpu.ops import quant

    w = jax.random.normal(jax.random.PRNGKey(0), (6, 8, 16), jnp.float32)
    qw = quant.quantize_matrix_int4(w)
    assert qw["q4"].shape == (6, 4, 16) and qw["q4"].dtype == jnp.int8
    low, high = quant.unpack_int4_halves(qw["q4"])
    assert int(jnp.max(low)) <= 7 and int(jnp.min(low)) >= -7
    assert int(jnp.max(high)) <= 7 and int(jnp.min(high)) >= -7
    deq = quant.dequantize_matrix_int4(qw, dtype=jnp.float32)
    # error bounded by half a quantization step per element
    step = qw["s"][..., None]
    assert float(jnp.max(jnp.abs(deq - w) / step)) <= 0.5 + 1e-3


def test_int4_weight_matmul_matches_dequantized():
    from ospo_tpu.ops import quant

    w = jax.random.normal(jax.random.PRNGKey(1), (12, 16), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16), jnp.float32)
    qw = quant.quantize_matrix_int4(w)
    ref = jnp.einsum("btd,fd->btf", x,
                     quant.dequantize_matrix_int4(qw, jnp.float32))
    out = quant.quantized_matmul_int4(x, qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_int4_weight_forward_close_to_bf16():
    """A tiny Llama forward with int4 weights must stay close to the
    bf16 forward (W4A16 is a serving trade, not a different model)."""
    from ospo_tpu.models import llama
    from ospo_tpu.ops import quant

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.arange(24).reshape(2, 12) % cfg.vocab_size
    mask = jnp.ones((2, 12), jnp.int32)
    pos = llama.positions_from_mask(mask)

    x = llama.embed_tokens(params, ids)
    ref, _ = llama.forward(params, cfg, x, mask, pos)

    q4 = quant.quantize_llama_params(params, mode="int4")
    out, _ = llama.forward(q4, cfg, x, mask, pos)
    # hidden-state correlation stays high; int4 noise is bounded
    a = np.asarray(ref, np.float32).ravel()
    b = np.asarray(out, np.float32).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr


def test_int4_native_matches_packed_quantization():
    """mode='int4n' (native s4 storage, single-dot path) must produce
    the same quantized VALUES as the packed two-plane representation —
    only the storage layout differs (the s4 dot halves the real HBM
    stream; the packed form's two einsums each re-read the array)."""
    from ospo_tpu.models import llama
    from ospo_tpu.ops import quant

    w = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 5, 16), jnp.bfloat16)
    packed = quant.quantize_matrix_int4(w[0])
    native = quant.quantize_matrix_int4_native(w[0])
    assert native["q"].dtype == jnp.int4
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize_matrix_int4(packed, jnp.float32)),
        np.asarray(native["q"], np.int8).astype(np.float32)
        * np.asarray(native["s"])[..., None])
    # the int8 dict matmul path consumes it verbatim
    out = quant.quantized_matmul(x, native)
    ref = quant.quantized_matmul_int4(x, packed)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-3, rtol=1e-3)

    # and the stacked-tree mode flows through the llama forward
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qn = quant.quantize_llama_params(params, mode="int4n")
    ids = jnp.arange(12).reshape(1, 12) % cfg.vocab_size
    mask = jnp.ones((1, 12), jnp.int32)
    xh = llama.embed_tokens(params, ids)
    q4 = quant.quantize_llama_params(params, mode="int4")
    ref_h, _ = llama.forward(q4, cfg, xh, mask,
                             llama.positions_from_mask(mask))
    out_h, _ = llama.forward(qn, cfg, xh, mask,
                             llama.positions_from_mask(mask))
    np.testing.assert_allclose(np.asarray(out_h, np.float32),
                               np.asarray(ref_h, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_parse_kv_quant_spellings():
    import pytest

    assert quant.parse_kv_quant(None) is False
    assert quant.parse_kv_quant(False) is False
    assert quant.parse_kv_quant("") is False
    assert quant.parse_kv_quant("false") is False
    assert quant.parse_kv_quant("off") is False
    assert quant.parse_kv_quant(True) == "int8"
    assert quant.parse_kv_quant("true") == "int8"
    assert quant.parse_kv_quant("int8") == "int8"
    assert quant.parse_kv_quant("INT4") == "int4"
    # a typo must raise, not silently allocate a bf16 cache at batch
    # sizes tuned for a quantized one
    with pytest.raises(ValueError):
        quant.parse_kv_quant("int16")
    with pytest.raises(ValueError):
        quant.parse_kv_quant("on_please")


def test_int4_group_pack_roundtrip_and_bound():
    """Group-wise int4 ({"q4","gs"}): exact code recovery through the
    packing, and per-element error bounded by half the GROUP's step —
    strictly tighter than the per-row bound whenever a row's range
    varies across groups (the failure mode behind per-row int4's 16.5
    mean KL on the 7B gate)."""
    from ospo_tpu.ops import quant

    w = jax.random.normal(jax.random.PRNGKey(0), (6, 8, 32), jnp.float32)
    qw = quant.quantize_matrix_int4_group(w, group=16)
    assert qw["q4"].shape == (6, 4, 32) and qw["q4"].dtype == jnp.int8
    assert qw["gs"].shape == (6, 8, 2)
    deq = quant.dequantize_matrix_int4_group(qw, jnp.float32)
    step = np.asarray(qw["gs"]).repeat(16, axis=-1)[..., None, :].reshape(6, 8, 32)
    assert (np.abs(np.asarray(deq) - np.asarray(w)) <= step * 0.51).all()


def test_int4_group_tighter_than_per_row_on_outlier_rows():
    """A single outlier column must not blow up the whole row's step:
    grouped scales keep the non-outlier groups fine-grained."""
    from ospo_tpu.ops import quant

    w = np.random.RandomState(0).randn(4, 64).astype(np.float32) * 0.02
    w[:, 0] = 8.0  # one outlier column per row
    qg = quant.quantize_matrix_int4_group(jnp.asarray(w), group=16)
    qr = quant.quantize_matrix_int4(jnp.asarray(w))
    err_g = np.abs(np.asarray(quant.dequantize_matrix_int4_group(qg, jnp.float32)) - w)[:, 16:]
    err_r = np.abs(np.asarray(quant.dequantize_matrix_int4(qr, jnp.float32)) - w)[:, 16:]
    assert err_g.mean() < err_r.mean() / 4, (err_g.mean(), err_r.mean())


def test_int4_group_matmul_matches_dequantized():
    from ospo_tpu.ops import quant

    w = jax.random.normal(jax.random.PRNGKey(1), (12, 32), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32), jnp.float32)
    qw = quant.quantize_matrix_int4_group(w, group=8)
    ref = jnp.einsum("btd,fd->btf", x,
                     quant.dequantize_matrix_int4_group(qw, jnp.float32))
    out = quant.quantized_matmul_int4_group(x, qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_int4_group_llama_forward_closer_than_per_row():
    """mode='int4g' flows through the stacked-layer forward (dispatch on
    the 'gs' key) and tracks the bf16 hidden states at least as closely
    as per-row int4."""
    from ospo_tpu.models import llama
    from ospo_tpu.ops import quant

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.arange(24).reshape(2, 12) % cfg.vocab_size
    mask = jnp.ones((2, 12), jnp.int32)
    pos = llama.positions_from_mask(mask)
    x = llama.embed_tokens(params, ids)
    ref, _ = llama.forward(params, cfg, x, mask, pos)

    out_g, _ = llama.forward(
        quant.quantize_llama_params(params, mode="int4g"), cfg, x, mask, pos)
    out_r, _ = llama.forward(
        quant.quantize_llama_params(params, mode="int4"), cfg, x, mask, pos)
    a = np.asarray(ref, np.float32).ravel()
    eg = np.abs(np.asarray(out_g, np.float32).ravel() - a).mean()
    er = np.abs(np.asarray(out_r, np.float32).ravel() - a).mean()
    assert eg <= er * 1.05, (eg, er)
    corr = np.corrcoef(a, np.asarray(out_g, np.float32).ravel())[0, 1]
    assert corr > 0.99, corr


def test_int4_group_wins_on_outlier_weights_full_forward():
    """On weights WITH outlier columns (the structure real LLM
    checkpoints have — and random init lacks, see BENCH_NOTES 'int4g
    random-weight caveat'), int4g must track the bf16 forward MUCH more
    closely than per-row int4 through the full stacked-layer model, not
    just per-matrix."""
    from ospo_tpu.models import llama
    from ospo_tpu.ops import quant

    # grouping's win scales with D/group (damage confined to the outlier
    # group: err ratio ≈ D·inflate² / (group·inflate² + D−group)) — at
    # the default tiny h=64 every matrix is ONE group and int4g
    # degenerates to per-row, so use h=1024 → 8 groups of 128
    cfg = llama.tiny_config(hidden_size=1024, intermediate_size=2048,
                            num_layers=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))

    def inject(w):
        # two large outlier input columns, CONCENTRATED in one group
        # (real outlier channels live at specific indices); matrices
        # only (norms/embeds untouched)
        if w.ndim < 2 or w.shape[-1] < 256:
            return w
        return w.at[..., :2].add(jnp.asarray(8.0, w.dtype))

    params = jax.tree.map(inject, params)
    ids = jnp.arange(24).reshape(2, 12) % cfg.vocab_size
    mask = jnp.ones((2, 12), jnp.int32)
    pos = llama.positions_from_mask(mask)
    x = llama.embed_tokens(params, ids)
    ref, _ = llama.forward(params, cfg, x, mask, pos)
    out_g, _ = llama.forward(
        quant.quantize_llama_params(params, mode="int4g"), cfg, x, mask, pos)
    out_r, _ = llama.forward(
        quant.quantize_llama_params(params, mode="int4"), cfg, x, mask, pos)
    a = np.asarray(ref, np.float32).ravel()
    eg = np.abs(np.asarray(out_g, np.float32).ravel() - a).mean()
    er = np.abs(np.asarray(out_r, np.float32).ravel() - a).mean()
    assert eg < er / 3, (eg, er)


def test_int4_group_tp_sharding_matches_single_device():
    """int4g params shard onto a model-parallel mesh ({"q4","gs"} spec
    alignment) and the sharded cached decode forward matches."""
    import jax
    from ospo_tpu.models import llama
    from ospo_tpu.ops import quant
    from ospo_tpu.parallel import mesh as mesh_lib

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quant.quantize_llama_params(params, mode="int4g")
    ids = jnp.arange(16).reshape(2, 8) % cfg.vocab_size
    mask = jnp.ones((2, 8), jnp.int32)
    pos = llama.positions_from_mask(mask)
    x = llama.embed_tokens(params, ids)
    ref, _ = llama.forward(qparams, cfg, x, mask, pos)

    mesh = mesh_lib.create_mesh(model_parallel=2)
    specs = mesh_lib._align_quant_specs(qparams, mesh_lib.llama_param_specs())
    sharded = jax.tree.map(
        lambda p, s: jax.device_put(
            p, jax.sharding.NamedSharding(mesh, s)),
        qparams, specs)
    out, _ = llama.forward(sharded, cfg, x, mask, pos)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-5, rtol=2e-5)


def test_w8a8_matmul_exact_vs_emulated():
    """int8×int8 accumulation in int32 is EXACT, so the w8a8 matmul must
    equal the f32 emulation (dequantized int8 activations × dequantized
    int8 weights) to float rounding."""
    w = jax.random.normal(jax.random.PRNGKey(1), (12, 32), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32), jnp.float32)
    qw = quant.quantize_matrix_w8a8(w)
    assert set(qw) == {"q", "sa"} and qw["q"].dtype == jnp.int8

    xq, sx = quant.quantize_activations_int8(x)
    ref = jnp.einsum(
        "btd,fd->btf",
        xq.astype(jnp.float32) * sx,
        qw["q"].astype(jnp.float32) * qw["sa"][..., None])
    out = quant.quantized_matmul_w8a8(x, qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_w8a8_llama_forward_close():
    """mode='w8a8' flows through the stacked-layer forward (dispatch on
    the 'sa' key) and stays close to bf16 — the activation quantization
    adds error on top of W8A16, but both are serving trades."""
    cfg = llama.tiny_config(hidden_size=128, intermediate_size=256,
                            num_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.arange(24).reshape(2, 12) % cfg.vocab_size
    mask = jnp.ones((2, 12), jnp.int32)
    pos = llama.positions_from_mask(mask)
    x = llama.embed_tokens(params, ids)

    ref, _ = llama.forward(params, cfg, x, mask, pos)
    out, _ = llama.forward(
        quant.quantize_llama_params(params, mode="w8a8"), cfg, x, mask, pos)
    a = np.asarray(ref, np.float32)
    b = np.asarray(out, np.float32)
    assert np.abs(b - a).mean() / np.abs(a).mean() < 0.08
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.99, corr


def test_w8a8_cached_prefill_matches_uncached():
    """w8a8 params through the KV-cached prefill path (the scoring
    engine's program shape) must match the cache-free forward — the
    activation-quantized projections are upstream of the cache writes."""
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quant.quantize_llama_params(params, mode="w8a8")
    ids = jnp.arange(16).reshape(2, 8) % cfg.vocab_size
    mask = jnp.ones((2, 8), jnp.int32)
    pos = llama.positions_from_mask(mask)
    x = llama.embed_tokens(params, ids)
    ref, _ = llama.forward(qparams, cfg, x, mask, pos)

    kv = llama.init_kv_cache(cfg, 2, 8, layout="shbd")
    out, _ = llama.forward(qparams, cfg, x, mask, pos,
                           kv_cache=kv, self_attn=True, cache_layout="shbd")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_w8a8_tp_sharding_matches_single_device():
    """w8a8 params shard onto a model-parallel mesh ({"q","sa"} spec
    alignment) and the sharded forward matches single-device."""
    from ospo_tpu.parallel import mesh as mesh_lib

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quant.quantize_llama_params(params, mode="w8a8")
    ids = jnp.arange(16).reshape(2, 8) % cfg.vocab_size
    mask = jnp.ones((2, 8), jnp.int32)
    pos = llama.positions_from_mask(mask)
    x = llama.embed_tokens(params, ids)
    ref, _ = llama.forward(qparams, cfg, x, mask, pos)

    mesh = mesh_lib.create_mesh(model_parallel=2)
    specs = mesh_lib._align_quant_specs(qparams, mesh_lib.llama_param_specs())
    sharded = jax.tree.map(
        lambda p, s: jax.device_put(
            p, jax.sharding.NamedSharding(mesh, s)),
        qparams, specs)
    out, _ = llama.forward(sharded, cfg, x, mask, pos)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-5, rtol=2e-5)


def test_w8a8_janus_init_and_scoring_engine():
    """JanusModel.init(quantize='w8a8') builds the marked trunk, and the
    scoring engine's shared-prefix program runs on it (the target stage
    for the 2× int8 MXU rate)."""
    from PIL import Image

    from ospo_tpu.engine.scoring import ScoringEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer

    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0, quantize="w8a8")
    assert "sa" in model.params["language_model"]["layers"]["wq"]

    tok = ByteTokenizer(vocab_size=min(512, cfg.language.vocab_size))
    proc = Processor(tok, ImageProcessor(image_size=cfg.vision.image_size),
                     num_image_tokens=cfg.num_image_tokens)
    engine = ScoringEngine(model, proc, kv_quant="int8")
    img = Image.new("RGB", (cfg.vision.image_size,) * 2, (90, 40, 20))
    res = engine.score_images([img], ["Is there a cube?", "Is it red?"])
    assert len(res) == 1
    assert np.isfinite(res[0]["local_score"])
    assert np.isfinite(res[0]["global_score"])


def test_w8a8_ste_gradient_matches_dequant_backward():
    """The w8a8 matmul's custom-vjp backward must be the straight-through
    (dequantized-weight) backward — and, critically, NONZERO: without the
    custom_vjp, jnp.round's zero gradient would silently kill every
    activation gradient through a w8a8 trunk (QLoRA layers below it would
    never learn)."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (24, 16), jnp.float32) * 0.5
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 16),
                          jnp.bfloat16)
    g = jax.random.normal(jax.random.fold_in(key, 2), (2, 5, 24),
                          jnp.bfloat16)
    qw = quant.quantize_matrix_w8a8(w)

    _, vjp = jax.vjp(lambda x_: quant.quantized_matmul_w8a8(x_, qw), x)
    (dx,) = vjp(g)
    assert float(jnp.abs(dx.astype(jnp.float32)).max()) > 0

    wdeq = quant.dequantize_matrix_w8a8(qw, jnp.bfloat16)
    dx_ref = jnp.einsum("btf,fd->btd", g, wdeq)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dx_ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_w8a8_ste_gradient_under_jit_scan():
    """The custom_vjp survives jit + lax.scan over stacked layers (the
    trainer's remat/scan forward): gradients w.r.t. a bf16 input through
    two scanned w8a8 matmuls stay finite and nonzero."""
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (2, 16, 16), jnp.float32) * 0.5
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 16),
                          jnp.bfloat16)
    qw = quant.quantize_matrix_w8a8(w)

    @jax.jit
    def loss(x_):
        def body(acc, wl):
            return quant.quantized_matmul_w8a8(acc, wl), None
        out, _ = jax.lax.scan(body, x_, qw)
        return (out.astype(jnp.float32) ** 2).sum()

    dx = jax.grad(loss)(x)
    a = np.asarray(dx, np.float32)
    assert np.isfinite(a).all() and np.abs(a).max() > 0


@pytest.mark.parametrize("mode", ["int8", "w8a8", "int4", "int4g"])
def test_fused_init_matches_quantize_after_init(mode):
    """The per-matrix fused init+quantize programs (bounded-peak path that
    replaced the single whole-trunk program after the int4g 7B OOM,
    round-4) must produce the same model as quantize-after-init: int
    payloads and bf16 leaves bitwise, f32 scales to 1 ulp of compiler
    fusion."""
    import jax.tree_util as jtu

    cfg = janus.tiny_janus_config()
    fused = janus.JanusModel.init(cfg, seed=3, quantize=mode).params
    plain = janus.JanusModel.init(cfg, seed=3).params
    ref = quant.quantize_llama_params(plain["language_model"], mode=mode)

    ra = {jtu.keystr(p): v for p, v in jtu.tree_flatten_with_path(ref)[0]}
    ga = {jtu.keystr(p): v
          for p, v in jtu.tree_flatten_with_path(
              fused["language_model"])[0]}
    assert set(ra) == set(ga)
    for k in ra:
        a, b = np.asarray(ra[k]), np.asarray(ga[k])
        assert a.dtype == b.dtype and a.shape == b.shape, k
        if a.dtype == np.float32:  # scale leaves ('s'/'sa'/group scales)
            np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)
    # non-LM modules come from a separate DCE'd program — still bitwise
    np.testing.assert_array_equal(np.asarray(fused["gen_embed"]),
                                  np.asarray(plain["gen_embed"]))
