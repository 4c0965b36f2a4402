"""Why does int4g OOM the B=32 decode program that int4 fits?

AOT-lowers the image engine's CFG decode program at one (batch, prompt)
signature for two weight representations and prints the compiler's
memory analysis side by side (no execution — runs through the remote
compile helper only, chip HBM untouched).  The first campaign measured
int4 B=32 at 1062.4 tok/s while int4g B=32 failed AOT at 18.59 G; the
suspect is the group-batched einsum in ``quantized_matmul_int4_group``
(g as a dot BATCH dim can force operand relayout copies).

Usage: python scripts/int4g_memdiff.py [batch_pairs] [mode1,mode2,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ospo_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ospo_tpu.engine.image_engine import ImageGenEngine  # noqa: E402
from ospo_tpu.image_processing import ImageProcessor  # noqa: E402
from ospo_tpu.models import janus as janus_lib  # noqa: E402
from ospo_tpu.processing import Processor  # noqa: E402
from ospo_tpu.tokenizer import ByteTokenizer  # noqa: E402


def analyze(mode: str, batch_pairs: int, preset: str = "7b"):
    cfg = (janus_lib.JANUS_PRO_7B if preset == "7b"
           else janus_lib.tiny_janus_config())
    model = janus_lib.JanusModel.init(cfg, seed=0, quantize=mode)
    tok = ByteTokenizer(vocab_size=min(512, cfg.language.vocab_size))
    proc = Processor(tok, ImageProcessor(image_size=cfg.vision.image_size),
                     num_image_tokens=cfg.num_image_tokens)
    eng = ImageGenEngine(model, proc, kv_quant="int8", kv_layout="shbd",
                         decode_segments=8,
                         image_token_num=cfg.num_gen_tokens,
                         img_size=cfg.gen_image_size,
                         patch_size=cfg.vq.downsample_factor)
    t = 64
    toks = jnp.zeros((2 * batch_pairs, t), jnp.int32)
    mask = jnp.ones((2 * batch_pairs, t), jnp.int32)
    rng = jax.random.PRNGKey(0)
    lowered = type(eng)._generate_tokens.lower(
        eng, model.params, toks, mask, rng,
        jnp.float32(5.0), jnp.float32(1.0))
    try:
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        print(f"[{mode} B={batch_pairs}] "
              f"args={ma.argument_size_in_bytes/2**30:.2f}G "
              f"out={ma.output_size_in_bytes/2**30:.2f}G "
              f"temp={ma.temp_size_in_bytes/2**30:.2f}G "
              f"alias={getattr(ma, 'alias_size_in_bytes', 0)/2**30:.2f}G "
              f"peak~{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes)/2**30:.2f}G",
              flush=True)
    except Exception as e:
        msg = str(e)
        print(f"[{mode} B={batch_pairs}] COMPILE FAILED: "
              f"{msg.splitlines()[0][:200]}", flush=True)
        for line in msg.splitlines():
            if "Exceeded hbm" in line or "Used " in line:
                print("   ", line.strip()[:200], flush=True)
    # free everything before the next mode
    for leaf in jax.tree.leaves(model.params):
        leaf.delete()


def main():
    batch_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    modes = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["int4", "int4g"])
    preset = os.environ.get("OSPO_MEMDIFF_PRESET", "7b")
    for mode in modes:
        analyze(mode, batch_pairs, preset)


if __name__ == "__main__":
    main()
