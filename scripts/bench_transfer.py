"""Host→device transfer micro-benchmark: uint8 vs float32 image batches.

Quantifies the mechanism behind the uint8 pixel-transfer layout
(``ops/pixels.py``): the reference host-normalizes images to float32
before shipping them to the device (``VLMImageProcessor``,
``janus/models/image_processing_vlm.py:92-196``); the rebuild ships
uint8 (resize-only) and normalizes inside the jitted program, quartering
the bytes every scoring chunk / train batch moves across the host↔device
link.  On a tunneled TPU the link is a network hop, so the win is wall
time, not just PCIe pressure.

Run directly on the serving chip (takes ~30 s):
    python scripts/bench_transfer.py [rows]
"""

import sys
import time

import numpy as np


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import jax

    side = 384  # SigLIP-L/16-384 input (scoring-chunk shape, rows=16)
    rng = np.random.default_rng(0)
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    results = {}
    for dtype in (np.float32, np.uint8):
        name = np.dtype(dtype).name
        # fresh data every rep — the tunnel memoizes identical payloads
        batches = [
            (rng.random((rows, side, side, 3)) * 255).astype(dtype)
            for _ in range(6)
        ]
        jax.block_until_ready(jax.device_put(batches[0]))  # warm path
        times = []
        for b in batches[1:]:
            t0 = time.time()
            jax.block_until_ready(jax.device_put(b))
            times.append(time.time() - t0)
        mb = batches[0].nbytes / 1e6
        best = min(times)
        results[name] = best
        print(f"# {name}: {mb:.1f} MB/batch, best {best*1e3:.1f} ms, "
              f"median {sorted(times)[len(times)//2]*1e3:.1f} ms "
              f"({mb/best:.0f} MB/s)", file=sys.stderr)
    import json

    print(json.dumps({
        "metric": "u8_transfer_speedup",
        "rows": rows,
        "float32_ms": round(results["float32"] * 1e3, 1),
        "uint8_ms": round(results["uint8"] * 1e3, 1),
        "value": round(results["float32"] / results["uint8"], 2),
        "unit": "x",
    }))


if __name__ == "__main__":
    main()
