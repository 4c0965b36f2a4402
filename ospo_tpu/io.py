"""JSON I/O, result merging across hosts, and seeding.

The reference merges per-rank result lists with
``dist.all_gather_object`` + rank-0 dedup-by-item_id
(``ospo/utils/common.py:36-58``).  On TPU the equivalent is a host-level
gather: single-process runs write directly; multi-host runs gather via
``jax.experimental.multihost_utils`` when a distributed runtime is live.
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, List, Optional

import numpy as np


def load_images(conversations: List[dict]) -> list:
    """Collect every image referenced by a conversation's messages as RGB
    PIL images.  Each entry in a message's ``images`` list is either a file
    path or a ``data:image/...;base64,`` URI (janus/utils/io.py:44-83)."""
    import base64
    import io as _io

    from PIL import Image

    out = []
    for message in conversations:
        for image_data in message.get("images", []):
            if image_data.startswith("data:image"):
                _, payload = image_data.split(",", 1)
                img = Image.open(_io.BytesIO(base64.b64decode(payload)))
            else:
                img = Image.open(image_data)
            out.append(img.convert("RGB"))
    return out


def read_json(path: str) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def save_json(save_root: str, save_name: str, payload: Any) -> str:
    os.makedirs(save_root, exist_ok=True)
    path = os.path.join(save_root, f"{save_name}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=4)
    return path


def dedup_by_item_id(records: List[dict]) -> List[dict]:
    """Drop duplicate ``item_id`` records and sort numerically by id —
    identical semantics to the rank-0 merge in the reference."""
    seen = set()
    out = []
    for sample in records:
        item_id = sample["item_id"]
        if item_id in seen:
            continue
        seen.add(item_id)
        out.append(sample)
    return sorted(out, key=lambda x: int(x["item_id"]))


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def gather_objects(local: Any) -> List[Any]:
    """All-gather an arbitrary picklable object across hosts.

    Single-process: returns ``[local]``.  Multi-host: serialises to bytes and
    gathers via a global array exchange (multihost_utils), the TPU-native
    replacement for ``torch.distributed.all_gather_object``.
    """
    import jax

    if jax.process_count() == 1:
        return [local]

    import pickle

    from jax.experimental import multihost_utils

    payload = pickle.dumps(local)
    # Exchange sizes first, then pad to max and gather raw bytes.
    n = jax.process_count()
    sizes = multihost_utils.process_allgather(np.array([len(payload)]))
    max_size = int(np.max(sizes))
    buf = np.zeros((max_size,), dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for i in range(n):
        size = int(np.asarray(sizes).reshape(n, -1)[i, 0])
        out.append(pickle.loads(gathered[i, :size].tobytes()))
    return out


def save_json_sharded(
    save_root: str,
    save_name: str,
    save_file: List[dict],
    dedup: bool = True,
) -> Optional[str]:
    """Merge per-host result shards and write one JSON from host 0.

    Mirrors ``save_json_ddp`` (``ospo/utils/common.py:36-58``): gather all
    shards, host 0 dedups by ``item_id``, sorts, and writes.
    """
    if process_count() == 1:
        return save_json(save_root, save_name, save_file)

    gathered = gather_objects(save_file)
    if process_index() != 0:
        return None
    merged: List[dict] = []
    for shard in gathered:
        merged.extend(shard)
    if dedup:
        merged = dedup_by_item_id(merged)
    return save_json(save_root, save_name, merged)


def merge_element_sets(local_elements) -> list:
    """Union-merge element sets across hosts (step-1 epoch end)."""
    gathered = gather_objects(sorted(local_elements))
    merged = set()
    for shard in gathered:
        merged.update(shard)
    return sorted(merged)


def set_seed(seed: int) -> None:
    """Seed host-side RNGs.  Device-side randomness uses explicit
    ``jax.random`` keys derived from the same seed (see engines)."""
    random.seed(seed)
    np.random.seed(seed)


def shard_for_process(items: list, index: Optional[int] = None,
                      count: Optional[int] = None) -> list:
    """Strided shard of a work list for this host — the stand-in for
    Lightning's DistributedSampler over pipeline items."""
    if index is None:
        index = process_index()
    if count is None:
        count = process_count()
    return items[index::count]
