"""Worker for test_multihost_merge: one of N jax.distributed CPU processes
running the sharded result-merge path (the stand-in for the reference's
DDP ranks + ``save_json_ddp``, ospo/utils/common.py:36-58).

Usage: python multihost_merge_worker.py <coordinator> <pid> <nprocs> <outdir>
"""

import os
import sys


def main() -> None:
    import jax

    # must run before any backend initializes (sitecustomize pre-imports jax)
    jax.config.update("jax_platforms", "cpu")
    coord, pid, n, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n, process_id=pid)
    assert jax.process_count() == n, jax.process_count()

    from ospo_tpu import io as io_lib

    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures", "examples")
    items = io_lib.read_json(
        os.path.join(fixtures, "step1", "base_prompt.json"))

    # Strided host shard (the DistributedSampler stand-in), then simulate a
    # step-2-style per-item result; BOTH hosts also emit item 0 so the merge
    # exercises the cross-host dedup-by-item_id path.
    local = io_lib.shard_for_process(items)
    recs = [{**rec, "negative_prompt": [f"neg-{rec['item_id']}"]}
            for rec in local]
    recs.append({**items[0], "negative_prompt": [f"neg-{items[0]['item_id']}"]})

    path = io_lib.save_json_sharded(outdir, "merged", recs)
    if io_lib.process_index() == 0:
        assert path is not None
    else:
        assert path is None, "only host 0 writes the merged JSON"

    # element-set union merge (step-1 epoch end)
    merged_elements = io_lib.merge_element_sets({f"w{pid}", "shared"})
    if io_lib.process_index() == 0:
        io_lib.save_json(outdir, "elements", merged_elements)
    print(f"# worker {pid}/{n} done", flush=True)


if __name__ == "__main__":
    main()
