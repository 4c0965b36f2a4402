"""Execute the REAL multi-host branch of the result-merge path: two
``jax.distributed`` CPU processes (Gloo collectives) run a sharded
pipeline-style walk over the vendored fixtures and merge through
``io.gather_objects`` / ``save_json_sharded``.  Asserts the merged output
is byte-identical to the single-process result (dedup/sort semantics of
``ospo/utils/common.py:44-56``)."""

import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_merge_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_merge_equals_single_process(tmp_path):
    n = 2
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (os.path.dirname(HERE) + os.pathsep
                         + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(i), str(n), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(n)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out.decode()

    merged = json.load(open(tmp_path / "merged.json"))

    # expected: the single-process result — every item once, sorted by id
    items = json.load(open(os.path.join(
        HERE, "fixtures", "examples", "step1", "base_prompt.json")))
    expected = sorted(
        ({**rec, "negative_prompt": [f"neg-{rec['item_id']}"]}
         for rec in items),
        key=lambda r: int(r["item_id"]),
    )
    assert merged == expected

    elements = json.load(open(tmp_path / "elements.json"))
    assert elements == ["shared", "w0", "w1"]
